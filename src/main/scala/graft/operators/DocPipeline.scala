package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline over the `documents` table —
  * the flagship composition of the LLM-pipeline suite: every stage is one of
  * this library's operators, chained into a single declarative plan.
  *
  *   1. feature map: token count + quality score (codegen map stage)
  *   2. gate: quality ≥ 0.7, language whitelist (filter, fully pushed)
  *   3. exact dedup: md5 fingerprint, keep the smallest doc_id (one shuffle
  *      on the fingerprint)
  *   4. near-dup removal: candidate pairs → connected-component clusters →
  *      keep each cluster's representative (smallest doc_id = its label)
  *   5. corpus summary per source
  *
  * The reference has no such pipeline surface (its test corpus stops at SQL
  * queries); this is the "what a 100 TB curation pass actually runs" shape:
  * stages 1–2 are embarrassingly parallel, stage 3 shuffles once on a
  * uniform hash, stage 4 shuffles the (tiny) near-dup subgraph only, and
  * the summary aggregate is bounded by source cardinality.
  *
  * Two near-dup strategies (stage 4):
  *  - "ngram" (default): exact blocked n-gram Jaccard
  *    ([[Dedup.ngramJaccardPairs]]) — fully deterministic integer-ratio
  *    arithmetic, so the WHOLE pipeline is DuckDB-oracle-checkable
  *    (the oracle reproduces the cluster step with a recursive CTE).
  *  - "minhash": MinHash+LSH ([[Dedup.minHashNearDup]]) — the
  *    probabilistic-signature variant (xxhash64, Spark-specific);
  *    output invariants pinned in DocPipelineSpec instead of an oracle.
  */
object DocPipeline {

  private val stopCsv = "the,a,of,and,to,in,is"

  /** Stages 1–4 as a reusable frame: the curated (kept) documents with
    * their token counts and quality scores. */
  def curatedDocs(docs: DataFrame,
      minQuality: Double = 0.7,
      langs: Seq[String] = Seq("en", "fr", "es", "de"),
      jaccard: Double = 0.5,
      nearDup: String = "ngram"): DataFrame = {
    val toksC = split(col("text"), " ")
    val scored = docs.select(
      col("doc_id"), col("text"), col("lang"), col("source"),
      size(toksC).cast("double").as("n_tok"),
      // codegen'd set-probe kernel (count_in_set) — a filter() HOF here
      // evaluates interpreted and breaks the WholeStageCodegen span
      expr(s"count_in_set(split(text, ' '), '$stopCsv')")
        .cast("double").as("n_stop"),
      size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
        .cast("double").as("n_digit"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_tok").cast("long").as("n_tok"),
        (col("n_tok") / (col("n_tok") + lit(50.0)) +
          col("n_stop") / col("n_tok") -
          col("n_digit") / col("n_tok")).as("quality"))
    val gated = scored
      .filter(col("quality") >= minQuality &&
        col("lang").isin(langs.map(x => x: Any): _*))
    // exact dedup: smallest doc_id per fingerprint survives. min_by over
    // the fingerprint groupBy (partial-aggregable, narrow) rather than a
    // row_number window (which would shuffle and sort full rows); persisted
    // because BOTH the near-dup pair generation and the final anti-join
    // consume it (without this the scoring+gate+dedup chain runs twice).
    val exactKept = gated
      .groupBy(md5(col("text")).as("fp"))
      .agg(min_by(
        struct(gated.columns.map(col): _*), col("doc_id")).as("r"))
      .select(col("r.*"))
      .persist()
    // near-dup: candidate pairs → clusters → drop non-representatives.
    // componentLabels materializes eagerly (localCheckpoint rounds), so the
    // pair subgraph resolves here; only the tiny drop-list joins back.
    val keyed = exactKept.select(col("doc_id"), col("text"))
    val pairs = nearDup match {
      case "ngram" =>
        Dedup.ngramJaccardPairs(keyed, "doc_id", "text")
          .filter(col("jaccard") >= jaccard)
          .select(col("doc_a"), col("doc_b"))
      case "minhash" =>
        Dedup.minHashNearDup(keyed, "doc_id", "text", threshold = jaccard)
          .select(col("doc_a"), col("doc_b"))
      case other => throw new IllegalArgumentException(
        s"nearDup must be 'ngram' or 'minhash', got '$other'")
    }
    val dropList = Dedup.componentLabels(pairs)
      .filter(col("doc") =!= col("label"))
      .select(col("doc").as("doc_id"))
    exactKept.join(dropList, Seq("doc_id"), "left_anti")
  }

  /** Registry entry: per-source corpus summary of the curated set, with the
    * deterministic n-gram near-dup stage — the full five-stage pipeline is
    * reproduced by the DuckDB oracle, connected components included
    * (transitive min-label via WITH RECURSIVE over the pair edges). */
  val pipeline = QueryDef(
    "q_docs_pipeline",
    (spark, dir) => {
      curatedDocs(Tables(spark, dir, "documents"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_toks"),
          min(col("quality")).as("min_quality"))
    },
    Some(s"""
      WITH RECURSIVE
      scored AS (
        SELECT doc_id, text, lang, source,
               CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(str_split(text, ' '),
                 t -> t IN ('the','a','of','and','to','in','is')))
                 AS DOUBLE) AS n_stop,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 AS n_digit
        FROM documents),
      gated AS (
        SELECT doc_id, text, lang, source,
               CAST(n_tok AS BIGINT) AS n_tok,
               n_tok / (n_tok + 50.0) + n_stop / n_tok - n_digit / n_tok
                 AS quality
        FROM scored
        WHERE n_tok / (n_tok + 50.0) + n_stop / n_tok - n_digit / n_tok
                >= 0.7
          AND lang IN ('en','fr','es','de')),
      exact AS (
        SELECT doc_id, text, lang, source, n_tok, quality FROM (
          SELECT g.*, row_number() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
          FROM gated g) WHERE rn = 1),
      grams AS (
        SELECT doc_id, substring(text, 1, 40) AS blk,
               ${Dedup.duckShingles} AS grams
        FROM exact),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM grams a JOIN grams b
          ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              >= 0.5),
      edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b AS s, doc_a AS d FROM pairs),
      reach AS (
        SELECT doc_id AS doc, doc_id AS lbl FROM exact
        UNION
        SELECT e.d AS doc, reach.lbl FROM reach JOIN edges e
          ON reach.doc = e.s),
      labels AS (SELECT doc, min(lbl) AS label FROM reach GROUP BY doc),
      kept AS (
        SELECT x.* FROM exact x JOIN labels l ON x.doc_id = l.doc
        WHERE l.label = x.doc_id)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_toks,
             min(quality) AS min_quality
      FROM kept GROUP BY source"""))

  val all: Seq[QueryDef] = Seq(pipeline)
}
