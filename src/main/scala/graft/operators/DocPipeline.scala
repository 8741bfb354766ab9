package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline over the `documents` table —
  * the flagship composition of the LLM-pipeline suite: every stage is one of
  * this library's operators, chained into a single declarative plan.
  *
  *   1. feature map: token count + quality score (codegen map stage)
  *   2. gate: quality ≥ 0.7, language whitelist (filter, fully pushed)
  *   3. exact dedup: md5 fingerprint, keep the smallest doc_id (one shuffle
  *      on the fingerprint)
  *   4. near-dup removal: MinHash+LSH candidate pairs →
  *      connected-component clusters → keep each cluster's representative
  *      (smallest doc_id = its component label)
  *   5. corpus summary per source
  *
  * The reference has no such pipeline surface (its test corpus stops at SQL
  * queries); this is the "what a 100 TB curation pass actually runs" shape:
  * stages 1–2 are embarrassingly parallel, stage 3 shuffles once on a
  * uniform hash, stage 4 shuffles the (tiny) near-dup subgraph only, and
  * the summary aggregate is bounded by source cardinality. Approximate
  * stages (xxhash minhash) make it rows-only for the driver; the invariants
  * — no exact dup survives, no near-dup PAIR survives, every survivor
  * passed the gate — are asserted in DocPipelineSpec.
  */
object DocPipeline {

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stages 1–4 as a reusable frame: the curated (kept) documents with
    * their token counts and quality scores. */
  def curatedDocs(docs: DataFrame,
      minQuality: Double = 0.7,
      langs: Seq[String] = Seq("en", "fr", "es", "de"),
      jaccard: Double = 0.5): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = docs.select(
      col("doc_id"), col("text"), col("lang"), col("source"),
      size(toks).cast("double").as("n_tok"),
      size(filter(toks, t => t.isin(stop.map(x => x: Any): _*)))
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
    // exact dedup: smallest doc_id per fingerprint survives
    val exactKept = gated
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
    // near-dup: candidate pairs → clusters → drop non-representatives.
    // componentLabels materializes eagerly (localCheckpoint rounds), so the
    // pair subgraph resolves here; only the tiny drop-list joins back.
    val pairs = Dedup.minHashNearDup(
      exactKept.select(col("doc_id"), col("text")),
      "doc_id", "text", threshold = jaccard)
    val dropList = Dedup.componentLabels(pairs)
      .filter(col("doc") =!= col("label"))
      .select(col("doc").as("doc_id"))
    exactKept.join(dropList, Seq("doc_id"), "left_anti")
  }

  /** Registry entry: per-source corpus summary of the curated set.
    * Rows-only for the driver (the near-dup stage is xxhash-derived);
    * invariants asserted in DocPipelineSpec. */
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
    None)

  val all: Seq[QueryDef] = Seq(pipeline)
}
