package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis surface over the `documents` fixture: token counting,
  * quality scoring, language ID, fingerprinting — the per-document stages of
  * a training-data pipeline. All pure string/arithmetic expressions inside
  * whole-stage codegen; at 100 TB these are embarrassingly parallel map
  * stages with only the final (tiny, bounded-cardinality) aggregates
  * shuffling.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single other chars). */
  val tokenCount = QueryDef(
    "q_text_tokens",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("source"),
          size(toks(col("text"))).cast("long").as("ws_toks"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
            .as("bpe_toks"),
          col("n_chars"))
        .groupBy(col("source"))
        .agg(
          sum(col("ws_toks")).as("total_ws_toks"),
          sum(col("bpe_toks")).as("total_bpe_toks"),
          max(col("ws_toks")).as("max_ws_toks"),
          sum(col("n_chars")).as("total_chars"),
          count(lit(1)).as("n_docs"))
    },
    Some("""
      SELECT source,
             CAST(sum(ws_toks) AS BIGINT) AS total_ws_toks,
             CAST(sum(bpe_toks) AS BIGINT) AS total_bpe_toks,
             CAST(max(ws_toks) AS BIGINT) AS max_ws_toks,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             count(*) AS n_docs
      FROM (SELECT source, n_chars,
                   len(str_split(text, ' ')) AS ws_toks,
                   len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                     AS bpe_toks
            FROM documents)
      GROUP BY source"""))

  /** Quality scoring: length/stopword/char-class ratios → score → bucket.
    * Integer-count ratios only, so both engines produce identical doubles. */
  val quality = QueryDef(
    "q_text_quality",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(toks(col("text"))).cast("double").as("n_tok"),
          // codegen'd set-probe kernel; a filter() HOF lambda here evaluates
          // interpreted and breaks the WholeStageCodegen span
          expr("count_in_set(split(text, ' '), 'the,a,of,and,to,in,is')")
            .cast("double").as("n_stop"),
          size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
            .cast("double").as("n_digit"))
        .select(col("doc_id"),
          col("n_tok").cast("long").as("n_tok"),
          (col("n_stop") / col("n_tok")).as("stop_ratio"),
          (col("n_chars").cast("double") / col("n_tok")).as("avg_tok_len"),
          (col("n_tok") / (col("n_tok") + lit(50.0)) +
            col("n_stop") / col("n_tok") -
            col("n_digit") / col("n_tok")).as("quality"))
        .withColumn("bucket",
          when(col("quality") >= 1.0, "high")
            .when(col("quality") >= 0.7, "mid").otherwise("low"))
    },
    Some("""
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             n_stop / n_tok AS stop_ratio,
             CAST(n_chars AS DOUBLE) / n_tok AS avg_tok_len,
             n_tok / (n_tok + 50.0) + n_stop / n_tok - n_digit / n_tok
               AS quality,
             CASE WHEN n_tok / (n_tok + 50.0) + n_stop / n_tok
                       - n_digit / n_tok >= 1.0 THEN 'high'
                  WHEN n_tok / (n_tok + 50.0) + n_stop / n_tok
                       - n_digit / n_tok >= 0.7 THEN 'mid'
                  ELSE 'low' END AS bucket
      FROM (SELECT doc_id, n_chars,
                   CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(str_split(text, ' '),
                     t -> t IN ('the','a','of','and','to','in','is')))
                     AS DOUBLE) AS n_stop,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                     AS n_digit
            FROM documents)"""))

  /** Language ID by stopword-unigram voting (n-gram heuristic). Scores per
    * language, argmax with a fixed priority tie-break; compared against the
    * claimed `lang` column to produce a confusion summary. */
  val langId = QueryDef(
    "q_text_langid",
    (spark, dir) => {
      // one codegen'd hash-set pass per language (count_in_set kernel);
      // the filter(isin) HOF formulation scored 1.9s at sf0.1 because the
      // lambda evaluates interpreted AND forces the projection off codegen
      def score(words: Seq[String]): Column =
        expr(s"count_in_set(split(text, ' '), '${words.mkString(",")}')")
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          score(Seq("the", "a", "of", "and")).as("s_en"),
          score(Seq("le", "la", "et", "les")).as("s_fr"),
          score(Seq("el", "los", "y", "una")).as("s_es"),
          score(Seq("der", "die", "und", "das")).as("s_de"))
        .withColumn("pred",
          when(col("s_en") === 0 && col("s_fr") === 0 &&
            col("s_es") === 0 && col("s_de") === 0, "und")
            .when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_es") &&
              col("s_en") >= col("s_de"), "en")
            .when(col("s_fr") >= col("s_es") && col("s_fr") >= col("s_de"), "fr")
            .when(col("s_es") >= col("s_de"), "es")
            .otherwise("de"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"), sum(col("s_en")).as("sum_en_hits"))
    },
    Some("""
      SELECT lang, pred, count(*) AS n,
             CAST(sum(s_en) AS BIGINT) AS sum_en_hits
      FROM (
        SELECT lang, s_en, s_fr, s_es, s_de,
               CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0
                      THEN 'und'
                    WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de
                      THEN 'en'
                    WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                    WHEN s_es >= s_de THEN 'es'
                    ELSE 'de' END AS pred
        FROM (
          SELECT lang,
                 len(list_filter(str_split(text, ' '),
                   t -> t IN ('the','a','of','and'))) AS s_en,
                 len(list_filter(str_split(text, ' '),
                   t -> t IN ('le','la','et','les'))) AS s_fr,
                 len(list_filter(str_split(text, ' '),
                   t -> t IN ('el','los','y','una'))) AS s_es,
                 len(list_filter(str_split(text, ' '),
                   t -> t IN ('der','die','und','das'))) AS s_de
          FROM documents))
      GROUP BY lang, pred"""))

  /** Document fingerprinting: md5 content fingerprint over normalized text +
    * a rolling polynomial hash of token lengths (mod p to stay exact in both
    * engines). */
  val fingerprint = QueryDef(
    "q_text_fingerprint",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(regexp_replace(lower(trim(col("text"))), lit(" +"), lit(" "))
            .cast("binary")).as("fp"),
          expr("len_poly_hash(split(text, ' '))").as("len_hash"))
        .groupBy(col("source"))
        .agg(
          countDistinct(col("fp")).as("n_distinct_fp"),
          countDistinct(col("len_hash")).as("n_distinct_lh"),
          count(lit(1)).as("n_docs"))
    },
    Some("""
      SELECT source,
             count(DISTINCT md5(regexp_replace(lower(trim(text)), ' +', ' ',
                                               'g'))) AS n_distinct_fp,
             count(DISTINCT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(str_split(text, ' '),
                                t -> CAST(length(t) AS BIGINT))),
               (acc, t) -> (acc * 31 + t) % 1000000007)) AS n_distinct_lh,
             count(*) AS n_docs
      FROM documents
      GROUP BY source"""))

  /** Approximate frequent tokens per language via the Space-Saving
    * `freq_sketch` UDAF (graft.functions.FreqSketch): tokens explode, one
    * partial/merge/final aggregate ships ≤k counters per language, and the
    * per-language top-10 unpacks from the sketch map — the frequency
    * profile a tokenizer-vocabulary pass runs at 100 TB without a
    * full-width groupBy on the token. The counter VALUES are merge-order
    * dependent, so the registry row emits the DERIVED facts Space-Saving
    * guarantees instead: the top-10 exists (n_top) and every counter
    * respects true ≤ est ≤ true + N/k (n_violations, checked by joining
    * the sketch's survivors back to exact token counts) — the oracle
    * checks 10/0 per language, so the guarantee is a driver-checked fact.
    * Raw counters and the exact top-10 stay pinned in FreqSketchSpec and
    * the oracle-exact twin q_text_freq_tokens_exact. */
  val freqTokens = QueryDef(
    "q_text_freq_tokens",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tokens = Tables(spark, dir, "documents")
        .select(col("lang"), explode(toks(col("text"))).as("token"))
      val top = tokens
        .groupBy(col("lang"))
        .agg(expr("freq_sketch(token, 32)").as("sketch"),
          count(lit(1)).as("n_tok"))
        .select(col("lang"), col("n_tok"),
          explode(col("sketch")).as(Seq("token", "est")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("est").desc, col("token"))))
        .filter(col("rk") <= 10)
      val exact = tokens.groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("cnt"))
      top.join(exact, Seq("lang", "token"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_top"),
          sum(when(col("est") < col("cnt") ||
            (col("est") - col("cnt")) * 32 > col("n_tok"), 1L)
            .otherwise(0L)).as("n_violations"))
    },
    Some("""
      SELECT lang, CAST(10 AS BIGINT) AS n_top,
             CAST(0 AS BIGINT) AS n_violations
      FROM (SELECT DISTINCT lang FROM documents)"""))

  /** Exact twin of [[freqTokens]]: true per-language top-10 token counts,
    * DuckDB-oracle-checked — pins the semantics the Space-Saving sketch
    * approximates (FreqSketchSpec bounds the sketch against this truth).
    * Scale shape: the explode feeds ONE partial/final count aggregate on
    * (lang, token); the top-k over the vocabulary-sized count table runs
    * through the custom TopKPerGroupExec (bounded heaps, no per-language
    * vocabulary sort); the rank column is re-derived by a window over the
    * <=10-rows-per-language survivor set only. */
  val freqTokensExact = QueryDef(
    "q_text_freq_tokens_exact",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables(spark, dir, "documents")
        .select(col("lang"), explode(toks(col("text"))).as("token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("est"))
      graft.ops.topKPerGroup(counts, Seq("lang"), "est", "token", k = 10)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
            .orderBy(col("est").desc, col("token"))).cast("long"))
        .select(col("lang"), col("token"), col("est"), col("rk"))
    },
    Some("""
      SELECT lang, token, est, rk FROM (
        SELECT lang, token, est,
               CAST(row_number() OVER (PARTITION BY lang
                                       ORDER BY est DESC, token) AS BIGINT)
                 AS rk
        FROM (SELECT lang, tok AS token, count(*) AS est
              FROM (SELECT lang, unnest(str_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY lang, tok))
      WHERE rk <= 10"""))

  /** Per-document Gopher-style quality flags (Rae et al. 2021, Appendix A
    * — "Quality filtering"; adapted to the single-line fixture, whose
    * degenerate signals are the LINE-based ones, so the battery keeps the
    * word-grain rules and both REPETITION rules):
    *
    *   - `f_words`   word count in [20, 1000]
    *   - `f_meanlen` mean word length in [3, 5] chars
    *   - `f_dup`     duplicate-word fraction <= 0.55 (dup-line analogue)
    *   - `f_top2`    top bigram share of all bigrams <= 0.08
    *   - `f_stop`    >= 2 stopword hits
    *
    * Every ratio test is cross-multiplied into ALL-INTEGER arithmetic, so
    * the flags are bit-deterministic in any engine. Scale: the base flags
    * are a pure map stage; the bigram share is one explode plus two
    * partially-aggregated shuffles on (id, gram) then (id) — linear in
    * corpus size, never all-pairs, no skew pivot (gram counts are bounded
    * by per-doc length).
    */
  def gopherFlags(docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val t = docs.withColumn("__ws", toks(col(textCol)))
    val base = t
      .withColumn("__nw", size(col("__ws")))
      .withColumn("__nd", size(array_distinct(col("__ws"))))
      .withColumn("__lc", length(col(textCol)) - (col("__nw") - lit(1)))
      .withColumn("__stop",
        expr("count_in_set(__ws, 'the,a,of,and,to,in,is')"))
    // top bigram count per doc; docs under 2 words have no bigrams (LEFT
    // join + coalesce(0)) — and the sequence() guard matters: Spark's
    // sequence(0, -1) would auto-step BACKWARDS, not return empty
    val top = t.filter(size(col("__ws")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__ws)-2)," +
          " i -> concat(__ws[i], ' ', __ws[i+1]))")).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__top_c"))
    base.join(top, Seq(idCol), "left")
      .withColumn("f_words",
        when(col("__nw").between(20, 1000), 1).otherwise(0))
      .withColumn("f_meanlen",
        when(lit(3) * col("__nw") <= col("__lc") &&
          col("__lc") <= lit(5) * col("__nw"), 1).otherwise(0))
      .withColumn("f_dup",
        when((col("__nw") - col("__nd")) * lit(100) <= lit(55) * col("__nw"),
          1).otherwise(0))
      .withColumn("f_top2",
        when(coalesce(col("__top_c"), lit(0L)) * lit(100) <=
          lit(8) * (col("__nw") - lit(1)), 1).otherwise(0))
      .withColumn("f_stop", when(col("__stop") >= 2, 1).otherwise(0))
      .withColumn("is_clean",
        col("f_words") * col("f_meanlen") * col("f_dup") *
          col("f_top2") * col("f_stop") === 1)
      .drop("__ws", "__nw", "__nd", "__lc", "__stop", "__top_c")
  }

  /** Registry face of [[gopherFlags]]: per-source pass counts for each rule
    * plus the all-rules-clean count, DuckDB-oracled end to end. */
  val gopherBattery = QueryDef(
    "q_text_gopher",
    (spark, dir) => {
      gopherFlags(Tables(spark, dir, "documents"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f_words")).cast("long").as("p_words"),
          sum(col("f_meanlen")).cast("long").as("p_meanlen"),
          sum(col("f_dup")).cast("long").as("p_dup"),
          sum(col("f_top2")).cast("long").as("p_top2"),
          sum(col("f_stop")).cast("long").as("p_stop"),
          sum(when(col("is_clean"), 1L).otherwise(0L)).as("n_clean"))
    },
    Some("""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws,
                        length(text) AS lc0 FROM documents),
      base AS (
        SELECT doc_id, source, len(ws) AS nw, len(list_distinct(ws)) AS nd,
               lc0 - (len(ws) - 1) AS lc,
               len(list_filter(ws,
                 w -> w IN ('the','a','of','and','to','in','is'))) AS nstop
        FROM t),
      grams AS (SELECT t.doc_id, t.ws[u.i] || ' ' || t.ws[u.i+1] AS g
                FROM t, unnest(generate_series(1, len(t.ws) - 1)) AS u(i)
                WHERE len(t.ws) >= 2),
      gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
      top AS (SELECT doc_id, max(c) AS top_c FROM gc GROUP BY 1),
      flags AS (
        SELECT source,
               CASE WHEN nw BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS f_words,
               CASE WHEN 3 * nw <= lc AND lc <= 5 * nw THEN 1 ELSE 0 END
                 AS f_meanlen,
               CASE WHEN (nw - nd) * 100 <= 55 * nw THEN 1 ELSE 0 END
                 AS f_dup,
               CASE WHEN coalesce(top_c, 0) * 100 <= 8 * (nw - 1)
                    THEN 1 ELSE 0 END AS f_top2,
               CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS f_stop
        FROM base LEFT JOIN top USING (doc_id))
      SELECT source, count(*) AS n_docs,
             CAST(sum(f_words) AS BIGINT) AS p_words,
             CAST(sum(f_meanlen) AS BIGINT) AS p_meanlen,
             CAST(sum(f_dup) AS BIGINT) AS p_dup,
             CAST(sum(f_top2) AS BIGINT) AS p_top2,
             CAST(sum(f_stop) AS BIGINT) AS p_stop,
             CAST(sum(f_words * f_meanlen * f_dup * f_top2 * f_stop)
                  AS BIGINT) AS n_clean
      FROM flags GROUP BY source"""))

  /** Vocabulary overlap across sources via KMV SET ALGEBRA: one token
    * sketch per source (kmv_state), then pairwise kmv_jaccard /
    * kmv_intersect on the 4x4 sketch table. The scale story is the point:
    * cross-corpus overlap at 100 TB never joins raw tokens — each corpus
    * reduces to a <=(4+8k)-byte state (one shuffle of sketch rows), and
    * the pairwise algebra runs on a handful of rows. Deterministic
    * md5-derived sketches (`kmv_state_det` / `kmv_intersect_det`), so the
    * DuckDB oracle replays the whole set-algebra walk — per-source k-min
    * sketch, first-k merged union, shared-hash count, integer-division
    * union estimate — bit-for-bit. [[q_text_kmv_overlap_exact]] remains
    * the exact-truth twin, and KmvSetSpec pins the estimator error
    * bounds. */
  val kmvOverlap = QueryDef(
    "q_text_kmv_overlap",
    (spark, dir) => {
      val sk = Tables(spark, dir, "documents")
        .filter(col("source").isin("src1", "src2", "src3", "src4"))
        .select(col("source"), explode(toks(col("text"))).as("w"))
        .groupBy(col("source")).agg(expr("kmv_state_det(w)").as("st"))
      val a = sk.toDF("src_a", "st_a")
      val b = sk.toDF("src_b", "st_b")
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          expr("kmv_jaccard(st_a, st_b)").as("jaccard_est"),
          expr("kmv_intersect_det(st_a, st_b)").as("inter_est"))
    },
    // Replays KmvSetOps.mergeStats: per-source sketch = 512 smallest
    // distinct 48-bit hashes; for each pair, walk the merged union in hash
    // order for 512 steps; jaccard = shared/taken; intersection = round(
    // jaccard x union-estimate). All-integer until the two final IEEE
    // double ops, which are identical in both engines.
    Some("""
      WITH tok AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(w), 1, 12))::BIGINT AS h
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents
              WHERE source IN ('src1', 'src2', 'src3', 'src4'))),
      sk AS (
        SELECT source, h FROM (
          SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rk
          FROM tok) WHERE rk <= 512),
      pr AS (
        SELECT a.source AS src_a, b.source AS src_b
        FROM (SELECT DISTINCT source FROM sk) a
        JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
      mem AS (
        SELECT p.src_a, p.src_b, s.h,
               max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS ina,
               max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS inb
        FROM pr p JOIN sk s ON s.source = p.src_a OR s.source = p.src_b
        GROUP BY p.src_a, p.src_b, s.h),
      top AS (
        SELECT * FROM (
          SELECT src_a, src_b, h, ina, inb,
                 row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
                   AS rk
          FROM mem) WHERE rk <= 512),
      agg AS (
        SELECT src_a, src_b, count(*) AS taken,
               CAST(sum(ina * inb) AS BIGINT) AS both_n, max(h) AS last_h
        FROM top GROUP BY src_a, src_b)
      SELECT src_a, src_b,
             CAST(both_n AS DOUBLE) / CAST(taken AS DOUBLE) AS jaccard_est,
             CAST(round(
               (CAST(both_n AS DOUBLE) / CAST(taken AS DOUBLE)) *
               CAST(CASE WHEN taken < 512 THEN taken
                         ELSE (511 * 281474976710656) // last_h
                    END AS DOUBLE), 0) AS BIGINT) AS inter_est
      FROM agg"""))

  /** Exact twin of [[kmvOverlap]]: true distinct-token intersection and
    * Jaccard per source pair, DuckDB-oracled (one integer division at the
    * end — bit-identical in both engines). */
  val kmvOverlapExact = QueryDef.sql(
    "q_text_kmv_overlap_exact",
    """WITH tok AS (
         SELECT DISTINCT source, w
         FROM (SELECT source, explode(split(text, ' ')) AS w
               FROM documents
               WHERE source IN ('src1', 'src2', 'src3', 'src4'))),
       cnt AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
       inter AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
         FROM tok a JOIN tok b ON a.w = b.w AND a.source < b.source
         GROUP BY a.source, b.source)
       SELECT src_a, src_b, n_inter,
              CAST(n_inter AS DOUBLE)
                / CAST(ca.n + cb.n - n_inter AS DOUBLE) AS jaccard
       FROM inter
       JOIN cnt ca ON ca.source = src_a
       JOIN cnt cb ON cb.source = src_b""",
    """WITH tok AS (
         SELECT DISTINCT source, w
         FROM (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents
               WHERE source IN ('src1', 'src2', 'src3', 'src4'))),
       cnt AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
       inter AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
         FROM tok a JOIN tok b ON a.w = b.w AND a.source < b.source
         GROUP BY a.source, b.source)
       SELECT src_a, src_b, n_inter,
              CAST(n_inter AS DOUBLE)
                / CAST(ca.n + cb.n - n_inter AS DOUBLE) AS jaccard
       FROM inter
       JOIN cnt ca ON ca.source = src_a
       JOIN cnt cb ON cb.source = src_b""")

  /** Corpus diversity report — the numbers a corpus card publishes per
    * language slice (and the signals mode-collapse / template-spam checks
    * gate on): type-token ratio, distinct-trigram ratio, and unigram
    * Shannon entropy. All-integer arithmetic keeps it oracle-exact:
    * entropy is the repo's ⌊log2⌋ quantization — Σ_w n_w·(bitlen(N) −
    * bitlen(n_w)) — emitted in integer MILLIBITS per token
    * (·1000 div N), and the two ratios are per-million integers. One
    * token explode + one 3-gram explode, everything else is narrow
    * per-language aggregates; nothing corpus-sized shuffles twice. */
  val diversity = QueryDef(
    "q_text_diversity",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val tokens = docs.select(col("lang"),
        explode(toks(col("text"))).as("w"))
      // vocab-bounded per-language unigram table, consumed twice (totals +
      // the entropy sum) — narrow, no persist needed: the corpus explode
      // feeds ONE aggregation, everything after is vocab-sized
      val uni = tokens.groupBy(col("lang"), col("w"))
        .agg(count(lit(1)).as("n_w"))
      val totals = uni.groupBy(col("lang"))
        .agg(sum(col("n_w")).as("n_tok"), count(lit(1)).as("n_types"))
      val ent = uni.join(totals.select(col("lang"), col("n_tok")), "lang")
        .groupBy(col("lang"))
        .agg(sum(col("n_w") *
          (length(bin(col("n_tok"))) - length(bin(col("n_w")))).cast("long"))
          .as("ent_sum"))
      val tris = docs
        .select(col("lang"), toks(col("text")).as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("lang"),
          explode(sequence(lit(3), size(col("l")))).as("i"), col("l"))
        .select(col("lang"), concat_ws(" ",
          element_at(col("l"), col("i") - 2),
          element_at(col("l"), col("i") - 1),
          element_at(col("l"), col("i"))).as("g"))
        .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("n_g"))
        .groupBy(col("lang"))
        .agg(sum(col("n_g")).as("n_tri"), count(lit(1)).as("n_tri_types"))
      totals.join(ent, "lang").join(tris, "lang")
        .select(col("lang"), col("n_tok"), col("n_types"),
          expr("n_types * 1000000L DIV n_tok").as("ttr_ppm"),
          col("n_tri"), col("n_tri_types"),
          expr("n_tri_types * 1000000L DIV n_tri").as("tri_ppm"),
          expr("ent_sum * 1000L DIV n_tok").as("entropy_millibits"))
    },
    Some("""
      WITH t AS (
        SELECT lang, string_split(text, ' ') AS l FROM documents),
      toks AS (
        SELECT lang, unnest(l) AS w FROM t),
      uni AS (
        SELECT lang, w, count(*) AS n_w FROM toks GROUP BY 1, 2),
      totals AS (
        SELECT lang, CAST(sum(n_w) AS BIGINT) AS n_tok,
               count(*) AS n_types
        FROM uni GROUP BY 1),
      ent AS (
        SELECT u.lang,
               CAST(sum(u.n_w * (length(bin(tt.n_tok))
                                 - length(bin(u.n_w)))) AS BIGINT)
                 AS ent_sum
        FROM uni u JOIN totals tt ON u.lang = tt.lang
        GROUP BY 1),
      tri_raw AS (
        SELECT lang, l[i-2] || ' ' || l[i-1] || ' ' || l[i] AS g
        FROM t, unnest(range(3, len(l)+1)) AS u(i)
        WHERE len(l) >= 3),
      tri_counts AS (
        SELECT lang, g, count(*) AS n_g FROM tri_raw GROUP BY 1, 2),
      tris AS (
        SELECT lang, CAST(sum(n_g) AS BIGINT) AS n_tri,
               count(*) AS n_tri_types
        FROM tri_counts GROUP BY 1)
      SELECT t.lang, t.n_tok, t.n_types,
             CAST(t.n_types * 1000000 // t.n_tok AS BIGINT) AS ttr_ppm,
             r.n_tri, r.n_tri_types,
             CAST(r.n_tri_types * 1000000 // r.n_tri AS BIGINT) AS tri_ppm,
             CAST(e.ent_sum * 1000 // t.n_tok AS BIGINT)
               AS entropy_millibits
      FROM totals t
      JOIN ent e ON t.lang = e.lang
      JOIN tris r ON t.lang = r.lang"""))

  /** Library API: PII detection flags — per-document counts of
    * email-shaped tokens, NNN-NNN-NNNN phone shapes, dotted-quad IPs, and
    * 16-digit card candidates GATED BY THE LUHN CHECKSUM (a bare \d{16}
    * matcher flags order ids and hashes; the mod-10 gate is what separates
    * a plausible card number). All patterns live in the Java∩RE2 common
    * subset; the Luhn gate is Spark's codegen'd luhn_check, replayed
    * digit-by-digit in the DuckDB oracle. Pure map stage — zero shuffle,
    * composes in front of [[graft.operators.Sampling.scrubbed]]. */
  def piiFlags(docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    docs
      .withColumn("pii_emails", expr(
        s"size(regexp_extract_all($textCol, " +
          "'[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', 0))").cast("long"))
      .withColumn("pii_phones", expr(
        s"size(regexp_extract_all($textCol, " +
          "'\\\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\\\b', 0))").cast("long"))
      .withColumn("pii_ips", expr(
        s"size(regexp_extract_all($textCol, " +
          "'\\\\b[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\b'," +
          " 0))").cast("long"))
      .withColumn("pii_cards", expr(
        s"size(filter(regexp_extract_all($textCol, " +
          "'\\\\b[0-9]{16}\\\\b', 0), c -> luhn_check(c)))").cast("long"))
      .withColumn("has_pii",
        (col("pii_emails") + col("pii_phones") + col("pii_ips") +
          col("pii_cards")) > 0)
  }

  /** PII detection over a deterministically PII-salted corpus (the fixture
    * text carries none, so each doc's md5 class injects one known shape:
    * an email, a phone, a LUHN-VALID card, a Luhn-INVALID 16-digit decoy,
    * or nothing). The per-source census pins that the card counter
    * accepts exactly the valid card class and rejects the decoy class —
    * the Luhn gate is the assertion, replayed digit-by-digit in DuckDB. */
  val pii = QueryDef(
    "q_text_pii",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val cls = expr(
        "CAST(conv(substr(md5(text), 30, 1), 16, 10) AS BIGINT) % 5")
      val salted = docs.withColumn("salted",
        concat(col("text"), lit(" "),
          when(cls === 0, concat(lit("user"), col("doc_id"),
            lit("@example.com")))
            .when(cls === 1, lit("555-867-5309"))
            .when(cls === 2, lit("4111111111111111"))
            .when(cls === 3, lit("4111111111111112"))
            .otherwise(lit("clean"))))
      piiFlags(salted, "salted")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pii_emails")).as("n_emails"),
          sum(col("pii_phones")).as("n_phones"),
          sum(col("pii_ips")).as("n_ips"),
          sum(col("pii_cards")).as("n_valid_cards"),
          sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_docs_flagged"))
    },
    Some("""
      WITH t AS (
        SELECT source,
               ('0x' || substr(md5(text), 30, 1))::BIGINT % 5 AS cls
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_emails,
             CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_phones,
             CAST(0 AS BIGINT) AS n_ips,
             CAST(sum(CASE WHEN cls = 2 AND
                 list_sum(list_transform(range(1, 17), i ->
                   CASE WHEN i % 2 = 1 THEN
                     CASE WHEN 2 * CAST('4111111111111111'[i] AS INT) > 9
                          THEN 2 * CAST('4111111111111111'[i] AS INT) - 9
                          ELSE 2 * CAST('4111111111111111'[i] AS INT) END
                   ELSE CAST('4111111111111111'[i] AS INT) END)) % 10 = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_cards,
             CAST(sum(CASE WHEN cls IN (0, 1, 2) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_docs_flagged
      FROM t GROUP BY source"""))

  /** Library API: PII REDACTION — [[piiFlags]]'s sibling that rewrites the
    * text instead of counting: emails → [EMAIL], NNN-NNN-NNNN phones →
    * [PHONE], dotted-quad IPs → [IP], any 16-digit run → [NUM16].
    * Deliberately CONSERVATIVE where the flags are precise: the flag
    * counter Luhn-gates card numbers (an analyst wants precision), the
    * redactor scrubs every 16-digit run including Luhn-invalid decoys (a
    * leak reviewer wants recall — a regex replace can't carry the Luhn
    * arithmetic and must not leave near-miss numbers behind). Pure map
    * stage — four regexp_replace passes per row, no shuffle, safe at any
    * scale. Returns the frame + (redacted, was_redacted). */
  def redactPii(docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    // recall-biased email charset: +/%/- in the local part and hyphens in
    // the domain are common ('user+tag@gmail.com', 'a-b@my-host.com') — a
    // narrower class leaves residual fragments behind. The precision-gated
    // piiFlags counter keeps its own narrower pattern by design.
    val steps = Seq(
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+" -> "[EMAIL]",
      "\\\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\\\b" -> "[PHONE]",
      "\\\\b[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\b"
        -> "[IP]",
      "\\\\b[0-9]{16}\\\\b" -> "[NUM16]")
    val redacted = steps.foldLeft(s"$textCol")((acc, s) =>
      s"regexp_replace($acc, '${s._1}', '${s._2}')")
    docs
      .withColumn("redacted", expr(redacted))
      .withColumn("was_redacted", col("redacted") =!= col(textCol))
  }

  /** Redaction over the same deterministically PII-salted corpus as
    * [[pii]] (plus an IP class): per-source census of changed docs and an
    * md5-prefix checksum over every redacted text — the oracle replays the
    * identical regexp_replace chain (global flag spelled 'g' in DuckDB,
    * Spark's default), so one character of residual PII or one
    * over-redaction mismatches the checksum. */
  val redact = QueryDef(
    "q_text_redact",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val cls = expr(
        "CAST(conv(substr(md5(text), 29, 1), 16, 10) AS BIGINT) % 5")
      val salted = docs.withColumn("salted",
        concat(col("text"), lit(" "),
          when(cls === 0, concat(lit("user"), col("doc_id"),
            lit("@example.com")))
            .when(cls === 1, lit("555-867-5309"))
            .when(cls === 2, lit("4111111111111112"))
            .when(cls === 3, lit("10.0.0.1"))
            .otherwise(lit("clean"))))
      redactPii(salted, "salted")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("was_redacted"), 1L).otherwise(0L))
            .as("n_redacted"),
          sum(expr(
            "CAST(conv(substr(md5(redacted), 1, 7), 16, 10) AS BIGINT)"))
            .as("corpus_checksum"))
    },
    Some("""
      WITH t AS (
        SELECT source,
               text || ' ' ||
               CASE ('0x' || substr(md5(text), 29, 1))::BIGINT % 5
                 WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR)
                   || '@example.com'
                 WHEN 1 THEN '555-867-5309'
                 WHEN 2 THEN '4111111111111112'
                 WHEN 3 THEN '10.0.0.1'
                 ELSE 'clean' END AS salted
        FROM documents),
      r AS (
        SELECT source,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 salted,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '[EMAIL]', 'g'),
                 '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                 '[IP]', 'g'),
                 '\b[0-9]{16}\b', '[NUM16]', 'g') AS redacted,
               salted
        FROM t)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN redacted <> salted THEN 1 ELSE 0 END)
               AS BIGINT) AS n_redacted,
             CAST(sum(('0x' || substr(md5(redacted), 1, 7))::BIGINT)
               AS BIGINT) AS corpus_checksum
      FROM r GROUP BY source"""))

  /** Library API: document STITCHING — crawl and OCR pipelines shard long
    * pages into fixed-size records, and the reassembly signal is byte
    * overlap: shard B continues shard A when A's tail equals B's head.
    * Candidate generation is an exact equi-join on the md5 of the
    * `overlap`-char boundary slice (one keyed shuffle per side — never
    * all-pairs; boundary-hash collisions across unrelated docs surface as
    * candidates and are confirmed by the caller on the raw slices, the
    * same candidate→confirm discipline as the near-dup families).
    * Returns (a_id, b_id) candidate continuation pairs. */
  def stitchPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, overlap: Int = 32): org.apache.spark.sql.DataFrame = {
    val tails = docs.select(col(idCol).as("st_a"),
      md5(expr(s"substring($textCol, length($textCol) - ${overlap - 1}, " +
        s"$overlap)").cast("binary")).as("st_h"))
      .filter(expr(s"length($textCol) >= $overlap"))
    val heads = docs.select(col(idCol).as("st_b"),
      md5(expr(s"substring($textCol, 1, $overlap)").cast("binary"))
        .as("st_h"))
      .filter(expr(s"length($textCol) >= $overlap"))
    tails.join(heads, "st_h")
      .filter(col("st_a") =!= col("st_b"))
      .select(col("st_a").as("a_id"), col("st_b").as("b_id"))
  }

  /** Stitching over a deterministically SHARDED corpus: every fourth doc
    * gets a synthesized continuation shard (head = the doc's 32-char
    * tail), ids offset by 10^9; the census pins that every synthesized
    * continuation is recovered (plus any true tail/head collisions the
    * word-salad fixture happens to contain — the oracle replays them
    * identically). */
  val stitch = QueryDef(
    "q_text_stitch",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val base = docs.select(col("doc_id"), col("text"))
      val shards = docs
        .filter(expr(
          "CAST(conv(substr(md5(text), 28, 1), 16, 10) AS BIGINT) % 4 = 0"))
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          concat(expr("substring(text, length(text) - 31, 32)"),
            lit(" continuation shard "),
            col("doc_id").cast("string")).as("text"))
      val corpus = base.unionAll(shards)
      stitchPairs(corpus, "doc_id", "text")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("b_id") - col("a_id") === 1000000000L, 1L)
            .otherwise(0L)).as("n_true_continuations"),
          sum(col("a_id") + col("b_id")).as("pair_checksum"))
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000,
               substring(text, length(text) - 31, 32)
                 || ' continuation shard ' || CAST(doc_id AS VARCHAR)
        FROM documents
        WHERE ('0x' || substr(md5(text), 28, 1))::BIGINT % 4 = 0),
      tails AS (
        SELECT doc_id AS a_id,
               md5(substring(text, length(text) - 31, 32)) AS h
        FROM corpus WHERE length(text) >= 32),
      heads AS (
        SELECT doc_id AS b_id, md5(substring(text, 1, 32)) AS h
        FROM corpus WHERE length(text) >= 32),
      p AS (
        SELECT a_id, b_id FROM tails JOIN heads USING (h)
        WHERE a_id <> b_id)
      SELECT count(*) AS n_pairs,
             CAST(sum(CASE WHEN b_id - a_id = 1000000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_true_continuations,
             CAST(sum(a_id + b_id) AS BIGINT) AS pair_checksum
      FROM p"""))

  /** Library API: cross-document boilerplate removal (the CCNet/jusText
    * cleanup stage) — headers, footers, nav bars, cookie banners repeat
    * across pages, so any chunk whose DOCUMENT FREQUENCY exceeds `maxDf`
    * is boilerplate and is cut from every document. "Chunk" = tumbling
    * `chunkTokens`-token window (documents here carry no newline
    * structure; with real pages the splitter is `split(text, '\n')` and
    * the machinery is identical). Returns
    * (idCol, clean_text, n_chunks, n_dropped) — clean_text is the doc
    * reassembled IN ORDER from its surviving chunks.
    *
    * Scale shape (reworked r9): chunk TEXT never crosses a shuffle. The
    * explode emits (doc, idx, md5(chunk)) — a fixed-width 128-bit image
    * instead of the chunk — the df aggregate and the join back both key
    * on the hash, the per-doc survivor aggregate collects chunk INDEXES
    * only, and clean_text is reassembled IN-ROW from the doc's own split
    * by the surviving indexes (one text-bearing join of the docs frame,
    * where round 8 shuffled chunk text through the df join AND the
    * reassembly groupBy). md5 keying is exact-by-construction for any
    * corpus that fits 2^64 distinct chunks (birthday bound of a 128-bit
    * hash); the DuckDB oracles mirror the same md5 grouping so the
    * engines agree bit-for-bit even in the hypothetical collision.
    * Duplicated corpora only deepen df counts — the df table never
    * widens past the distinct-chunk vocabulary. */
  def removeBoilerplate(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, chunkTokens: Int = 8,
      maxDf: Int = 2): org.apache.spark.sql.DataFrame = {
    // split() is hoisted into a column BEFORE the chunking lambda: a
    // split inside the transform body re-tokenizes the document once per
    // CHUNK (loop-invariant expressions aren't hoisted out of
    // higher-order functions → O(len²/chunk) map work, the round-7 3.4x
    // gate drift on q_docs_pipeline_clean); bp_ws is referenced several
    // times, which keeps CollapseProject from inlining the split back in
    val base = docs
      .select(col(idCol), col(textCol), split(col(textCol), " ").as("bp_ws"))
    val chunks = base
      .select(col(idCol),
        posexplode(expr(
          s"""transform(
              sequence(0, CAST((size(bp_ws) + ${chunkTokens - 1})
                               DIV $chunkTokens AS INT) - 1),
              i -> array_join(slice(bp_ws,
                   i * $chunkTokens + 1, $chunkTokens), ' '))"""))
        .as(Seq("bp_idx", "bp_chunk")))
      .select(col(idCol), col("bp_idx"),
        md5(col("bp_chunk").cast("binary")).as("bp_h"))
    val dfTab = chunks.groupBy(col("bp_h"))
      .agg(countDistinct(col(idCol)).as("bp_df"))
    val keptIdx = chunks.join(dfTab, "bp_h").filter(col("bp_df") <= maxDf)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("bp_idx"))).as("bp_keep"))
    val nChunks = expr(
      s"CAST((size(bp_ws) + ${chunkTokens - 1}) DIV $chunkTokens AS BIGINT)")
    base.join(keptIdx, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(array_join(transform(col("bp_keep"),
          i => array_join(slice(col("bp_ws"),
            i * chunkTokens + 1, lit(chunkTokens)), " ")), " "),
          lit("")).as("clean_text"),
        nChunks.as("n_chunks"),
        (nChunks - when(col("bp_keep").isNotNull,
          size(col("bp_keep")).cast("long")).otherwise(0L))
          .as("n_dropped"))
  }

  /** Boilerplate removal over the corpus (8-token chunks, df > 2 cut):
    * per-source census of touched docs and dropped chunks, plus an
    * md5-prefix checksum over every reassembled clean_text — one integer
    * that pins the exact post-removal corpus, chunk order included. */
  val boilerplate = QueryDef(
    "q_text_boilerplate",
    (spark, dir) => {
      // chunk-explode + hash census is scan-fused per doc; spreading by
      // doc_id also pre-partitions BOTH sides of the doc_id join back
      val docs = Tables.spread(spark, dir, "documents")
      removeBoilerplate(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_dropped") > 0, 1L).otherwise(0L))
            .as("n_docs_cleaned"),
          sum(col("n_dropped")).as("n_chunks_dropped"),
          sum(expr(
            "CAST(conv(substr(md5(clean_text), 1, 7), 16, 10) AS BIGINT)"))
            .as("corpus_checksum"))
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      c AS (SELECT doc_id, i AS bp_idx,
              array_to_string(w[(i*8+1):(i*8+8)], ' ') AS chunk
            FROM t, unnest(range((len(w)+7)//8)) AS u(i)),
      df AS (SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS df
             FROM c GROUP BY 1),
      kept AS (SELECT c.doc_id, c.bp_idx, c.chunk
               FROM c JOIN df ON md5(c.chunk) = df.h WHERE df.df <= 2),
      re AS (SELECT doc_id,
                    string_agg(chunk, ' ' ORDER BY bp_idx) AS clean_text,
                    count(*) AS bp_kept
             FROM kept GROUP BY doc_id),
      full_t AS (
        SELECT t.doc_id, (len(t.w)+7)//8 AS n_chunks,
               coalesce(re.clean_text, '') AS clean_text,
               (len(t.w)+7)//8 - coalesce(re.bp_kept, 0) AS n_dropped
        FROM t LEFT JOIN re USING (doc_id))
      SELECT d.source, count(*) AS n_docs,
             CAST(sum(CASE WHEN f.n_dropped > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_docs_cleaned,
             CAST(sum(f.n_dropped) AS BIGINT) AS n_chunks_dropped,
             CAST(sum(('0x' || substr(md5(f.clean_text), 1, 7))::BIGINT)
                  AS BIGINT) AS corpus_checksum
      FROM full_t f JOIN documents d ON f.doc_id = d.doc_id
      GROUP BY d.source"""))

  /** Vocabulary-coverage census — the planning numbers a tokenizer
    * design needs before fixing a vocab size: how much of the corpus
    * token mass the top-10/100/1000 types cover (cumulative counts kept
    * as exact integers), the type count, and the hapax count (types seen
    * once — the long tail a subword tokenizer must absorb).
    *
    * Scale shape: one token explode → one type census (vocab-bounded) →
    * a global rank over the CENSUS only (distinct types, never the
    * corpus — the q_sample_curriculum discipline) → one census-wide
    * aggregate. */
  val vocabCoverage = QueryDef(
    "q_text_vocab_coverage",
    (spark, dir) => {
      val census = Tables(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("n").desc, col("tok"))
      census.withColumn("r", row_number().over(w))
        .agg(
          sum(when(col("r") <= 10, col("n")).otherwise(0L)).as("cum_top10"),
          sum(when(col("r") <= 100, col("n")).otherwise(0L)).as("cum_top100"),
          sum(when(col("r") <= 1000, col("n")).otherwise(0L))
            .as("cum_top1000"),
          sum(col("n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
    },
    Some("""
      WITH census AS (
        SELECT tok, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok),
      ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS r FROM census)
      SELECT CAST(sum(CASE WHEN r <= 10 THEN n ELSE 0 END) AS BIGINT)
               AS cum_top10,
             CAST(sum(CASE WHEN r <= 100 THEN n ELSE 0 END) AS BIGINT)
               AS cum_top100,
             CAST(sum(CASE WHEN r <= 1000 THEN n ELSE 0 END) AS BIGINT)
               AS cum_top1000,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             count(*) AS n_types,
             CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM ranked"""))

  /** Document-level PMI collocation census: which token pairs co-occur in
    * the same document far more often than their independent document
    * frequencies predict — the corpus-analysis primitive behind phrase
    * mining, topic drift monitors, and contamination forensics (an eval
    * set's hallmark term pair spiking in training data is a red flag).
    *
    * PMI = log(N·c_uv / (c_u·c_v)) is quantized to the repo's integer
    * ⌊log2⌋ space: pmi_bits = bitlen(N·c_uv) − bitlen(c_u·c_v) (bitlen =
    * length(bin·), the [[LmScore]] discipline), and the EXACT counts
    * (c_uv, c_u, c_v) ride along so nothing is lost to quantization — all
    * integers, bit-exact in DuckDB.
    *
    * Scale shape: the pair space is the quadratic hazard, and it is capped
    * twice — tokens enter only inside a document-frequency band (floor
    * kills hapax noise, ceiling kills stopword pairs: a token in half the
    * corpus pairs with everything), and pairs form per document from the
    * df-banded DISTINCT token set via one self-equi-join on doc_id. Cost
    * is Σ_doc |banded(doc)|², bounded by the band — never corpus². At
    * 100 TB the band is enforced by one vocab-bounded broadcast. */
  val pmiPairs = QueryDef(
    "q_text_pmi",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val docTok = docs
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 4).distinct()
      val df = docTok.groupBy(col("tok"))
        .agg(count(lit(1)).as("c_tok"))
        .filter(col("c_tok").between(20, 2000))
      val banded = docTok.join(broadcast(df), "tok")
      val a = banded.select(col("doc_id"), col("tok").as("tok_a"),
        col("c_tok").as("c_a"))
      val b = banded.select(col("doc_id"), col("tok").as("tok_b"),
        col("c_tok").as("c_b"))
      a.join(b, "doc_id").filter(col("tok_a") < col("tok_b"))
        .groupBy(col("tok_a"), col("tok_b"), col("c_a"), col("c_b"))
        .agg(count(lit(1)).as("c_ab"))
        .crossJoin(broadcast(n))
        .withColumn("pmi_bits",
          (length(bin(col("n_docs") * col("c_ab"))) -
            length(bin(col("c_a") * col("c_b")))).cast("long"))
        .filter(col("c_ab") >= 10)
        .orderBy(col("pmi_bits").desc, col("c_ab").desc,
          col("tok_a"), col("tok_b"))
        .limit(25)
        .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"),
          col("c_b"), col("pmi_bits"))
    },
    Some("""
      WITH dt AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE length(tok) >= 4),
      df AS (
        SELECT tok, count(*) AS c_tok FROM dt GROUP BY tok
        HAVING count(*) BETWEEN 20 AND 2000),
      banded AS (SELECT dt.doc_id, dt.tok, df.c_tok
                 FROM dt JOIN df USING (tok)),
      pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, a.c_tok AS c_a,
               b.c_tok AS c_b, count(*) AS c_ab
        FROM banded a JOIN banded b ON a.doc_id = b.doc_id
        WHERE a.tok < b.tok
        GROUP BY 1, 2, 3, 4)
      SELECT tok_a, tok_b, c_ab, CAST(c_a AS BIGINT) AS c_a,
             CAST(c_b AS BIGINT) AS c_b,
             CAST(length(bin((SELECT count(DISTINCT doc_id) FROM documents)
                 * c_ab)) - length(bin(c_a * c_b)) AS BIGINT) AS pmi_bits
      FROM pairs
      WHERE c_ab >= 10
      ORDER BY pmi_bits DESC, c_ab DESC, tok_a, tok_b LIMIT 25"""))

  /** Per-document NOVELTY score: the fraction (exact per-mille) of a
    * document's distinct word bigrams that no earlier document (by
    * ingestion order = doc_id) contains — the "does this doc add anything"
    * signal a curation loop uses to stop ingesting a source whose marginal
    * novelty has collapsed, and the deduped-corpus complement to pairwise
    * near-dup: a doc can be 0-novel without any single near-duplicate.
    *
    * Scale shape: one bigram explode → min(doc_id) per gram (the gram's
    * FIRST bearer — a map-combine aggregate, gram-vocabulary-bounded out)
    * → join back on the gram → per-doc ratio. No pairwise anything: the
    * "compare against all earlier docs" semantics collapses into the
    * first-bearer aggregate. */
  val novelty = QueryDef(
    "q_text_novelty",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      // size >= 2 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather
      // than returning empty, so a single-token doc would index gram 0
      // per-doc gram dedup happens MAP-SIDE (array_distinct inside the
      // row) — round 7 shuffled every (doc_id, gram) pair through a
      // corpus-sized DISTINCT and then joined corpus×vocab back, the 3.6x
      // gate drift; now the only corpus-sized stage is a pure map, the
      // first-bearer aggregate ships ≤vocab rows per partition (map-side
      // partial min), and the one join left is docs-sized on the doc id.
      // zip_with over two slices, NOT transform(i -> element_at(split…)):
      // a split() inside a lambda re-tokenizes the document once PER
      // ELEMENT (loop-invariant expressions aren't hoisted out of
      // higher-order functions), turning the map stage O(len²) — the
      // slice spelling keeps split() at projection level where
      // subexpression elimination runs it once per row (measured 8x on
      // the map stage at 100x)
      val dedupGrams = expr(
        """array_distinct(zip_with(
             slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
             slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
             (a, b) -> concat(a, ' ', b)))""")
      val withGrams = docs
        .filter(size(split(col("text"), " ")) >= 2)
        .select(col("doc_id"), dedupGrams.as("grams"))
        // persisted: the gram-array build is the expensive map stage and
        // BOTH consumers (first-bearer explode, per-doc size) need it;
        // released by the runner's per-query clearCache
        .persist()
      val firstBearer = withGrams
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .groupBy(col("gram"))
        .agg(min(col("doc_id")).as("first_doc"))
      val perDoc = withGrams
        .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      val novelPerDoc = firstBearer
        .groupBy(col("first_doc")).agg(count(lit(1)).as("n_novel"))
      perDoc.join(novelPerDoc, col("doc_id") === col("first_doc"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
        .withColumn("novelty_permille",
          expr("1000 * n_novel DIV n_grams"))
        .orderBy(col("novelty_permille"), col("doc_id"))
        .limit(100)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      grams AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i + 1] AS gram
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
      fb AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
      SELECT doc_id, n_grams, n_novel,
             CAST(1000 * n_novel // n_grams AS BIGINT) AS novelty_permille
      FROM (
        SELECT g.doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN fb.first_doc = g.doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_novel
        FROM grams g JOIN fb USING (gram)
        GROUP BY g.doc_id)
      ORDER BY novelty_permille, doc_id LIMIT 100"""))

  /** Cross-epoch vocabulary churn: tokens BORN (first seen) and RETIRED
    * (last seen) in each half of the corpus by ingestion order — the
    * vocabulary-level companion to [[graft.operators.Profiling.driftReport]]
    * (value drift can be flat while the vocabulary silently rotates).
    * One explode → one (token) aggregate carrying min/max bearer and
    * per-epoch counts; churn falls out of the vocab-bounded frame. */
  val vocabChurn = QueryDef(
    "q_text_vocab_churn",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val n = docs.agg(max(col("doc_id")).as("max_id"))
      val tok = docs.crossJoin(broadcast(n))
        .select(col("lang"), (col("doc_id") * 2 <= col("max_id"))
          .as("early"), explode(toks(col("text"))).as("w"))
        .filter(length(col("w")) >= 3)
      tok.groupBy(col("lang"), col("w"))
        .agg(max(when(col("early"), 1L).otherwise(0L)).as("in_a"),
          max(when(!col("early"), 1L).otherwise(0L)).as("in_b"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("in_a") === 1L && col("in_b") === 0L, 1L)
            .otherwise(0L)).as("n_retired"),
          sum(when(col("in_a") === 0L && col("in_b") === 1L, 1L)
            .otherwise(0L)).as("n_born"),
          sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
            .otherwise(0L)).as("n_stable"))
    },
    Some("""
      WITH tok AS (
        SELECT lang,
               doc_id * 2 <= (SELECT max(doc_id) FROM documents) AS early,
               unnest(string_split(text, ' ')) AS w
        FROM documents),
      tt AS (
        SELECT lang, w,
               max(CASE WHEN early THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN NOT early THEN 1 ELSE 0 END) AS in_b
        FROM tok WHERE length(w) >= 3 GROUP BY lang, w)
      SELECT lang, count(*) AS n_types,
             CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retired,
             CAST(sum(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_born,
             CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_stable
      FROM tt GROUP BY lang"""))

  val all: Seq[QueryDef] =
    Seq(tokenCount, quality, langId, fingerprint, freqTokens,
      freqTokensExact, gopherBattery, kmvOverlap, kmvOverlapExact,
      diversity, boilerplate, pii, vocabCoverage, pmiPairs, novelty,
      vocabChurn, redact, stitch)
}
