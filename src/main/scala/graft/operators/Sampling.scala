package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus splitting / sampling / scrubbing — the remaining table-stakes ops
  * of a training-data pipeline (no reference counterpart; the reference's
  * unit is relational batches). All three are DETERMINISTIC — driven by
  * content hashes, not engine RNG — which is (a) what a real pipeline wants
  * (splits must be reproducible and leakage-free across reruns and engines)
  * and (b) what makes a bit-exact DuckDB oracle possible.
  *
  * 100 TB shapes: hash-split is a pure map + bounded aggregate (no
  * shuffle of the corpus, only of the tiny count matrix); stratified
  * sampling is one shuffle on the stratum key + per-partition top-k;
  * scrubbing is a pure codegen map stage.
  */
object Sampling {

  private val hexNibbles = "0123456789abcdef".map(_.toString)

  /** Library API: deterministic content-keyed train/val/test assignment —
    * the first hex nibble of md5(content) buckets each row
    * (`trainNibbles`/16 → train, `valNibbles`/16 → val, rest → test).
    * Content-keyed means exact duplicates always land in the same split
    * (no train/test leakage) and the assignment is stable across engines,
    * reruns, and repartitioning. Pure map stage — no shuffle. */
  def withHashSplit(
      df: org.apache.spark.sql.DataFrame,
      contentCol: String, splitCol: String = "split",
      trainNibbles: Int = 12, valNibbles: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    require(trainNibbles + valNibbles < 16, "need at least one test nibble")
    val nib = substring(md5(col(contentCol).cast("binary")), 1, 1)
    df.withColumn(splitCol,
      when(nib.isin(hexNibbles.take(trainNibbles): _*), "train")
        .when(nib.isin(
          hexNibbles.slice(trainNibbles, trainNibbles + valNibbles): _*),
          "val")
        .otherwise("test"))
  }

  /** Library API: deterministic stratified quota sample — exactly `n` rows
    * per stratum, chosen in content-hash order (a reproducible stand-in
    * for uniform-random). One shuffle on the stratum key; the rank limit
    * is pushed ahead of the shuffle (WindowGroupLimit). */
  def stratifiedSample(
      df: org.apache.spark.sql.DataFrame,
      stratumCol: String, contentCol: String, tiebreakCol: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(contentCol).cast("binary")), col(tiebreakCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Library API: PII-style scrub column — masks email-shaped tokens then
    * digit runs. Patterns stay in the Java∩RE2 common subset. */
  def scrubbed(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(text, "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>"),
      "[0-9]+", "<NUM>")

  /** Deterministic train/val/test assignment via [[withHashSplit]]
    * (12/16 train, 2/16 val, 2/16 test), summarized per (split, lang). */
  val hashSplit = QueryDef(
    "q_sample_hash_split",
    (spark, dir) => {
      withHashSplit(Tables(spark, dir, "documents"), "text")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
    },
    Some("""
      SELECT split, lang, count(*) AS n_docs
      FROM (SELECT lang, CASE
              WHEN substring(md5(text), 1, 1) IN
                ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
              WHEN substring(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
              ELSE 'test' END AS split
            FROM documents)
      GROUP BY split, lang"""))

  /** Stratified quota sample: exactly N docs per language, chosen in
    * content-hash order (a deterministic stand-in for uniform-random that
    * both engines reproduce). One shuffle on the stratum key; the window
    * top-k never materializes more than the quota per stratum downstream. */
  val stratified = QueryDef(
    "q_sample_stratified",
    (spark, dir) => {
      stratifiedSample(
        Tables(spark, dir, "documents"), "lang", "text", "doc_id", 20)
        .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
    },
    Some("""
      SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
      FROM (SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(text), doc_id) AS rn
            FROM documents)
      WHERE rn <= 20"""))

  /** PII-style scrubbing pass: mask digit runs and email-shaped tokens,
    * report per-doc masked-token counts + scrubbed length. Patterns stay in
    * the Java∩RE2 common subset so Spark and DuckDB agree byte-for-byte.
    * (DuckDB needs the 'g' flag for replace-all; Spark replaces all by
    * default — hence the dialect-split oracle.) */
  val scrub = QueryDef(
    "q_text_scrub",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("doc_id"), scrubbed(col("text")).as("scrubbed"))
        .select(
          col("doc_id"),
          length(col("scrubbed")).cast("long").as("scrubbed_len"),
          ((length(col("scrubbed")) -
            length(regexp_replace(col("scrubbed"), "<NUM>", ""))) / 5)
            .cast("long").as("n_nums"),
          ((length(col("scrubbed")) -
            length(regexp_replace(col("scrubbed"), "<EMAIL>", ""))) / 7)
            .cast("long").as("n_emails"))
    },
    Some("""
      SELECT doc_id,
             CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
             CAST((length(scrubbed) -
                   length(replace(scrubbed, '<NUM>', ''))) / 5 AS BIGINT)
               AS n_nums,
             CAST((length(scrubbed) -
                   length(replace(scrubbed, '<EMAIL>', ''))) / 7 AS BIGINT)
               AS n_emails
      FROM (SELECT doc_id,
                   regexp_replace(
                     regexp_replace(text,
                       '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
                     '[0-9]+', '<NUM>', 'g') AS scrubbed
            FROM documents)"""))

  /** Sequence packing for context windows: assign documents to ~2048-token
    * packs by running-total bucketing within each language, in
    * deterministic content-hash order. This is the standard pre-training
    * "pack short docs into fixed windows" pass: one shuffle on the
    * partition key, a cumulative window, and a bounded per-pack aggregate.
    * Token count is the whitespace approximation spelled portably
    * (`length − length(replace(' '))+1` runs identically in both engines);
    * a pack overshoots 2048 by at most one document, matching greedy
    * sequential packing. */
  val packSequences = QueryDef.sqlSame(
    "q_pack_sequences",
    """WITH toks AS (
         SELECT doc_id, lang,
                CAST(length(text) - length(replace(text, ' ', '')) + 1
                     AS BIGINT) AS n_tokens,
                md5(text) AS h
         FROM documents),
       packed AS (
         SELECT doc_id, lang, n_tokens,
                CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                       ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                     / 2048) AS BIGINT) AS pack_id
         FROM toks)
       SELECT lang, pack_id, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
       FROM packed GROUP BY lang, pack_id""")

  /** Library API: deterministic domain-mixture sampling — per-group keep
    * rates at 1/65536 resolution via a content-keyed md5-prefix compare
    * (lexicographic on fixed-width lowercase hex == numeric). The standard
    * "mix domains to target weights" pre-training pass, as a PURE MAP
    * stage: no shuffle, no RNG state, reproducible across runs, engines,
    * and repartitioning; exact duplicates always sample identically, so
    * mixing cannot re-introduce train/test leakage. Groups without a rate
    * are dropped (explicit mixture spec). */
  def mixByWeights(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String, rates: Map[String, Double],
      contentCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val prefix = substring(md5(col(contentCol).cast("binary")), 1, 4)
    val keep = rates.foldLeft(lit(false)) { case (acc, (g, r)) =>
      val cond =
        if (r >= 1.0) col(groupCol) === g
        else col(groupCol) === g &&
          prefix < lit(f"${math.round(r * 65536).toInt}%04x")
      acc || cond
    }
    df.filter(keep)
  }

  /** Domain mixture to target weights over the documents corpus: src1 kept
    * whole, src2 half, src3 quarter, src4 an eighth, everything else
    * dropped — kept-doc and token tallies per source. */
  val mixWeights = QueryDef(
    "q_sample_mix",
    (spark, dir) => {
      mixByWeights(Tables(spark, dir, "documents"), "source",
        Map("src1" -> 1.0, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.125))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(size(split(col("text"), " "))).cast("long").as("toks_kept"))
    },
    Some("""
      SELECT source, count(*) AS n_kept,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks_kept
      FROM (SELECT source, text, substring(md5(text), 1, 4) AS p
            FROM documents)
      WHERE source = 'src1'
         OR (source = 'src2' AND p < '8000')
         OR (source = 'src3' AND p < '4000')
         OR (source = 'src4' AND p < '2000')
      GROUP BY source"""))

  val all: Seq[QueryDef] =
    Seq(hashSplit, stratified, scrub, packSequences, mixWeights)
}
