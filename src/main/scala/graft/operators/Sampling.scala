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

  /** Library API: exact per-group quota selection WITHOUT a per-group global
    * sort — the 100 TB-safe form of "keep the `budget(g)` rows smallest by
    * (md5(content), tiebreak) in each group" when group cardinality is low
    * (languages, domains) and a `PARTITION BY group` window would funnel
    * half the corpus through one task:
    *
    *   1. census: count rows per (group, first hash byte) — one partial-agg
    *      shuffle of a ≤ |G|·256-row matrix, never the corpus;
    *   2. running total over each group's 256 buckets (window over the tiny
    *      census) locates the boundary bucket where the quota lands;
    *   3. buckets strictly below the boundary pass whole (AQE size-gated
    *      semi-join, no ranking); ONLY the boundary bucket — ~1/256 of each
    *      group — is ranked, partitioned by (group, bucket) so even that
    *      residual ranking spreads across tasks.
    *
    * Because the bucket key is a prefix of the ordering key, full-buckets +
    * ranked-boundary is exactly the budget smallest rows by (hash, tiebreak)
    * — SamplingSpec pins equivalence with the window formulation. */
  def quotaSelect(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String, contentCol: String, tiebreakCol: String,
      budgets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val withH = df
      .withColumn("qs_h", md5(col(contentCol).cast("binary")))
      .withColumn("qs_b", substring(col("qs_h"), 1, 2))
    val census = withH.groupBy(col(groupCol), col("qs_b"))
      .agg(count(lit(1)).as("qs_n"))
    val wcum = Window.partitionBy(col(groupCol)).orderBy(col("qs_b"))
    val info = census
      .withColumn("qs_cum", sum(col("qs_n")).over(wcum))
      .join(budgets, groupCol)
      .withColumn("qs_prev", col("qs_cum") - col("qs_n"))
      .filter(col("qs_prev") < col("budget")) // buckets past the quota vanish
      .withColumn("qs_rem", // null = bucket passes whole, else rank limit
        when(col("qs_cum") <= col("budget"), lit(null).cast("long"))
          .otherwise(col("budget") - col("qs_prev")))
      .select(col(groupCol), col("qs_b"), col("qs_rem"))
      // ≤ |G|·256 rows, consumed by BOTH union branches below — without
      // this the whole-corpus census aggregate re-runs per branch (plan-
      // signature showed the census subtree twice). Released by the
      // runner's per-query clearCache, like every persisted intermediate.
      .persist()
    // No broadcast() hint: for the intended low-cardinality groups
    // (language, domain) AQE size-gates this join to a broadcast on its
    // own, while a high-|G| caller (URL host, user id) degrades to a
    // shuffle join on (group, qs_b) — which already matches the census
    // shuffle — instead of a driver OOM.
    val joined = withH.join(info, Seq(groupCol, "qs_b"))
    val wb = Window.partitionBy(col(groupCol), col("qs_b"))
      .orderBy(col("qs_h"), col(tiebreakCol))
    val partial = joined.filter(col("qs_rem").isNotNull)
      .withColumn("qs_rn", row_number().over(wb))
      .filter(col("qs_rn") <= col("qs_rem"))
      .drop("qs_rn")
    joined.filter(col("qs_rem").isNull).unionByName(partial)
      .drop("qs_h", "qs_b", "qs_rem")
  }

  /** Library API: TOKEN-weighted quota selection — [[quotaSelect]]'s
    * sibling where the budget caps the summed `tokensCol` per group
    * rather than the document count (the unit a pre-training mixture is
    * actually specified in: "X billion tokens of web, Y of code").
    * Selection is the maximal prefix in content-hash order whose running
    * token sum fits the budget, so kept tokens ≤ budget with at most one
    * straddling document's worth of slack, deterministically.
    *
    * Same 100 TB shape as quotaSelect: a 256-bucket census (now summing
    * tokens), running totals over the tiny census, whole buckets pass
    * unranked, and ONLY the boundary bucket pays a ranked running-sum
    * window — never a per-group sort of the corpus. */
  def tokenQuotaSelect(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String, contentCol: String, tiebreakCol: String,
      tokensCol: String,
      budgets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val withH = df
      .withColumn("tq_h", md5(col(contentCol).cast("binary")))
      .withColumn("tq_b", substring(col("tq_h"), 1, 2))
    val census = withH.groupBy(col(groupCol), col("tq_b"))
      .agg(sum(col(tokensCol)).as("tq_n"))
    val wcum = Window.partitionBy(col(groupCol)).orderBy(col("tq_b"))
    val info = census
      .withColumn("tq_cum", sum(col("tq_n")).over(wcum))
      .join(budgets, groupCol)
      .withColumn("tq_prev", col("tq_cum") - col("tq_n"))
      .filter(col("tq_prev") < col("budget"))
      .withColumn("tq_rem", // null = bucket passes whole, else token limit
        when(col("tq_cum") <= col("budget"), lit(null).cast("long"))
          .otherwise(col("budget") - col("tq_prev")))
      .select(col(groupCol), col("tq_b"), col("tq_rem"))
      .persist() // ≤ |G|·256 rows, read by both union branches
    // Unhinted like quotaSelect: AQE broadcasts the tiny census join for
    // low-|G| groups and falls back to the matching (group, tq_b) shuffle
    // for high-cardinality group columns rather than OOMing the driver.
    val joined = withH.join(info, Seq(groupCol, "tq_b"))
    val wb = Window.partitionBy(col(groupCol), col("tq_b"))
      .orderBy(col("tq_h"), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partial = joined.filter(col("tq_rem").isNotNull)
      .withColumn("tq_rcum", sum(col(tokensCol)).over(wb))
      .filter(col("tq_rcum") <= col("tq_rem"))
      .drop("tq_rcum")
    joined.filter(col("tq_rem").isNull).unionByName(partial)
      .drop("tq_h", "tq_b", "tq_rem")
  }

  /** Token-budget mixture over the corpus: each language capped at 50% of
    * its total whitespace tokens (en tighter at 25%) via
    * [[tokenQuotaSelect]] — the audit row pins kept docs, kept tokens,
    * the budget, and an id-checksum of exactly which documents made the
    * cut; the DuckDB oracle replays the census, the boundary-bucket
    * running sum, and the prefix rule end to end. */
  val tokenBudget = QueryDef(
    "q_sample_token_budget",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .withColumn("n_toks",
          (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
            + 1).cast("long"))
      val budgets = docs.groupBy(col("lang"))
        .agg(sum(col("n_toks")).as("tot"))
        .select(col("lang"),
          when(col("lang") === "en", expr("tot DIV 4"))
            .otherwise(expr("tot DIV 2")).as("budget"))
      tokenQuotaSelect(docs, "lang", "text", "doc_id", "n_toks", budgets)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_toks")).as("tokens_kept"),
          sum(col("doc_id") * col("doc_id")).as("id_checksum"))
        .join(budgets, "lang")
        .select(col("lang"), col("n_docs_kept"), col("tokens_kept"),
          col("budget"), col("id_checksum"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, text,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_toks,
               md5(text) AS h, substr(md5(text), 1, 2) AS b
        FROM documents),
      budgets AS (
        SELECT lang,
               CASE WHEN lang = 'en' THEN CAST(sum(n_toks) AS BIGINT) // 4
                    ELSE CAST(sum(n_toks) AS BIGINT) // 2 END AS budget
        FROM t GROUP BY lang),
      census AS (
        SELECT lang, b, CAST(sum(n_toks) AS BIGINT) AS n
        FROM t GROUP BY 1, 2),
      info AS (
        SELECT c.lang, c.b, g.budget,
               sum(c.n) OVER (PARTITION BY c.lang ORDER BY c.b) AS cum,
               sum(c.n) OVER (PARTITION BY c.lang ORDER BY c.b) - c.n
                 AS prev
        FROM census c JOIN budgets g USING (lang)),
      gate AS (
        SELECT lang, b,
               CASE WHEN cum <= budget THEN NULL
                    ELSE budget - prev END AS rem
        FROM info WHERE prev < budget),
      sel AS (
        SELECT t.lang, t.doc_id, t.n_toks
        FROM t JOIN gate USING (lang, b) WHERE gate.rem IS NULL
        UNION ALL
        SELECT lang, doc_id, n_toks FROM (
          SELECT t.lang, t.doc_id, t.n_toks, gate.rem,
                 sum(t.n_toks) OVER (PARTITION BY t.lang, t.b
                   ORDER BY t.h, t.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS rcum
          FROM t JOIN gate USING (lang, b) WHERE gate.rem IS NOT NULL)
        WHERE rcum <= rem)
      SELECT s.lang, count(*) AS n_docs_kept,
             CAST(sum(s.n_toks) AS BIGINT) AS tokens_kept, g.budget,
             CAST(sum(s.doc_id * s.doc_id) AS BIGINT) AS id_checksum
      FROM sel s JOIN budgets g ON s.lang = g.lang
      GROUP BY s.lang, g.budget"""))

  /** Library API: curriculum sharding — assign each document a shard
    * 0..nShards−1 by GLOBAL quantile of an integer difficulty score
    * (easy→hard ordered training epochs), without ever sorting the
    * corpus: a census of (score → count), cumulative totals over the
    * census, shard = ⌊prev_cum · nShards / total⌋ (capped), then one
    * broadcast join of the tiny score→shard map back onto the corpus.
    * Equal scores always land in the same shard, so the assignment is
    * stable under repartitioning and re-runs.
    *
    * `scoreCol` must be a bounded-domain integer score (milli-bits,
    * milli-avg-token-length, length buckets…) — the census and its
    * single-partition cumulative window are score-domain-sized, NEVER
    * corpus-sized; the corpus itself only pays a map-side join. */
  def curriculumShards(df: org.apache.spark.sql.DataFrame,
      scoreCol: String, nShards: Int): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1)
    val census = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("cs_n"))
    val w = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = census.agg(sum(col("cs_n")).as("cs_tot"))
    val shardMap = census
      .withColumn("cs_cum", sum(col("cs_n")).over(w))
      .crossJoin(broadcast(tot))
      .select(col(scoreCol),
        least(lit(nShards - 1L),
          expr(s"(cs_cum - cs_n) * $nShards DIV cs_tot")).as("shard"))
    df.join(broadcast(shardMap), scoreCol)
  }

  /** Curriculum over the corpus: difficulty = average token length in
    * milli-chars (an integer proxy any engine reproduces), four shards
    * easy→hard; audit per shard pins sizes, the score range, and an
    * id-checksum of the exact membership against the DuckDB census
    * replay. */
  val curriculum = QueryDef(
    "q_sample_curriculum",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .withColumn("n_toks",
          (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
            + 1).cast("long"))
        .withColumn("difficulty",
          expr("n_chars * 1000 DIV n_toks"))
      curriculumShards(docs, "difficulty", 4)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("difficulty")).as("min_score"),
          max(col("difficulty")).as("max_score"),
          sum(col("doc_id") * col("doc_id")).as("id_checksum"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               n_chars * 1000 //
                 CAST(length(text) - length(replace(text, ' ', '')) + 1
                      AS BIGINT) AS difficulty
        FROM documents),
      census AS (
        SELECT difficulty, count(*) AS n FROM t GROUP BY difficulty),
      m AS (
        SELECT difficulty,
               CAST(least(3, (sum(n) OVER (ORDER BY difficulty) - n) * 4
                        // (SELECT CAST(sum(n) AS BIGINT) FROM census))
                 AS BIGINT) AS shard
        FROM census)
      SELECT m.shard, count(*) AS n_docs,
             min(t.difficulty) AS min_score,
             max(t.difficulty) AS max_score,
             CAST(sum(t.doc_id * t.doc_id) AS BIGINT) AS id_checksum
      FROM t JOIN m USING (difficulty)
      GROUP BY m.shard"""))

  /** UniMax-style temperature rebalancing (public recipe: budget each
    * language by n^alpha rather than n, so head languages stop drowning the
    * tail; alpha = 0.5 here). All-integer budget arithmetic keeps it
    * oracle-exact: s_l = floor(sqrt(n_l)) (IEEE sqrt is correctly rounded,
    * so the floor is engine-identical), T = 60% of the corpus, and
    * b_l = min(n_l, T·s_l div Σs). Selection is [[quotaSelect]] — exact
    * quotas with no per-language sort. Output: per-language audit row. */
  val unimax = QueryDef(
    "q_sample_unimax",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val counts = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_orig"))
        .withColumn("qs_s", floor(sqrt(col("n_orig"))).cast("long"))
      val tot = counts.agg(sum(col("qs_s")).as("qs_ss"),
        sum(col("n_orig")).as("qs_tot"))
      val budgets = counts.crossJoin(broadcast(tot))
        .withColumn("budget",
          least(col("n_orig"), expr("((qs_tot * 6) div 10) * qs_s div qs_ss")))
        .select(col("lang"), col("n_orig"), col("budget"))
        // |langs| rows, read by quotaSelect AND the final audit join —
        // persisting saves a per-consumer corpus count aggregate
        .persist()
      quotaSelect(docs, "lang", "text", "doc_id",
        budgets.select(col("lang"), col("budget")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(size(split(col("text"), " "))).cast("long").as("toks_kept"))
        .join(budgets, "lang")
        .select(col("lang"), col("n_orig"), col("budget"),
          col("n_kept"), col("toks_kept"))
    },
    Some("""
      WITH counts AS (
        SELECT lang, count(*) AS n_orig,
               CAST(floor(sqrt(count(*))) AS BIGINT) AS s
        FROM documents GROUP BY lang),
      tot AS (SELECT CAST(sum(s) AS BIGINT) AS ss,
                     CAST(sum(n_orig) AS BIGINT) AS tot FROM counts),
      budgets AS (
        SELECT lang, n_orig,
               least(n_orig, ((tot * 6) // 10) * s // ss) AS budget
        FROM counts, tot),
      ranked AS (
        SELECT lang, text,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents)
      SELECT b.lang, b.n_orig, b.budget,
             count(*) AS n_kept,
             CAST(sum(len(str_split(r.text, ' '))) AS BIGINT) AS toks_kept
      FROM ranked r JOIN budgets b ON r.lang = b.lang AND r.rn <= b.budget
      GROUP BY b.lang, b.n_orig, b.budget"""))

  /** Deterministic epoch shuffle — the "randomize training order,
    * reproducibly" op every run of every epoch needs: an epoch-salted
    * content hash gives each doc a position key; the first two hex nibbles
    * route it to a shard (pure map, ONE hash-partition shuffle, no global
    * sort); within a shard docs are sequenced by the full hash. Shard
    * count is a parameter — 8 here for the fixture; at 100 TB you set it
    * to corpus/shard-file-size so the within-shard sorts stay bounded and
    * parallel. The order-pin column (Σ position·doc_id per shard) makes
    * the within-shard SEQUENCE part of the oracle contract, not just
    * membership. */
  val epochShards = QueryDef(
    "q_sample_epoch_shards",
    (spark, dir) => {
      val nShards = 8
      val hx = "0123456789abcdef"
      val docs = Tables(spark, dir, "documents")
      val withH = docs.select(col("doc_id"), col("text"),
        md5(concat(lit("epoch1:"), col("text")).cast("binary")).as("h"))
        .withColumn("shard",
          expr(s"((instr('$hx', substring(h, 1, 1)) - 1) * 16 + " +
            s"(instr('$hx', substring(h, 2, 1)) - 1)) % $nShards"))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      withH.withColumn("pos", row_number().over(w))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("toks"),
          sum(col("pos") * col("doc_id")).as("order_pin"),
          min(col("h")).as("h_first"), max(col("h")).as("h_last"))
    },
    Some("""
      WITH withh AS (
        SELECT doc_id, text, md5('epoch1:' || text) AS h FROM documents),
      sharded AS (
        SELECT doc_id, text, h,
               ((strpos('0123456789abcdef', h[1:1]) - 1) * 16 +
                (strpos('0123456789abcdef', h[2:2]) - 1)) % 8 AS shard
        FROM withh),
      pos AS (
        SELECT shard, doc_id, text, h,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY h, doc_id) AS pos
        FROM sharded)
      SELECT shard, count(*) AS n_docs,
             CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS toks,
             CAST(sum(pos * doc_id) AS BIGINT) AS order_pin,
             min(h) AS h_first, max(h) AS h_last
      FROM pos GROUP BY shard"""))

  /** Library API: DSIR-style importance resampling (Data Selection via
    * Importance Resampling, Xie et al. 2023 — the public recipe for "pick
    * web documents that look like the curated target corpus"): every pool
    * document scores log p_target(doc) − log p_raw(doc) under two unigram
    * models, and selection takes the most target-like. In the repo's
    * integer-bits quantization (same ⌊log2⌋-on-exact-counts arithmetic as
    * [[LmScore]]): weight(doc) = Σ_tokens [bits_raw(w) − bits_tgt(w)],
    * bits_m(w) = bitlen(N_m) − bitlen(max(n_m(w), 1)) with unseen-as-1
    * smoothing — deterministic, engine-replayable, no libm.
    *
    * Scale shape (100 TB): pool tokens explode ONCE; both models are
    * vocab-bounded (never corpus-sized) token-count aggregates; scoring is
    * two hash joins on the token key against those tables and one per-doc
    * sum. No all-pairs, no window over the corpus; compose with
    * [[quotaSelect]] for per-language exact quotas instead of the global
    * top-k when budgets are per-group. */
  def dsirWeights(pool: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    def model(df: org.apache.spark.sql.DataFrame, n: String) =
      toks(df).groupBy(col("w")).agg(count(lit(1)).as(n))
    // vocab-bounded model tables, each consumed twice (its total + the
    // scoring join) — persist() so each corpus explode+count runs ONCE
    // (without it the plan re-explodes the corpus per consumer; same
    // lesson as LmScore's bigram table)
    val raw = model(pool, "n_raw").persist()
    val tgt = model(target, "n_tgt").persist()
    // 1-row totals fan onto the vocab-bounded model join (the same
    // broadcast-stats pattern as nbClassify's class table)
    val totals = raw.agg(sum(col("n_raw")).as("nn_raw"))
      .crossJoin(tgt.agg(sum(col("n_tgt")).as("nn_tgt")))
    val scoredToks = toks(pool)
      .join(raw, Seq("w"), "left")
      .join(tgt, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        ((length(bin(col("nn_raw"))) -
          length(bin(coalesce(col("n_raw"), lit(1L))))) -
         (length(bin(col("nn_tgt"))) -
          length(bin(coalesce(col("n_tgt"), lit(1L))))))
          .cast("long").as("tok_bits"))
    scoredToks.groupBy(col(idCol))
      .agg(sum(col("tok_bits")).as("weight_bits"),
        count(lit(1)).as("n_tokens"))
  }

  /** DSIR selection over the fixture: target = the "curated" source tier
    * (src0–src9, the 4-char names), pool = the web tier; the 50 most
    * target-like pool docs by (weight DESC, doc_id) — a global top-k
    * (TakeOrderedAndProject), never a full sort. The DuckDB oracle replays
    * models, smoothing, weights, and the tie-broken top-k end to end. */
  val dsir = QueryDef(
    "q_sample_dsir",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val pool = docs.filter(length(col("source")) =!= 4)
      val target = docs.filter(length(col("source")) === 4)
      dsirWeights(pool, target)
        .orderBy(col("weight_bits").desc, col("doc_id"))
        .limit(50)
    },
    Some("""
      WITH pool AS (
        SELECT * FROM documents WHERE length(source) <> 4),
      tgt AS (
        SELECT * FROM documents WHERE length(source) = 4),
      ptoks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM pool),
      raw_m AS (
        SELECT w, count(*) AS n_raw FROM ptoks GROUP BY 1),
      tgt_m AS (
        SELECT w, count(*) AS n_tgt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM tgt)
        GROUP BY 1),
      tot AS (
        SELECT (SELECT CAST(sum(n_raw) AS BIGINT) FROM raw_m) AS nn_raw,
               (SELECT CAST(sum(n_tgt) AS BIGINT) FROM tgt_m) AS nn_tgt),
      scored AS (
        SELECT p.doc_id,
               CAST(sum((length(bin(t.nn_raw))
                         - length(bin(coalesce(r.n_raw, 1))))
                      - (length(bin(t.nn_tgt))
                         - length(bin(coalesce(g.n_tgt, 1)))))
                    AS BIGINT) AS weight_bits,
               count(*) AS n_tokens
        FROM ptoks p
        LEFT JOIN raw_m r ON p.w = r.w
        LEFT JOIN tgt_m g ON p.w = g.w
        CROSS JOIN tot t
        GROUP BY p.doc_id)
      SELECT doc_id, weight_bits, n_tokens
      FROM scored
      ORDER BY weight_bits DESC, doc_id
      LIMIT 50"""))

  /** Library API: exact-budget mixture construction with OVERSAMPLING —
    * the GPT-3-style epoch mix, where high-quality tiers repeat (Wikipedia
    * ×3.4 epochs in the published mixture) while web tiers subsample. For
    * each group with n docs and budget b: every doc gets ⌊b/n⌋ base
    * copies, and exactly b mod n docs — chosen deterministically in
    * content-hash order via [[quotaSelect]], never a whole-group sort —
    * get one extra, so the output hits b EXACTLY per group. b < n
    * degenerates to exact subsampling (base 0, remainder b), b = n to
    * identity, so this one primitive subsumes keep-rate mixing with exact
    * instead of expected counts. Returns the input columns plus `copy_n`
    * (1-based copy index).
    *
    * Scale shape: one tiny census aggregate, quotaSelect's bucketed
    * remainder selection, one id-keyed membership join, then the
    * output-sized explode — nothing shuffles more than once and no group
    * ever funnels through a single task. */
  def oversampleMix(df: org.apache.spark.sql.DataFrame,
      groupCol: String, contentCol: String, tiebreakCol: String,
      budgets: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("os_n"))
    val factors = budgets.join(counts, groupCol)
      .select(col(groupCol), col("budget"),
        expr("budget DIV os_n").as("os_base"),
        (col("budget") % col("os_n")).as("os_rem"))
    // Extras membership is keyed on (group, tiebreak), not tiebreak alone:
    // a tiebreak value repeated in another group must not inherit (or fan
    // out) this group's remainder slot.
    val extras = quotaSelect(df, groupCol, contentCol, tiebreakCol,
        factors.select(col(groupCol), col("os_rem").as("budget")))
      .select(col(groupCol), col(tiebreakCol)).withColumn("os_extra", lit(1L))
    df.join(broadcast(factors.drop("budget")), groupCol)
      .join(extras, Seq(groupCol, tiebreakCol), "left")
      .withColumn("os_copies",
        col("os_base") + coalesce(col("os_extra"), lit(0L)))
      .filter(col("os_copies") > 0)
      .withColumn("copy_n",
        explode(sequence(lit(1L), col("os_copies"))))
      .drop("os_base", "os_rem", "os_extra", "os_copies")
  }

  /** Oversampling mix over the fixture: per-language budgets spanning
    * every regime — en subsamples to n/2, zh oversamples to 3n+7 (base 3
    * copies, 7 extras), de keeps exactly n, es drops to 0, fr doubles.
    * Reduced to the per-language census with an id·copy weighted checksum
    * that pins the full output multiset (which docs, how many copies
    * each); the DuckDB oracle replays the census, the hash-order remainder
    * ranking, and the replication end to end. */
  val oversample = QueryDef(
    "q_sample_oversample",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val budgets = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .select(col("lang"),
          when(col("lang") === "en", expr("n DIV 2"))
            .when(col("lang") === "zh", col("n") * 3 + 7)
            .when(col("lang") === "de", col("n"))
            .when(col("lang") === "es", lit(0L))
            .otherwise(col("n") * 2).as("budget"))
      oversampleMix(docs, "lang", "text", "doc_id", budgets)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_out"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id") * col("copy_n")).as("id_copy_sum"))
    },
    Some("""
      WITH c AS (
        SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      b AS (
        SELECT lang, n,
               CASE lang WHEN 'en' THEN n // 2
                         WHEN 'zh' THEN n * 3 + 7
                         WHEN 'de' THEN n
                         WHEN 'es' THEN 0
                         ELSE n * 2 END AS budget
        FROM c),
      r AS (
        SELECT d.lang, d.doc_id,
               b.budget // b.n AS base, b.budget % b.n AS rem,
               row_number() OVER (PARTITION BY d.lang
                                  ORDER BY md5(d.text), d.doc_id) AS rk
        FROM documents d JOIN b USING (lang)),
      copies AS (
        SELECT lang, doc_id,
               base + (CASE WHEN rk <= rem THEN 1 ELSE 0 END) AS n_copies
        FROM r),
      out AS (
        SELECT lang, doc_id, u.i AS copy_n
        FROM copies, unnest(range(1, n_copies + 1)) AS u(i)
        WHERE n_copies > 0)
      SELECT lang, count(*) AS n_out,
             count(DISTINCT doc_id) AS n_docs,
             CAST(sum(doc_id * copy_n) AS BIGINT) AS id_copy_sum
      FROM out GROUP BY 1"""))

  /** Library API: near-dup-LEAKAGE-SAFE train/val/test split. The naive
    * content-hash split ([[withHashSplit]]) puts two near-duplicate
    * documents in different splits ~37% of the time (independent hashes) —
    * test-set leakage, the exact failure benchmark decontamination exists
    * to catch. Here every near-dup CLUSTER splits as a unit: deterministic
    * n-gram Jaccard pairs ([[Dedup.ngramJaccardPairs]], ≥ `threshold`) →
    * connected components ([[Dedup.componentLabels]]) → every member keys
    * its split off the cluster REPRESENTATIVE's content (min-id member),
    * singletons off their own. Same 12/2/2 nibble rule as the naive split,
    * so ratios are preserved; co-assignment becomes structural.
    *
    * Scale shape: the pair/CC stages are the curation pipeline's (blocked
    * candidates, pointer-jumping CC — run AFTER exact dedup); the rep-text
    * lookup is one id-keyed join; the split itself stays a map. */
  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.5, splitCol: String = "split")
      : org.apache.spark.sql.DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, idCol, textCol)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"))
    val labels = Dedup.componentLabels(pairs)
    val withRep = docs.join(labels, docs(idCol) === labels("doc"), "left")
      .withColumn("rep_id", coalesce(col("label"), col(idCol)))
      .drop("doc", "label")
    val repText = docs.select(col(idCol).as("rep_id"),
      col(textCol).as("ls_rep_text"))
    withHashSplit(withRep.join(repText, "rep_id"), "ls_rep_text", splitCol)
      .drop("ls_rep_text")
  }

  /** Leakage-safe split over the fixture, reduced to the per-split census
    * (docs, clusters, id checksum). The DuckDB oracle replays candidate
    * pairs, the transitive closure (recursive CTE), representative
    * selection, and the nibble rule end to end — and the spec asserts the
    * invariant the operator exists for: ZERO near-dup pairs straddle a
    * split boundary. */
  val leakageSplit = QueryDef(
    "q_sample_leakage_split",
    (spark, dir) => {
      leakageSafeSplit(Tables(spark, dir, "documents"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep_id")).as("n_clusters"),
          sum(col("doc_id")).as("id_sum"))
    },
    Some("""
      WITH RECURSIVE pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM (SELECT doc_id, substring(text, 1, 40) AS blk,
                     """ + Dedup.duckShingles + """ AS grams
              FROM documents) a
        JOIN (SELECT doc_id, substring(text, 1, 40) AS blk,
                     """ + Dedup.duckShingles + """ AS grams
              FROM documents) b
          ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
              CAST(len(a.grams) + len(b.grams)
                   - len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              >= 0.5),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS doc FROM edges),
      reach(doc, r) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT reach.doc, edges.dst
        FROM reach JOIN edges ON reach.r = edges.src),
      lbl AS (
        SELECT doc, min(r) AS label FROM reach GROUP BY doc),
      rep AS (
        SELECT d.doc_id, d.lang,
               coalesce(l.label, d.doc_id) AS rep_id
        FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc),
      keyed AS (
        SELECT rep.doc_id, rep.rep_id, rt.text AS rep_text
        FROM rep JOIN documents rt ON rep.rep_id = rt.doc_id),
      assigned AS (
        SELECT doc_id, rep_id, CASE
          WHEN substring(md5(rep_text), 1, 1) IN
            ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
          WHEN substring(md5(rep_text), 1, 1) IN ('c', 'd') THEN 'val'
          ELSE 'test' END AS split
        FROM keyed)
      SELECT split, count(*) AS n_docs,
             count(DISTINCT rep_id) AS n_clusters,
             CAST(sum(doc_id) AS BIGINT) AS id_sum
      FROM assigned GROUP BY 1"""))

  /** Library API: deterministic weight-proportional sample of `k` rows —
    * the PPS (probability-proportional-to-size) selection step of a
    * curation mix, made replayable. Each row draws a content-keyed
    * 48-bit uniform hash and its priority is `hash DIV weight` (integer
    * division): doubling a row's weight halves its priority, so the k
    * smallest priorities select rows with probability ≈ ∝ weight — the
    * integer-arithmetic analogue of the exponential-key A-ES sample,
    * with zero RNG and a bit-exact DuckDB replay.
    *
    * Scale shape: a pure map stage (hash + one integer division) feeding
    * ONE top-k — TakeOrderedAndProject keeps k rows per partition and
    * merges on the driver side of the exchange, so nothing resembling a
    * global sort materializes however big the corpus is. */
  def prioritySample(df: org.apache.spark.sql.DataFrame,
      contentCol: String, weightCol: String, tiebreakCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1)
    // weights must be >= 1: weight 0 makes the integer DIV return NULL
    // in Spark (non-ANSI) but error in an ANSI oracle, and NULL
    // priorities sort NULLS FIRST here vs NULLS LAST in DuckDB — a
    // degenerate weight would deterministically win the top-k AND
    // diverge cross-engine, so it fails loudly instead
    df.withColumn("priority",
        expr(s"CASE WHEN CAST($weightCol AS BIGINT) >= 1 THEN " +
          s"CAST(conv(substr(md5($contentCol), 1, 12), 16, 10) AS " +
          s"BIGINT) DIV CAST($weightCol AS BIGINT) ELSE " +
          s"raise_error(concat('prioritySample: weight must be >= 1, " +
          s"got ', CAST($weightCol AS STRING))) END"))
      .orderBy(col("priority"), col(tiebreakCol))
      .limit(k)
  }

  /** Weighted priority sample of 60 documents, weight = byte length —
    * long documents are proportionally likelier, and the whole draw
    * replays bit-exact in DuckDB (same md5 priorities, same top-k). */
  val prioritySampleQ = QueryDef(
    "q_sample_priority",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
        .withColumn("w", length(col("text")).cast("long"))
      prioritySample(docs, "text", "w", "doc_id", k = 60)
        .select(col("doc_id"), col("w"), col("priority"))
    },
    Some("""
      SELECT doc_id, w, priority FROM (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS w,
               ('0x' || substr(md5(text), 1, 12))::BIGINT
                 // CAST(length(text) AS BIGINT) AS priority
        FROM documents)
      ORDER BY priority, doc_id LIMIT 60"""))

  /** The sampling-side pipeline closure — the mix BUILDER a training run
    * actually executes, end to end: quality gate → exact dedup (keep min
    * id) → UniMax sqrt-temperature language budgets computed ON THE
    * DEDUPED corpus → quota selection → leakage-safe hash split, reported
    * as the (split, lang) doc/token census. Stage ORDER is the lever
    * (same as q_docs_pipeline on the cleaning side): dedup precedes the
    * budget census so duplicated languages can't inflate their own
    * budgets, and the split key is the content hash so surviving exact
    * duplicates can never straddle train/test. Every stage is an existing
    * library op ([[withHashSplit]], [[quotaSelect]]); the whole
    * composition replays bit-exact in DuckDB. */
  val mixPipeline = QueryDef(
    "q_mix_pipeline",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val quality = docs.filter(length(col("text")) >= 200)
      val keep = quality
        .groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      val deduped = quality.join(keep.select(col("doc_id")), "doc_id")
      val counts = deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_orig"))
        .withColumn("mx_s", floor(sqrt(col("n_orig"))).cast("long"))
      val tot = counts.agg(sum(col("mx_s")).as("mx_ss"),
        sum(col("n_orig")).as("mx_tot"))
      val budgets = counts.crossJoin(broadcast(tot))
        .withColumn("budget",
          least(col("n_orig"),
            expr("((mx_tot * 6) div 10) * mx_s div mx_ss")))
        .select(col("lang"), col("budget"))
      val selected = quotaSelect(deduped, "lang", "text", "doc_id", budgets)
      withHashSplit(selected, "text")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("tok_sum"))
    },
    Some("""
      WITH q AS (
        SELECT doc_id, lang, text FROM documents WHERE length(text) >= 200),
      keep AS (
        SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
      d AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
      counts AS (
        SELECT lang, count(*) AS n_orig,
               CAST(floor(sqrt(count(*))) AS BIGINT) AS s
        FROM d GROUP BY lang),
      tot AS (SELECT CAST(sum(s) AS BIGINT) AS ss,
                     CAST(sum(n_orig) AS BIGINT) AS tot FROM counts),
      budgets AS (
        SELECT lang, least(n_orig, ((tot * 6) // 10) * s // ss) AS budget
        FROM counts, tot),
      ranked AS (
        SELECT lang, text,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM d),
      kept AS (
        SELECT r.lang, r.text
        FROM ranked r JOIN budgets b ON r.lang = b.lang AND r.rn <= b.budget)
      SELECT CASE
               WHEN substring(md5(text), 1, 1) IN
                 ('0','1','2','3','4','5','6','7','8','9','a','b')
                 THEN 'train'
               WHEN substring(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
               ELSE 'test' END AS split,
             lang, count(*) AS n_docs,
             CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS tok_sum
      FROM kept GROUP BY 1, 2"""))

  /** Library API: per-group rank calibration — each row's score becomes
    * its GROUP-relative rank position in exact integer per-mille
    * (0 = group best, 1000 = group worst), so one global threshold
    * ("keep the top 10%") applies a DIFFERENT absolute cutoff per source.
    * The RefinedWeb-style discipline: raw quality scores aren't comparable
    * across sources (a mediocre encyclopedia page outscores an excellent
    * forum post), so selection must be rank-relative per source. One
    * window per group; ties break on the tiebreak column so the permille
    * is total-ordered and replayable. */
  def rankCalibrate(df: org.apache.spark.sql.DataFrame, groupCol: String,
      scoreCol: String, tiebreakCol: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tiebreakCol))
    df.withColumn("rank_permille",
      expr(s"1000 * (row_number() OVER (PARTITION BY $groupCol " +
        s"ORDER BY $scoreCol DESC, $tiebreakCol) - 1) DIV " +
        s"greatest(count(1) OVER (PARTITION BY $groupCol) - 1, 1)"))
  }

  /** Top-10%-per-source selection via rank calibration, with the
    * per-source ABSOLUTE thresholds surfaced (they differ — the point):
    * census of selected docs + the score floor each source ended up
    * paying. */
  val calibrate = QueryDef(
    "q_sample_calibrate",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      rankCalibrate(docs, "source", "n_chars", "doc_id")
        .filter(col("rank_permille") < 100)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"),
          min(col("n_chars")).as("score_floor"),
          max(col("n_chars")).as("score_ceil"),
          sum(col("doc_id")).as("id_checksum"))
    },
    Some("""
      WITH r AS (
        SELECT source, n_chars, doc_id,
               1000 * (row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) - 1)
                 // greatest(count(*) OVER (PARTITION BY source) - 1, 1)
                 AS rank_permille
        FROM documents)
      SELECT source, count(*) AS n_selected,
             min(n_chars) AS score_floor, max(n_chars) AS score_ceil,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM r WHERE rank_permille < 100 GROUP BY source"""))

  val all: Seq[QueryDef] =
    Seq(hashSplit, stratified, scrub, packSequences, mixWeights,
      unimax, epochShards, dsir, oversample, leakageSplit, tokenBudget,
      curriculum, prioritySampleQ, mixPipeline, calibrate)
}
