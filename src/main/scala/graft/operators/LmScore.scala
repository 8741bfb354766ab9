package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model fluency scoring — the CCNet-style "perplexity
  * filter" (Wenzek et al. 2020, CCNet; also the quality lever in LLaMA's
  * CommonCrawl pipeline): build a bigram LM from a reference corpus, score
  * every document by its average per-token surprise under that LM, and gate
  * on the score. Documents full of improbable token transitions (boilerplate,
  * lorem-ipsum runs, mangled encodings) score high; fluent prose scores low.
  *
  * The reference engine has no text-pipeline surface at all (its unit is the
  * relational operator, SURVEY §2.9); this is one of the beyond-the-reference
  * LLM-pipeline extensions graded as first-class.
  *
  * Cross-engine determinism: real LMs score in floating-point log-space,
  * which no two engines reproduce bit-for-bit. We quantize the information
  * content to INTEGER BITS: surprise(w1→w2) = bitlen(n(w1·)) − bitlen(n(w1,
  * w2)) where bitlen(x) = length(bin(x)) — i.e. ⌊log2⌋ arithmetic on exact
  * integer counts, identical in any engine with a `bin` primitive. The
  * per-document mean is the one IEEE double division at the very end (the
  * same exactness pattern as graft.Exact's cents arithmetic).
  *
  * Scale shape (100 TB): tokens explode once (linear, no shuffle); the
  * bigram model is one (lang, w1, w2) hash aggregate; the left-context
  * totals reduce the MODEL (vocab²-bounded), not the corpus; scoring is one
  * shuffle join of pair occurrences against the model on the same (lang,
  * w1, w2) key, then a doc_id aggregate. No all-pairs anywhere; hot bigrams
  * skew-split by AQE. A production run would persist the model table and
  * broadcast its top-df head; here the model is corpus-trained per language
  * (exactly CCNet's per-language LMs) in the same job.
  */
object LmScore {

  /** (id, lang) → exploded adjacent token pairs, 1-based positions. */
  private def pairs(docs: DataFrame, textCol: String, langCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol), col(langCol).as("lang"),
        split(col(textCol), " ").as("l"))
      .filter(size(col("l")) >= 2)
      .select(col(idCol), col("lang"),
        explode(sequence(lit(2), size(col("l")))).as("i"), col("l"))
      .select(col(idCol), col("lang"),
        element_at(col("l"), col("i") - 1).as("w1"),
        element_at(col("l"), col("i")).as("w2"))

  /** Library API: per-document fluency scores under a per-language bigram
    * LM trained on `modelDocs` (defaults to the scored corpus itself — the
    * CCNet setup trains on a curated reference corpus instead; pass it
    * here). Returns (idCol, n_pairs, sum_bits, avg_bits, fluent). Documents
    * containing a transition absent from the model are dropped by the inner
    * join (can't happen when self-training). */
  def fluencyScores(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", idCol: String = "doc_id",
      gateBits: Double = 6.0, modelDocs: DataFrame = null): DataFrame = {
    val p = pairs(docs, textCol, langCol, idCol)
    val mp = if (modelDocs == null) p
             else pairs(modelDocs, textCol, langCol, idCol)
    // vocab-bounded (never corpus-sized), consumed twice — once as the
    // bigram table, once reduced to left-context totals. persist() so the
    // corpus explode+count runs ONCE; the corpus-sized pair stream itself
    // is deliberately re-derived, not cached (at 100 TB re-exploding is
    // cheaper than materializing tokens² of intermediate)
    val big = mp.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n12"))
      .persist()
    val uni = big.groupBy(col("lang"), col("w1"))
      .agg(sum(col("n12")).as("n1"))
    val model = big.join(uni, Seq("lang", "w1"))
      .select(col("lang"), col("w1"), col("w2"),
        (length(bin(col("n1"))) - length(bin(col("n12"))))
          .cast("long").as("bits"))
    p.join(model, Seq("lang", "w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("bits")).as("sum_bits"))
      .select(col(idCol), col("n_pairs"), col("sum_bits"),
        (col("sum_bits").cast("double") / col("n_pairs").cast("double"))
          .as("avg_bits"),
        when(col("sum_bits").cast("double") / col("n_pairs").cast("double")
               <= gateBits, 1L).otherwise(0L).as("fluent"))
  }

  /** Per-document fluency under a per-language bigram LM trained on the
    * corpus itself: n_pairs, total surprise bits, mean bits/transition, and
    * the gate at ≤ 6.0 bits (a 2⁶ = 64-way effective branching factor). */
  val lmFluency = QueryDef(
    "q_text_lm_fluency",
    (spark, dir) => fluencyScores(Tables(spark, dir, "documents")),
    Some("""
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
      p AS (
        SELECT doc_id, lang, l[i-1] AS w1, l[i] AS w2
        FROM t, unnest(range(2, len(l)+1)) AS u(i)),
      big AS (
        SELECT lang, w1, w2, count(*) AS n12 FROM p GROUP BY 1, 2, 3),
      uni AS (
        SELECT lang, w1, CAST(sum(n12) AS BIGINT) AS n1
        FROM big GROUP BY 1, 2),
      m AS (
        SELECT big.lang, big.w1, big.w2,
               CAST(length(bin(n1)) - length(bin(n12)) AS BIGINT) AS bits
        FROM big JOIN uni ON big.lang = uni.lang AND big.w1 = uni.w1),
      s AS (
        SELECT p.doc_id, count(*) AS n_pairs,
               CAST(sum(bits) AS BIGINT) AS sum_bits
        FROM p JOIN m ON p.lang = m.lang AND p.w1 = m.w1 AND p.w2 = m.w2
        GROUP BY p.doc_id)
      SELECT doc_id, n_pairs, sum_bits,
             CAST(sum_bits AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS avg_bits,
             CAST(CASE WHEN CAST(sum_bits AS DOUBLE)
                             / CAST(n_pairs AS DOUBLE) <= 6.0
                       THEN 1 ELSE 0 END AS BIGINT) AS fluent
      FROM s"""))

  /** Corpus-level view of the same scores: per (lang, fluency-gate) doc
    * counts and the score spread — what a curation dashboard reports after
    * a perplexity-filter pass (CCNet buckets its corpus into head/middle/
    * tail by exactly this statistic). Reuses the per-doc scoring plan and
    * reduces it to ≤ 2·|langs| rows, so the only addition is one final
    * narrow aggregate. */
  val lmFluencyBuckets = QueryDef(
    "q_text_lm_fluency_buckets",
    (spark, dir) => {
      val scored = lmFluency.run(spark, dir)
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"))
      scored.join(docs, "doc_id")
        .groupBy(col("lang"), col("fluent"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("sum_bits")).as("total_bits"),
          sum(col("n_pairs")).as("total_pairs"))
        .select(col("lang"), col("fluent"), col("n_docs"),
          col("total_bits"), col("total_pairs"),
          (col("total_bits").cast("double") /
            col("total_pairs").cast("double")).as("corpus_avg_bits"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
      p AS (
        SELECT doc_id, lang, l[i-1] AS w1, l[i] AS w2
        FROM t, unnest(range(2, len(l)+1)) AS u(i)),
      big AS (
        SELECT lang, w1, w2, count(*) AS n12 FROM p GROUP BY 1, 2, 3),
      uni AS (
        SELECT lang, w1, CAST(sum(n12) AS BIGINT) AS n1
        FROM big GROUP BY 1, 2),
      m AS (
        SELECT big.lang, big.w1, big.w2,
               CAST(length(bin(n1)) - length(bin(n12)) AS BIGINT) AS bits
        FROM big JOIN uni ON big.lang = uni.lang AND big.w1 = uni.w1),
      s AS (
        SELECT p.doc_id, min(p.lang) AS lang, count(*) AS n_pairs,
               CAST(sum(bits) AS BIGINT) AS sum_bits
        FROM p JOIN m ON p.lang = m.lang AND p.w1 = m.w1 AND p.w2 = m.w2
        GROUP BY p.doc_id),
      g AS (
        SELECT doc_id, lang, n_pairs, sum_bits,
               CAST(CASE WHEN CAST(sum_bits AS DOUBLE)
                               / CAST(n_pairs AS DOUBLE) <= 6.0
                         THEN 1 ELSE 0 END AS BIGINT) AS fluent
        FROM s)
      SELECT lang, fluent, count(*) AS n_docs,
             CAST(sum(sum_bits) AS BIGINT) AS total_bits,
             CAST(sum(n_pairs) AS BIGINT) AS total_pairs,
             CAST(sum(sum_bits) AS DOUBLE) / CAST(sum(n_pairs) AS DOUBLE)
               AS corpus_avg_bits
      FROM g GROUP BY lang, fluent"""))

  /** Library API: multinomial Naive Bayes text classifier with integer-bits
    * log-probabilities — the "learned-filter inference" stage (GPT-3 /
    * LLaMA-style classifier-based quality filtering runs exactly this shape:
    * a linear model over token counts, applied corpus-wide). Trains on
    * `labelCol` of the corpus itself and returns per-document predictions.
    *
    * Quantization: score(doc, c) = [bitlen(N) − bitlen(N_c)] + Σ_tokens
    * [bitlen(n_c) − bitlen(max(n_cw, 1))] — integer ⌊log2⌋ arithmetic on
    * exact counts (unseen tokens count as 1), so predictions are
    * deterministic and replayable in any engine; argmin breaks ties on the
    * class name. Scale shape: one (class, token) count aggregate
    * (vocab-bounded), scoring joins the exploded tokens × |classes| against
    * it on the same key (a constant |classes| fan-out — the cost any NB
    * scorer pays), and the argmin is a 1-row-per-(doc, class) min-struct
    * aggregate, never a corpus sort. */
  def nbClassify(docs: DataFrame, textCol: String = "text",
      labelCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), col(labelCol).as("label"),
      explode(split(col(textCol), " ")).as("w"))
    // vocab-bounded model table, consumed twice (class totals + the
    // scoring join) — persist so the corpus explode+count runs once
    val counts = toks.groupBy(col("label").as("c"), col("w"))
      .agg(count(lit(1)).as("n_cw"))
      .persist()
    val totals = counts.groupBy(col("c")).agg(sum(col("n_cw")).as("n_c"))
    val priors = docs.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).as("n_docs_c"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs_all"))
    val classes = totals.join(priors, "c").crossJoin(broadcast(nDocs))
      .select(col("c"), col("n_c"), (length(bin(col("n_docs_all"))) -
        length(bin(col("n_docs_c")))).cast("long").as("prior_bits"))
    toks.crossJoin(broadcast(classes))
      .join(counts, Seq("c", "w"), "left")
      .withColumn("bits", (length(bin(col("n_c"))) -
        length(bin(coalesce(col("n_cw"), lit(1L))))).cast("long"))
      .groupBy(col(idCol), col("label"), col("c"), col("prior_bits"))
      .agg(sum(col("bits")).as("tok_bits"))
      .select(col(idCol), col("label"),
        struct((col("prior_bits") + col("tok_bits")).as("score"),
          col("c")).as("sc"))
      .groupBy(col(idCol), col("label"))
      .agg(min(col("sc")).as("best"))
      .select(col(idCol), col("label"), col("best.c").as("pred"),
        col("best.score").as("score"))
  }

  /** NB language identification over the documents fixture, reduced to the
    * confusion matrix + per-cell doc counts (the report a router/filter
    * publishes). The stored `lang` is the weak label AND the truth here;
    * tokens separate the languages, so the matrix is near-diagonal —
    * pinned exactly by the oracle, which replays the integer-bits NB end
    * to end. */
  val nbLangConfusion = QueryDef(
    "q_text_nb_lang",
    (spark, dir) => {
      nbClassify(Tables(spark, dir, "documents"))
        .groupBy(col("label").as("lang"), col("pred"))
        .agg(count(lit(1)).as("n_docs"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang AS label, unnest(string_split(text, ' ')) AS w
        FROM documents),
      counts AS (
        SELECT label AS c, w, count(*) AS n_cw FROM toks GROUP BY 1, 2),
      totals AS (
        SELECT c, CAST(sum(n_cw) AS BIGINT) AS n_c FROM counts GROUP BY 1),
      priors AS (
        SELECT lang AS c, count(*) AS n_docs_c FROM documents GROUP BY 1),
      classes AS (
        SELECT t.c, t.n_c,
               CAST(length(bin((SELECT count(*) FROM documents))) -
                    length(bin(p.n_docs_c)) AS BIGINT) AS prior_bits
        FROM totals t JOIN priors p ON t.c = p.c),
      scored AS (
        SELECT tk.doc_id, tk.label, cl.c, cl.prior_bits,
               CAST(sum(length(bin(cl.n_c)) -
                        length(bin(coalesce(cn.n_cw, 1)))) AS BIGINT)
                 AS tok_bits
        FROM toks tk
        CROSS JOIN classes cl
        LEFT JOIN counts cn ON cn.c = cl.c AND cn.w = tk.w
        GROUP BY tk.doc_id, tk.label, cl.c, cl.prior_bits),
      best AS (
        SELECT doc_id, label, c AS pred,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY prior_bits + tok_bits, c) AS rk
        FROM scored)
      SELECT label AS lang, pred, count(*) AS n_docs
      FROM best WHERE rk = 1
      GROUP BY 1, 2"""))

  // ------------------------------------------- integer perceptron training

  /** Full-batch integer perceptron TRAINING inside the engine — the
    * linear quality classifier the GPT-3/WebText pipeline trains on
    * curated-vs-web labels and then sweeps over the crawl. Classic rule,
    * learning rate 1, weights initialized to zero:
    *
    *   round r:  misclassified_i  ⇔  y_i · (w_r · x_i) ≤ 0
    *             w_{r+1} = w_r + Σ_{misclassified} y_i · x_i
    *
    * Everything is INTEGER (features are counts, labels ±1, weights exact
    * sums), so a fixed round count is bit-reproducible on any engine —
    * the DuckDB oracle unrolls the identical rounds, like the
    * PageRank/k-means families.
    *
    * Scale shape per round: one map stage (margin under the broadcast
    * weight literals) + one |features|-wide aggregate; the driver pulls
    * exactly |features| longs per round (the k-means discipline — the
    * model crosses the driver, never the data). `features` is consumed
    * `rounds`+1 times, so the caller should pass a persisted frame;
    * [[perceptron]] does. Returns (weights after `rounds`, per-round
    * misclassified counts). */
  def perceptronTrain(features: DataFrame, xCols: Seq[String], yCol: String,
      rounds: Int): (Seq[Long], Seq[Long]) = {
    require(rounds >= 1 && xCols.nonEmpty)
    var w = Seq.fill(xCols.size)(0L)
    val missPerRound = Seq.newBuilder[Long]
    for (_ <- 1 to rounds) {
      val margin = xCols.zip(w)
        .map { case (c, wj) => col(c) * lit(wj) }
        .reduce(_ + _) * col(yCol)
      val miss = col("graft_margin") <= 0
      val agg = features.withColumn("graft_margin", margin)
        .agg(sum(when(miss, 1L).otherwise(0L)).as("n_miss"),
          xCols.map(c =>
            sum(when(miss, col(yCol) * col(c)).otherwise(0L)).as(s"u_$c")): _*)
        .collect().head
      missPerRound += agg.getAs[Long]("n_miss")
      w = w.zip(xCols).map { case (wj, c) => wj + agg.getAs[Long](s"u_$c") }
    }
    (w, missPerRound.result())
  }

  /** Train the 8-feature integer quality perceptron on curated
    * (src0–src3, y=+1) vs web (y=−1) labels for three rounds, then
    * report the learned weights and the final-weights error census. The
    * oracle retrains from scratch in DuckDB — three unrolled rounds over
    * the identical integer features — so every weight must match
    * exactly. */
  val perceptron = QueryDef(
    "q_text_perceptron",
    (spark, dir) => {
      val feats = Tables(spark, dir, "documents").select(
        when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
          .otherwise(-1L).as("y"),
        lit(1L).as("x_bias"),
        col("n_chars").as("x_chars"),
        size(split(col("text"), " ")).cast("long").as("x_words"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("x_distinct"),
        expr("array_max(transform(split(text, ' '), w -> length(w)))")
          .cast("long").as("x_maxlen"),
        expr("size(filter(split(text, ' '), w -> length(w) >= 6))")
          .cast("long").as("x_long"),
        (length(col("text")) - length(regexp_replace(col("text"), "e", "")))
          .cast("long").as("x_e"),
        expr("size(filter(split(text, ' '), " +
          "w -> w IN ('the', 'a', 'of', 'and', 'to')))")
          .cast("long").as("x_stop")).persist()
      val xs = Seq("x_bias", "x_chars", "x_words", "x_distinct", "x_maxlen",
        "x_long", "x_e", "x_stop")
      val (w, miss) = perceptronTrain(feats, xs, "y", rounds = 3)
      val finalMargin = xs.zip(w)
        .map { case (c, wj) => col(c) * lit(wj) }
        .reduce(_ + _) * col("y")
      feats
        .agg(count(lit(1)).as("n_docs"),
          sum(when(finalMargin <= 0, 1L).otherwise(0L)).as("n_err_final"))
        .select(
          Seq(col("n_docs"), col("n_err_final"),
            lit(miss(0)).as("miss_r1"), lit(miss(1)).as("miss_r2"),
            lit(miss(2)).as("miss_r3")) ++
            xs.zip(w).map { case (c, wj) => lit(wj).as(s"w_$c") }: _*)
    },
    Some("""
      WITH f AS (
        SELECT CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
                    THEN 1 ELSE -1 END AS y,
               CAST(1 AS BIGINT) AS x_bias,
               n_chars AS x_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS x_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                 AS x_distinct,
               CAST(list_max(list_transform(string_split(text, ' '),
                 w -> length(w))) AS BIGINT) AS x_maxlen,
               CAST(len(list_filter(string_split(text, ' '),
                 w -> length(w) >= 6)) AS BIGINT) AS x_long,
               CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT)
                 AS x_e,
               CAST(len(list_filter(string_split(text, ' '),
                 w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
                 AS x_stop
        FROM documents),
      -- round 1: w = 0, every margin is 0 <= 0, so all docs update
      u1 AS (
        SELECT count(*) AS miss,
               CAST(sum(y * x_bias) AS BIGINT) AS w1,
               CAST(sum(y * x_chars) AS BIGINT) AS w2,
               CAST(sum(y * x_words) AS BIGINT) AS w3,
               CAST(sum(y * x_distinct) AS BIGINT) AS w4,
               CAST(sum(y * x_maxlen) AS BIGINT) AS w5,
               CAST(sum(y * x_long) AS BIGINT) AS w6,
               CAST(sum(y * x_e) AS BIGINT) AS w7,
               CAST(sum(y * x_stop) AS BIGINT) AS w8
        FROM f),
      m2 AS (
        SELECT f.*,
               y * (u1.w1 * x_bias + u1.w2 * x_chars + u1.w3 * x_words +
                    u1.w4 * x_distinct + u1.w5 * x_maxlen + u1.w6 * x_long +
                    u1.w7 * x_e + u1.w8 * x_stop) AS margin
        FROM f, u1),
      u2 AS (
        SELECT CAST(sum(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS miss,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_bias
                 ELSE 0 END), 0) AS BIGINT) AS d1,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_chars
                 ELSE 0 END), 0) AS BIGINT) AS d2,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_words
                 ELSE 0 END), 0) AS BIGINT) AS d3,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_distinct
                 ELSE 0 END), 0) AS BIGINT) AS d4,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_maxlen
                 ELSE 0 END), 0) AS BIGINT) AS d5,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_long
                 ELSE 0 END), 0) AS BIGINT) AS d6,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_e
                 ELSE 0 END), 0) AS BIGINT) AS d7,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_stop
                 ELSE 0 END), 0) AS BIGINT) AS d8
        FROM m2),
      w2t AS (
        SELECT u1.w1 + u2.d1 AS w1, u1.w2 + u2.d2 AS w2,
               u1.w3 + u2.d3 AS w3, u1.w4 + u2.d4 AS w4,
               u1.w5 + u2.d5 AS w5, u1.w6 + u2.d6 AS w6,
               u1.w7 + u2.d7 AS w7, u1.w8 + u2.d8 AS w8,
               u2.miss AS miss2
        FROM u1, u2),
      m3 AS (
        SELECT f.*,
               y * (w2t.w1 * x_bias + w2t.w2 * x_chars + w2t.w3 * x_words +
                    w2t.w4 * x_distinct + w2t.w5 * x_maxlen +
                    w2t.w6 * x_long + w2t.w7 * x_e + w2t.w8 * x_stop)
                 AS margin
        FROM f, w2t),
      u3 AS (
        SELECT CAST(sum(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS miss,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_bias
                 ELSE 0 END), 0) AS BIGINT) AS d1,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_chars
                 ELSE 0 END), 0) AS BIGINT) AS d2,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_words
                 ELSE 0 END), 0) AS BIGINT) AS d3,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_distinct
                 ELSE 0 END), 0) AS BIGINT) AS d4,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_maxlen
                 ELSE 0 END), 0) AS BIGINT) AS d5,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_long
                 ELSE 0 END), 0) AS BIGINT) AS d6,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_e
                 ELSE 0 END), 0) AS BIGINT) AS d7,
               CAST(coalesce(sum(CASE WHEN margin <= 0 THEN y * x_stop
                 ELSE 0 END), 0) AS BIGINT) AS d8
        FROM m3),
      w3t AS (
        SELECT w2t.w1 + u3.d1 AS w1, w2t.w2 + u3.d2 AS w2,
               w2t.w3 + u3.d3 AS w3, w2t.w4 + u3.d4 AS w4,
               w2t.w5 + u3.d5 AS w5, w2t.w6 + u3.d6 AS w6,
               w2t.w7 + u3.d7 AS w7, w2t.w8 + u3.d8 AS w8,
               w2t.miss2 AS miss2, u3.miss AS miss3
        FROM w2t, u3)
      SELECT count(*) AS n_docs,
             CAST(sum(CASE WHEN y * (w3t.w1 * x_bias + w3t.w2 * x_chars +
                    w3t.w3 * x_words + w3t.w4 * x_distinct +
                    w3t.w5 * x_maxlen + w3t.w6 * x_long + w3t.w7 * x_e +
                    w3t.w8 * x_stop) <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_err_final,
             CAST(any_value(u1.miss) AS BIGINT) AS miss_r1,
             any_value(w3t.miss2) AS miss_r2,
             any_value(w3t.miss3) AS miss_r3,
             any_value(w3t.w1) AS w_x_bias, any_value(w3t.w2) AS w_x_chars,
             any_value(w3t.w3) AS w_x_words,
             any_value(w3t.w4) AS w_x_distinct,
             any_value(w3t.w5) AS w_x_maxlen, any_value(w3t.w6) AS w_x_long,
             any_value(w3t.w7) AS w_x_e, any_value(w3t.w8) AS w_x_stop
      FROM f, u1, w3t"""))

  val all: Seq[QueryDef] = Seq(lmFluency, lmFluencyBuckets, nbLangConfusion,
    perceptron)
}
