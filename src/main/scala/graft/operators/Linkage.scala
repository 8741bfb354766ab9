package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (entity resolution) — the curation-pipeline stage
  * that reconciles dirty mentions (OCR'd titles, user-typed product names,
  * crawl-extracted entities) against a clean catalog. The reference engine
  * has `levenshtein` only as a row-fallback scalar
  * (`core/com/intel/oap/expression/ColumnarUnaryOperator.scala` routes
  * unsupported string ops to row eval); here the whole linkage OPERATOR is
  * first-class and scale-shaped.
  *
  * The scale discipline is the same as every near-dup family in
  * [[Dedup]]: never all-pairs. Candidate generation is a MULTI-KEY
  * BLOCKED EQUI-JOIN (explode each record into several deterministic
  * block keys → equi-join → distinct pair — the same shape the MinHash
  * band join in [[Dedup]] uses), and the expensive edit-distance kernel
  * runs on key-mates only.
  *
  * Blocking scheme: edit-distance SEGMENT keys (the PassJoin partition
  * signature). Each clean string of length L is split into
  * m = maxDist + 1 contiguous segments; by pigeonhole, any string within
  * maxDist edits leaves at least one segment untouched, so that segment
  * appears VERBATIM in the dirty string at a start position shifted by at
  * most maxDist. The dirty side therefore enumerates, for every segment
  * index i, every plausible clean length (Δ ∈ ±maxDist) and the
  * POSITION-AWARE shift window (the multi-match-aware substring selection
  * of Li, Deng & Feng's Pass-Join, PVLDB 5(1) 2011: there always exists
  * an untouched segment whose start shift sh satisfies
  * `max(−i, Δ−(d−i)) ≤ sh ≤ min(i, Δ+(d−i))` — at most i edits land
  * before segment i and at most d−i after it, in the alignment the lemma
  * picks), and emits the corresponding substrings as its keys. For
  * maxDist = 2 that is 19 raw keys per record instead of the naive
  * (2d+1)²·(d+1) = 75 — same 100% recall, ~4× less key traffic. Keys
  * also carry the ASSUMED CLEAN LENGTH (length bucketing): a clean
  * string only joins segment keys derived for exactly its own length,
  * pruning cross-length collisions from the candidate set for free
  * (the dirty side already enumerates every plausible length). Join on
  * (segment index, clean length, segment text) → 100% recall FOR ANY
  * EDIT PATTERN, prefix edits included (the round-7
  * 4-char-prefix block was blind to edits inside the prefix and, worse,
  * had BOUNDED key cardinality — TPC-H names start with ~90 color words,
  * so blocks grew linearly with the catalog and Σ|block|² quadratically).
  * Segment keys span ~L/(maxDist+1) characters (≈ two vocabulary words),
  * so their cardinality GROWS with catalog diversity and block sizes stay
  * bounded. Strings shorter than ~3·(maxDist+1) chars degrade to 1-char
  * segments (big blocks); keep mentions ≥ ~10 chars or pre-filter.
  *
  * At 100 TB: the catalog side is dimension-sized and broadcasts; the
  * dirty stream never shuffles at all.
  *
  * Determinism: the "dirty" mentions are derived from the catalog itself
  * by deleting one character at an md5-derived position (names must be
  * ≥ 5 chars — `length(name) − 4` is the modulus, so shorter names would
  * divide by zero; TPC-H part names are ≥ 15 chars), so the DuckDB
  * oracle rebuilds the identical corruption and the match set is exact —
  * no RNG, no float scores. Best-match ties break on (distance, name).
  */
object Linkage {

  /** Candidate generation + edit-distance filter: multi-key segment
    * blocking (scaladoc above) + `levenshtein ≤ maxDist`. Never
    * all-pairs: a pair is generated only when a (segment index, segment
    * text) key collides, and recall is 100% by the pigeonhole argument —
    * so the output is EXACTLY the set of (dirty, clean) pairs within
    * `maxDist` edits, independent of the blocking. Cost is Σ|block|²
    * over segment-key blocks, not |dirty|·|clean|. */
  def fuzzyJoin(dirty: DataFrame, clean: DataFrame, dirtyCol: String,
      cleanCol: String, maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val m = maxDist + 1
    // clean side: m segments per record — (seg_i, lc, seg) keys, where
    // lc is the clean string's own length (the length bucket)
    val cKeys = clean
      .withColumn("seg_i", explode(sequence(lit(0), lit(maxDist))))
      .withColumn("lc", length(col(cleanCol)).cast("int"))
      .withColumn("seg_p", expr(s"(seg_i * lc) div $m + 1"))
      .withColumn("seg_l",
        expr(s"((seg_i + 1) * lc) div $m - (seg_i * lc) div $m"))
      .filter(col("seg_l") >= 1)
      .withColumn("seg", expr(s"substr($cleanCol, seg_p, seg_l)"))
      .drop("seg_p", "seg_l")
    // dirty side: for every segment index i × candidate clean length
    // (Δ ∈ ±maxDist) × position-aware shift (sh bounded by
    // max(−i, Δ−(d−i)) .. min(i, Δ+(d−i)) — the Pass-Join multi-match-
    // aware window; the bounds are never empty since Δ ∈ [−d, d]), the
    // substring where an untouched clean segment could sit. No
    // per-record key DISTINCT: the pruned enumeration emits only ~19 raw
    // keys (few of them duplicates), so the shuffle a pre-distinct costs
    // outweighs the join traffic it saves (measured r9: dropping it cut
    // the 3-query sf0.1 bench ~8% and the 100×/30× gate ratio to 1.3×);
    // the candidate-level distinct below normalizes the pair set either
    // way, so results are blocking-identical.
    val dKeys = dirty
      .withColumn("seg_i", explode(sequence(lit(0), lit(maxDist))))
      .withColumn("dl",
        explode(sequence(lit(-maxDist), lit(maxDist))))
      .withColumn("lc", expr(s"length($dirtyCol) + dl"))
      // the lemma's Δ = |dirty| − |clean| = −dl (dl is the assumed
      // clean-length delta over the dirty length)
      .withColumn("sh", explode(sequence(
        greatest(-col("seg_i"), -col("dl") - (lit(maxDist) - col("seg_i"))),
        least(col("seg_i"), -col("dl") + (lit(maxDist) - col("seg_i"))))))
      .withColumn("seg_p", expr(s"(seg_i * lc) div $m + 1 + sh"))
      .withColumn("seg_l",
        expr(s"((seg_i + 1) * lc) div $m - (seg_i * lc) div $m"))
      .filter(col("seg_l") >= 1 && col("seg_p") >= 1 &&
        col("seg_p") + col("seg_l") - 1 <= length(col(dirtyCol)))
      .withColumn("seg", expr(s"substr($dirtyCol, seg_p, seg_l)"))
      .drop("dl", "sh", "seg_p", "seg_l")
    dKeys.join(cKeys, Seq("seg_i", "lc", "seg"))
      .drop("seg_i", "lc", "seg")
      .distinct()
      .withColumn("dist", levenshtein(col(dirtyCol), col(cleanCol)))
      .filter(col("dist") <= lit(maxDist))
  }

  /** Best catalog match per dirty mention: rank block-mate candidates by
    * (distance, catalog key) and keep rank 1, carrying the candidate count
    * for ambiguity triage. One window over the candidate pairs — already
    * block-sparse, so the rank never sees more than a block's worth of
    * rows per mention. */
  def bestMatch(cands: DataFrame, idCol: String, matchCol: String,
      distCol: String = "dist"): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(distCol), col(matchCol))
    cands
      .withColumn("rn", row_number().over(w))
      .withColumn("n_cands",
        count(lit(1)).over(Window.partitionBy(col(idCol))))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  // ---- shared oracle blocking (DuckDB mirror of fuzzyJoin) ----
  // Both engines compute the identical candidate superset (100% recall by
  // construction) and apply the identical levenshtein filter, so the
  // final rows are exact regardless of engine. `//` is DuckDB integer
  // floor division ⇔ Spark `div`.
  private def duckFuzzy(maxDist: Int): String = {
    val m = maxDist + 1
    // The position-aware shift window is spelled as a WHERE filter over
    // the full ±maxDist shift range — set-identical to the Spark side's
    // bounded sequence(), since the bounds always lie inside [−d, d].
    s"""
      ckeys AS (
        SELECT clean_name, gi.i AS seg_i, length(clean_name) AS lc,
               substr(clean_name,
                      (gi.i * length(clean_name)) // $m + 1,
                      ((gi.i + 1) * length(clean_name)) // $m
                        - (gi.i * length(clean_name)) // $m) AS seg
        FROM catalog, generate_series(0, $maxDist) AS gi(i)
        WHERE ((gi.i + 1) * length(clean_name)) // $m
                - (gi.i * length(clean_name)) // $m >= 1),
      dkeys AS (
        SELECT DISTINCT dirty_id, dirty_name, seg_i, lc,
               substr(dirty_name, seg_p, seg_l) AS seg
        FROM (
          SELECT d.dirty_id, d.dirty_name, gi.i AS seg_i, d.lc, d.dl,
                 gs.sh,
                 (gi.i * d.lc) // $m + 1 + gs.sh AS seg_p,
                 ((gi.i + 1) * d.lc) // $m
                   - (gi.i * d.lc) // $m AS seg_l
          FROM (SELECT dirty_id, dirty_name, gd.dl,
                       length(dirty_name) + gd.dl AS lc
                FROM dirty,
                     generate_series(-$maxDist, $maxDist) AS gd(dl)) d,
               generate_series(0, $maxDist) AS gi(i),
               generate_series(-$maxDist, $maxDist) AS gs(sh))
        WHERE seg_l >= 1 AND seg_p >= 1
          AND seg_p + seg_l - 1 <= length(dirty_name)
          AND sh >= greatest(-seg_i, -dl - ($maxDist - seg_i))
          AND sh <= least(seg_i, -dl + ($maxDist - seg_i))),
      cand AS (
        SELECT DISTINCT k.dirty_id, k.dirty_name, c.clean_name
        FROM dkeys k JOIN ckeys c
          ON k.seg_i = c.seg_i AND k.lc = c.lc AND k.seg = c.seg)"""
  }

  // ---- fixture corruption (shared by both queries + their oracles) ----
  // One character deleted at pos = 5 + md5(name‖key) % (len−4): requires
  // names ≥ 5 chars (modulus len−4 > 0; TPC-H names are ≥ 15). Spark and
  // DuckDB spell the same integer-from-md5 (memory idiom:
  // conv(substr(md5,…),16,10) ⇔ ('0x'‖substr(md5,…))::BIGINT).
  private val sparkDirty = """
    SELECT p_partkey AS dirty_id,
           concat(substr(p_name, 1, pos - 1), substr(p_name, pos + 1))
             AS dirty_name
    FROM (SELECT p_partkey, p_name,
                 CAST(5 + conv(substr(md5(concat(p_name, CAST(p_partkey
                     AS STRING))), 1, 6), 16, 10)
                   % (length(p_name) - 4) AS INT) AS pos
          FROM part)"""

  private val duckDirty = """
    SELECT p_partkey AS dirty_id,
           substr(p_name, 1, pos - 1) || substr(p_name, pos + 1)
             AS dirty_name
    FROM (SELECT p_partkey, p_name,
                 CAST(5 + ('0x' || substr(md5(p_name ||
                     CAST(p_partkey AS VARCHAR)), 1, 6))::BIGINT
                   % (length(p_name) - 4) AS INT) AS pos
          FROM part)"""

  // PREFIX-edit corruption: the deleted character sits INSIDE the first
  // four characters (pos = 1 + md5 % 4) — exactly the case the round-7
  // 4-char-prefix blocking was blind to; segment blocking must still
  // reach 100% recall.
  private val sparkDirtyPrefix = """
    SELECT p_partkey AS dirty_id,
           concat(substr(p_name, 1, pos - 1), substr(p_name, pos + 1))
             AS dirty_name
    FROM (SELECT p_partkey, p_name,
                 CAST(1 + conv(substr(md5(concat(p_name, CAST(p_partkey
                     AS STRING))), 1, 6), 16, 10) % 4 AS INT) AS pos
          FROM part)"""

  private val duckDirtyPrefix = """
    SELECT p_partkey AS dirty_id,
           substr(p_name, 1, pos - 1) || substr(p_name, pos + 1)
             AS dirty_name
    FROM (SELECT p_partkey, p_name,
                 CAST(1 + ('0x' || substr(md5(p_name ||
                     CAST(p_partkey AS VARCHAR)), 1, 6))::BIGINT
                   % 4 AS INT) AS pos
          FROM part)"""

  /** All segment-block candidates within 2 edits: every corrupted part
    * name against the distinct-name catalog. Recall is 100% by the
    * pigeonhole argument — the output is exactly the ≤2-edit pair set. */
  val fuzzyMatch = QueryDef(
    "q_link_fuzzy_match",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val dirty = spark.sql(sparkDirty)
      val catalog = Tables(spark, dir, "part")
        .select(col("p_name").as("clean_name")).distinct()
      fuzzyJoin(dirty, catalog, "dirty_name", "clean_name")
        .select(col("dirty_id"), col("clean_name"),
          col("dist").cast("int").as("dist"))
    },
    Some(s"""
      WITH dirty AS ($duckDirty),
      catalog AS (SELECT DISTINCT p_name AS clean_name FROM part),
      ${duckFuzzy(2)}
      SELECT dirty_id, clean_name,
             CAST(levenshtein(dirty_name, clean_name) AS INT) AS dist
      FROM cand WHERE levenshtein(dirty_name, clean_name) <= 2"""))

  /** Deterministic best match per mention — argmin(distance, name) with
    * the ambiguity count carried for triage. */
  val bestMatchQ = QueryDef(
    "q_link_best_match",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val dirty = spark.sql(sparkDirty)
      val catalog = Tables(spark, dir, "part")
        .select(col("p_name").as("clean_name")).distinct()
      val cands = fuzzyJoin(dirty, catalog, "dirty_name", "clean_name")
      bestMatch(cands, "dirty_id", "clean_name")
        .select(col("dirty_id"), col("clean_name").as("best_name"),
          col("dist").cast("int").as("dist"),
          col("n_cands").cast("long").as("n_cands"))
    },
    Some(s"""
      WITH dirty AS ($duckDirty),
      catalog AS (SELECT DISTINCT p_name AS clean_name FROM part),
      ${duckFuzzy(2)},
      scored AS (
        SELECT dirty_id, clean_name,
               CAST(levenshtein(dirty_name, clean_name) AS INT) AS dist
        FROM cand WHERE levenshtein(dirty_name, clean_name) <= 2)
      SELECT dirty_id, clean_name AS best_name, dist,
             CAST(n_cands AS BIGINT) AS n_cands
      FROM (SELECT dirty_id, clean_name, dist,
                   row_number() OVER (PARTITION BY dirty_id
                                      ORDER BY dist, clean_name) AS rn,
                   count(*) OVER (PARTITION BY dirty_id) AS n_cands
            FROM scored)
      WHERE rn = 1"""))

  /** Prefix-edit recall: the corruption deletes a character inside the
    * first FOUR characters — the blind spot of single-prefix blocking —
    * and best-match must still recover every true name at distance 1.
    * Output is the per-distance census of best matches (a compact,
    * comparator-safe shape whose counts pin the 100% recall). */
  val prefixEditQ = QueryDef(
    "q_link_prefix_edit",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val dirty = spark.sql(sparkDirtyPrefix)
      val catalog = Tables(spark, dir, "part")
        .select(col("p_name").as("clean_name")).distinct()
      val cands = fuzzyJoin(dirty, catalog, "dirty_name", "clean_name")
      bestMatch(cands, "dirty_id", "clean_name")
        .groupBy(col("dist").cast("int").as("dist"))
        .agg(count(lit(1)).as("n_mentions"),
          countDistinct(col("clean_name")).as("n_names"))
    },
    Some(s"""
      WITH dirty AS ($duckDirtyPrefix),
      catalog AS (SELECT DISTINCT p_name AS clean_name FROM part),
      ${duckFuzzy(2)},
      scored AS (
        SELECT dirty_id, clean_name,
               CAST(levenshtein(dirty_name, clean_name) AS INT) AS dist
        FROM cand WHERE levenshtein(dirty_name, clean_name) <= 2),
      best AS (
        SELECT dirty_id, clean_name, dist
        FROM (SELECT dirty_id, clean_name, dist,
                     row_number() OVER (PARTITION BY dirty_id
                                        ORDER BY dist, clean_name) AS rn
              FROM scored)
        WHERE rn = 1)
      SELECT dist, count(*) AS n_mentions,
             count(DISTINCT clean_name) AS n_names
      FROM best GROUP BY dist"""))

  val all: Seq[QueryDef] = Seq(fuzzyMatch, bestMatchQ, prefixEditQ)
}
