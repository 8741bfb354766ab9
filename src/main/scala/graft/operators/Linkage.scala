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
  * [[Dedup]]: never all-pairs. Candidate generation is a BLOCK-KEYED
  * EQUI-JOIN (records only meet inside a block), and the expensive
  * edit-distance kernel runs on block-mates only. Blocking here is a
  * shared 4-char prefix — sound by construction for the fixture's
  * corruption model (deletions only at position ≥ 5; production systems
  * use multi-key blocking — q-gram or phonetic keys — to cover edits in
  * the prefix, which is the same explode→equi-join shape with k keys per
  * record). At 100 TB: the catalog side is dimension-sized and
  * broadcasts; the dirty stream never shuffles at all.
  *
  * Determinism: the "dirty" mentions are derived from the catalog itself
  * by deleting one character at an md5-derived position, so the DuckDB
  * oracle rebuilds the identical corruption and the match set is exact —
  * no RNG, no float scores. Best-match ties break on (distance, name).
  */
object Linkage {

  /** Candidate generation + edit-distance filter: block-keyed equi-join of
    * `dirty` mentions against the `clean` catalog, keeping pairs within
    * `maxDist` Levenshtein edits. Never all-pairs: records meet only when
    * their first `blockLen` characters agree, so cost is Σ|block|² over
    * blocks, not |dirty|·|clean| — and the catalog side of the join is
    * dimension-sized (broadcastable) in every real linkage workload. */
  def fuzzyJoin(dirty: DataFrame, clean: DataFrame, dirtyCol: String,
      cleanCol: String, blockLen: Int = 4, maxDist: Int = 2): DataFrame = {
    require(blockLen >= 1 && maxDist >= 0)
    dirty.join(clean,
        substring(col(dirtyCol), 1, blockLen) ===
          substring(col(cleanCol), 1, blockLen))
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

  // ---- fixture corruption (shared by both queries + their oracles) ----
  // One character deleted at pos = 5 + md5(name‖key) % (len−4): always at
  // position ≥ 5, so the 4-char block prefix survives by construction and
  // candidate recall is provably 100%. Spark and DuckDB spell the same
  // integer-from-md5 (memory idiom: conv(substr(md5,…),16,10) ⇔
  // ('0x'‖substr(md5,…))::BIGINT).
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

  /** All block-mate candidates within 2 edits: every corrupted part name
    * against the distinct-name catalog. Recall is 100% by construction
    * (the true name is always a candidate at distance 1). */
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
      catalog AS (SELECT DISTINCT p_name AS clean_name FROM part)
      SELECT d.dirty_id, c.clean_name,
             CAST(levenshtein(d.dirty_name, c.clean_name) AS INT) AS dist
      FROM dirty d JOIN catalog c
        ON substr(d.dirty_name, 1, 4) = substr(c.clean_name, 1, 4)
      WHERE levenshtein(d.dirty_name, c.clean_name) <= 2"""))

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
      cand AS (
        SELECT d.dirty_id, c.clean_name,
               CAST(levenshtein(d.dirty_name, c.clean_name) AS INT) AS dist
        FROM dirty d JOIN catalog c
          ON substr(d.dirty_name, 1, 4) = substr(c.clean_name, 1, 4)
        WHERE levenshtein(d.dirty_name, c.clean_name) <= 2)
      SELECT dirty_id, clean_name AS best_name, dist,
             CAST(n_cands AS BIGINT) AS n_cands
      FROM (SELECT dirty_id, clean_name, dist,
                   row_number() OVER (PARTITION BY dirty_id
                                      ORDER BY dist, clean_name) AS rn,
                   count(*) OVER (PARTITION BY dirty_id) AS n_cands
            FROM cand)
      WHERE rn = 1"""))

  val all: Seq[QueryDef] = Seq(fuzzyMatch, bestMatchQ)
}
