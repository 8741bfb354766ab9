package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over int8-quantized embeddings — the
  * semantic-clustering primitive a curation pipeline uses to group a corpus
  * before per-cluster dedup/sampling, and the trainer the PQ/IVF indexes
  * (Similarity.scala) stand in fixed codebooks for.
  *
  * All arithmetic is EXACT integer (squared-L2 over int8 components,
  * centroid means via the same floor(sum/n + 0.5) rounding on both
  * engines), so the full iteration — seeds, assignments, updated
  * centroids, final clusters — is bit-reproducible in DuckDB and the
  * registry query is oracle-checked, not rows-only. Seeding is
  * deterministic (the k lowest-id vectors), matching the registry's
  * no-RNG reproducibility rule.
  *
  * The 100 TB shape (classic scalable Lloyd's):
  *  - assignment is a NARROW map: k×d centroid literals ride the closure
  *    (k·d ≤ a few KB), each row scores k codegen'd `vec_dot_i8` kernel
  *    calls — no shuffle, no join;
  *  - the update is posexplode → partial-aggregated sum/count per
  *    (cluster, dim) — the shuffle moves ≤ partitions·k·d pre-combined
  *    rows, and the driver pulls exactly k·d longs (the same bounded
  *    1-collect pattern as Layout's range bounds);
  *  - iterations multiply the scan count, not the shuffle width.
  *
  * Reference lacks any clustering operator (its aggregate list is six
  * built-ins, ColumnarHashAggregation.scala:101-196); this is part of the
  * beyond-reference LLM-pipeline surface.
  */
object Clustering {

  /** Lloyd's k-means over an `array<tinyint>` column. Returns the input
    * ids with their final cluster id and exact squared-L2 distance to the
    * winning centroid. `iters` = number of assignment passes (updates run
    * between passes, not after the last).
    */
  def kmeansI8(
      quantized: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be positive: k=$k iters=$iters")
    val v = quantized.select(
      col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    // deterministic seeds: the k lowest-id vectors (bounded driver pull)
    var cents: Array[Array[Long]] = v.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Byte](1).map(_.toLong).toArray)
    require(cents.length == k, s"need >= $k input vectors, got ${cents.length}")

    def assign(c: Array[Array[Long]]): DataFrame = {
      // score_j = |c_j|^2 - 2*<v, c_j>; argmin_j score_j == argmin_j |v-c_j|^2
      // (|v|^2 is constant per row), ties -> lowest j via array_position.
      val scores: Seq[Column] = c.toIndexedSeq.map { cj =>
        val cc = cj.map(x => x * x).sum
        val centLit = s"CAST(array(${cj.mkString(",")}) AS ARRAY<TINYINT>)"
        lit(cc) - lit(2L) * expr(s"vec_dot_i8(v, $centLit)")
      }
      v.withColumn("scores", array(scores: _*))
        .withColumn("best", array_min(col("scores")))
        .select(
          col("id"), col("v"),
          (array_position(col("scores"), col("best")) - 1L).as("cluster"),
          // exact |v - c_win|^2 = |v|^2 + score_win
          (expr("vec_dot_i8(v, v)") + col("best")).as("dist2"))
    }

    var assigned = assign(cents)
    var it = 1
    while (it < iters) {
      // new centroid = rounded per-dim mean of members; empty cluster keeps
      // its previous centroid. floor(x + 0.5) — the one rounding both Spark
      // and DuckDB spell identically (see VectorKernels.quantizeI8).
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val cl = r.getLong(0).toInt; val pos = r.getInt(1)
        next(cl)(pos) =
          math.floor(r.getLong(2).toDouble / r.getLong(3).toDouble + 0.5).toLong
      }
      cents = next
      assigned = assign(cents)
      it += 1
    }
    assigned.select(col("id"), col("cluster"), col("dist2"))
  }

  private val dims = 64
  private val kQ = 8

  /** DuckDB mirror of `quantize_i8(embedding)` as a list<bigint> —
    * identical to the q_sim_quantized_topk oracle's qv CTE. */
  private def duckQuantCte: String =
    s"""qv AS (
        SELECT vec_id,
               CASE WHEN m = 0e0
                    THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 127e0 / m + 5e-1)
                                AS BIGINT))
               END AS q
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS m
              FROM embeddings))"""

  /** exact integer squared-L2 between two list<bigint> of length `dims` */
  private def duckDist2(a: String, b: String): String =
    s"""CAST(list_reduce(list_transform(range($dims),
          i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1])),
          (p, x) -> p + x) AS BIGINT)"""

  /** one assignment pass: each vector to its nearest centroid in `cent`
    * (columns cid, c), ties to the lowest cid — identical to the Spark
    * side's array_position-first-min rule. */
  private def duckAssign(cent: String): String =
    s"""SELECT vec_id, q, cid, dist2 FROM (
          SELECT v.vec_id, v.q, c.cid,
                 ${duckDist2("v.q", "c.c")} AS dist2,
                 row_number() OVER (PARTITION BY v.vec_id
                                    ORDER BY ${duckDist2("v.q", "c.c")}, c.cid)
                   AS rn
          FROM qv v, $cent c) WHERE rn = 1"""

  /** centroid update from an assignment CTE: rounded per-dim integer mean,
    * empty clusters keep the previous centroid. */
  private def duckUpdate(assignCte: String, prevCent: String): String =
    s"""SELECT p.cid, coalesce(u.c, p.c) AS c
        FROM $prevCent p LEFT JOIN (
          SELECT cid, list(m ORDER BY j) AS c FROM (
            SELECT a.cid, r.range AS j,
                   CAST(floor(CAST(sum(a.q[r.range + 1]) AS DOUBLE)
                              / CAST(count(*) AS DOUBLE) + 5e-1) AS BIGINT)
                     AS m
            FROM $assignCte a, range($dims) r
            GROUP BY a.cid, r.range)
          GROUP BY cid) u ON p.cid = u.cid"""

  /** k=8, 2 assignment passes over the quantized embeddings corpus —
    * the full Lloyd's loop (seed → assign → update → assign) reproduced
    * bit-exact by the unrolled DuckDB oracle. */
  val kmeansQuery = QueryDef(
    "q_cluster_kmeans",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), expr("quantize_i8(embedding)").as("v"))
      kmeansI8(e, "vec_id", "v", kQ, iters = 2)
        .select(col("id").as("vec_id"), col("cluster"), col("dist2"))
    },
    Some(s"""
      WITH ${duckQuantCte},
      c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                      AS cid, q AS c
             FROM qv ORDER BY vec_id LIMIT $kQ),
      a0 AS (${duckAssign("c0")}),
      c1 AS (${duckUpdate("a0", "c0")}),
      a1 AS (${duckAssign("c1")})
      SELECT vec_id, cid AS cluster, dist2 FROM a1"""))

  /** Cluster profile on top of the same run — sizes and exact
    * within-cluster sum of squares (the quantity Lloyd's minimizes),
    * pivoting the assignment through an ordinary aggregate. */
  val kmeansSizes = QueryDef(
    "q_cluster_kmeans_profile",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), expr("quantize_i8(embedding)").as("v"))
      kmeansI8(e, "vec_id", "v", kQ, iters = 2)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sum(col("dist2")).as("wcss"))
        .orderBy(col("cluster"))
    },
    Some(s"""
      WITH ${duckQuantCte},
      c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                      AS cid, q AS c
             FROM qv ORDER BY vec_id LIMIT $kQ),
      a0 AS (${duckAssign("c0")}),
      c1 AS (${duckUpdate("a0", "c0")}),
      a1 AS (${duckAssign("c1")})
      SELECT cid AS cluster, count(*) AS n,
             CAST(sum(dist2) AS BIGINT) AS wcss
      FROM a1 GROUP BY cid ORDER BY cluster"""))

  val all: Seq[QueryDef] = Seq(kmeansQuery, kmeansSizes)
}
