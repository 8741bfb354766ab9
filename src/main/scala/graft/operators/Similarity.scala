package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (`array<float>` of 64 dims — a type the reference can only row-fallback).
  *
  * Two paths:
  *  - brute-force cosine top-k: the correctness baseline. Query set ×
  *    candidate set cross join; at scale the query set is the broadcast side
  *    and candidates stream, so cost is linear in corpus size.
  *  - LSH-bucketed ANN: 6 sign-random-projection bits → 64 buckets;
  *    multi-probe (exact bucket + all hamming-1 neighbors) then exact re-rank
  *    inside probed buckets. The 100 TB shape: candidates shuffle once on
  *    bucket id; probe fan-out is per-query, not per-candidate. Hyperplanes
  *    are derived from pure integer arithmetic so the DuckDB oracle can
  *    reproduce them bit-for-bit (no engine-specific RNG).
  *
  * Both use the native codegen'd cosine (graft.functions.CosineSim).
  */
object Similarity {

  private val nBits = 6
  private val P1 = graft.functions.SignProjection.P1
  private val P2 = graft.functions.SignProjection.P2

  /** LSH bucket id via the native codegen'd SignProjection kernel (one
    * JIT-compiled nBits×dims loop per row; replaces the interpreted
    * aggregate(transform(sequence…)) lambda chain — VERDICT r2 perf #3).
    * Hyperplanes h(i,j) = ((i·P1 XOR j·P2) mod 2001 − 1000)/1000: pure
    * integer arithmetic, reproducible in any engine (see SignProjection's
    * scaladoc for why the mix is XOR, not addition). */
  private def sparkSig: Column = expr(s"sign_proj(embedding, $nBits)")

  private def duckDot(i: Int, emb: String): String =
    s"""list_reduce(list_transform(range(len($emb)),
        j -> CAST($emb[j+1] AS DOUBLE) *
             (CAST(xor(${i * P1}, j * $P2) % 2001 - 1000 AS DOUBLE)
              / 1000.0)),
        (p, q) -> p + q)"""

  /** DuckDB mirror of sign_proj(emb, bits) — identical integer hyperplanes. */
  private[operators] def duckSig(emb: String, bits: Int = nBits): String =
    (0 until bits)
      .map(i => s"(CASE WHEN ${duckDot(i, emb)} > 0.0 THEN ${1 << i} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Query set: first 8 vectors; candidates: the rest. */
  private def split(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables(spark, dir, "embeddings")
    (e.filter(col("vec_id") < 8), e.filter(col("vec_id") >= 8))
  }

  /** Brute-force cosine top-10 per query — the exactness baseline. */
  val bruteForceTopK = QueryDef(
    "q_sim_topk_brute",
    (spark, dir) => {
      val (q, c) = split(spark, dir)
      val qs = q.select(col("vec_id").as("query_id"), col("embedding").as("eq"))
      val cs = c.select(col("vec_id").as("cand_id"), col("embedding").as("ec"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("cand_id"))
      broadcast(qs).crossJoin(cs)
        .withColumn("cos", expr("cosine_sim(eq, ec)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("cand_id"), col("cos"), col("rn"))
    },
    Some(s"""
      SELECT query_id, cand_id, cos, rn FROM (
        SELECT query_id, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, cand_id) AS BIGINT)
                 AS rn
        FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${Dedup.duckCosine("q.embedding", "c.embedding")} AS cos
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 8 AND c.vec_id >= 8))
      WHERE rn <= 10"""))

  /** Multi-probe LSH ANN: exact bucket + hamming-1 probes, exact re-rank. */
  val lshAnn = QueryDef(
    "q_sim_ann_lsh",
    (spark, dir) => {
      val (q, c) = split(spark, dir)
      val cands = c.select(col("vec_id").as("cand_id"),
        col("embedding").as("ec"), sparkSig.as("bucket"))
      val probes = q.select(col("vec_id").as("query_id"),
        col("embedding").as("eq"), sparkSig.as("sig"))
        .select(col("query_id"), col("eq"), explode(array(
          col("sig") +: (0 until nBits).map(p =>
            expr(s"sig ^ ${1 << p}").cast("long")): _*)).as("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("cand_id"))
      broadcast(probes).join(cands, "bucket")
        .withColumn("cos", expr("cosine_sim(eq, ec)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("cand_id"), col("cos"), col("rn"))
    },
    Some(s"""
      WITH cands AS (
        SELECT vec_id AS cand_id, embedding AS ec,
               ${duckSig("embedding")} AS bucket
        FROM embeddings WHERE vec_id >= 8),
      qsig AS (
        SELECT vec_id AS query_id, embedding AS eq,
               ${duckSig("embedding")} AS sig
        FROM embeddings WHERE vec_id < 8),
      probes AS (
        SELECT query_id, eq,
               unnest([sig, xor(sig, 1), xor(sig, 2), xor(sig, 4),
                       xor(sig, 8), xor(sig, 16), xor(sig, 32)]) AS bucket
        FROM qsig)
      SELECT query_id, cand_id, cos, rn FROM (
        SELECT query_id, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, cand_id) AS BIGINT)
                 AS rn
        FROM (
          SELECT p.query_id, c.cand_id,
                 ${Dedup.duckCosine("p.eq", "c.ec")} AS cos
          FROM probes p JOIN cands c ON p.bucket = c.bucket))
      WHERE rn <= 10"""))

  /** Dot-product ranking via the native vec_dot expression (exercises the
    * second vector kernel + a global top-k). */
  val dotTopK = QueryDef(
    "q_sim_dot_topk",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("eq"))
      val c = e.filter(col("vec_id") > 0)
        .select(col("vec_id").as("cand_id"), col("embedding").as("ec"))
      c.crossJoin(broadcast(q))
        .withColumn("dot", expr("vec_dot(eq, ec)"))
        .orderBy(col("dot").desc, col("cand_id"))
        .limit(20)
        .select(col("cand_id"), col("dot"))
    },
    Some(s"""
      SELECT c.vec_id AS cand_id,
             list_reduce(list_transform(range(len(q.embedding)),
               i -> CAST(q.embedding[i+1] AS DOUBLE) *
                    CAST(c.embedding[i+1] AS DOUBLE)), (p, x) -> p + x) AS dot
      FROM embeddings c, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE c.vec_id > 0
      ORDER BY dot DESC, cand_id LIMIT 20"""))

  /** Same semantics as q_sim_topk_brute, but planned through the custom
    * CosineTopKJoin logical operator + resolution rule
    * (graft.plans.CosineTopKJoin — SURVEY §7(c) machinery); shares the
    * brute-force oracle, so the lowering is verified bit-exact. */
  val planTopK = QueryDef(
    "q_sim_topk_plan",
    (spark, dir) => {
      val (q, c) = split(spark, dir)
      val qs = q.select(col("vec_id").as("query_id"), col("embedding").as("eq"))
      val cs = c.select(col("vec_id").as("cand_id"), col("embedding").as("ec"))
      graft.ops.cosineTopK(qs, cs, 10)
        .select(col("query_id"), col("cand_id"), col("cos"),
          col("rn").cast("long").as("rn"))
    },
    bruteForceTopK.oracle)

  val all: Seq[QueryDef] = Seq(bruteForceTopK, lshAnn, dotTopK, planTopK)
}
