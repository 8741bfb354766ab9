package graft

import org.apache.spark.sql.functions._

/** ANN quality checks: both approximate paths (LSH multi-probe, IVF
  * nprobe) against the brute-force ground truth. The DuckDB oracle already
  * pins each path bit-exactly; these pin the *retrieval quality* so an
  * index change that silently tanks recall fails the build. */
class SimilaritySpec extends GraftSpecBase {

  private def topk(q: QueryDef): Map[Long, Set[Long]] =
    q.run(spark, sfDir)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("IVF and LSH ANN recall vs brute-force top-10") {
    val brute = topk(operators.Similarity.bruteForceTopK)
    assert(brute.nonEmpty)
    Seq("ivf" -> operators.Similarity.ivfAnn,
      "lsh" -> operators.Similarity.lshAnn).foreach { case (name, q) =>
      val approx = topk(q)
      val recalls = brute.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).intersect(truth).size.toDouble /
          truth.size
      }
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.5, s"$name mean recall@10 $mean")
    }
  }

  test("int8-quantized ranking recalls the full-precision dot top-10") {
    // quantized candidate generation must agree with the float dot ranking
    // closely enough for a full-precision re-rank stage to recover it
    val e = Tables(spark, sfDir, "embeddings")
    val qs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val cs = e.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("fdot").desc, col("cand_id"))
    val floatTruth = broadcast(qs).crossJoin(cs)
      .withColumn("fdot", expr("vec_dot(eq, ec)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val quant = topk(operators.Similarity.quantizedTopK)
    val recalls = floatTruth.map { case (qid, truth) =>
      quant.getOrElse(qid, Set.empty).intersect(truth).size.toDouble /
        truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"quantized mean recall@10 $mean")
  }

  test("PQ (ADC shortlist + exact re-rank) recalls the exact dot top-10") {
    val e = Tables(spark, sfDir, "embeddings")
    val qs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val cs = e.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("fdot").desc, col("cand_id"))
    val truth = broadcast(qs).crossJoin(cs)
      .withColumn("fdot", expr("vec_dot(eq, ec)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val pq = topk(operators.Similarity.pqAnn)
    val recalls = truth.map { case (qid, t) =>
      pq.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    // measured 0.83 at sf0.001 with m=8, |cents|~100, shortlist 64
    assert(mean >= 0.6, s"pq mean recall@10 $mean")
    // and the codes really compress: every shortlist survivor's score is
    // the EXACT dot (re-rank stage), so returned scores are true values
    val exact = broadcast(qs).crossJoin(cs)
      .withColumn("fdot", expr("vec_dot(eq, ec)"))
      .select(col("query_id"), col("cand_id"), col("fdot")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val scores = operators.Similarity.pqAnn.run(spark, sfDir)
      .select(col("query_id"), col("cand_id"), col("score")).collect()
    scores.foreach { r =>
      assert(r.getDouble(2) == exact((r.getLong(0), r.getLong(1))),
        "PQ output score must be the exact dot, not the ADC approximation")
    }
  }

  test("approximate results are always true neighbors (no fabrications)") {
    // every (query, cand, cos) an index returns must carry the exact cosine
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val byId = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def refCos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    operators.Similarity.ivfAnn.run(spark, sfDir)
      .select(col("query_id"), col("cand_id"), col("cos")).collect()
      .foreach { r =>
        val want = refCos(byId(r.getLong(0)), byId(r.getLong(1)))
        assert(r.getDouble(2) == want, s"cos mismatch for $r")
      }
  }
}
