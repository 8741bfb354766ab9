package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's-invariant checks for ops.kmeansI8 beyond the DuckDB oracle
  * (which pins the k=8/iters=2 registry run bit-exactly): partitioning
  * independence, WCSS monotonicity, and assignment optimality. */
class ClusteringSpec extends GraftSpecBase {

  private def quantized: DataFrame = {
    plans.GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("quantize_i8(embedding)").as("v"))
  }

  private def run(df: DataFrame, iters: Int): Array[(Long, Long, Long)] =
    ops.kmeansI8(df, "vec_id", "v", k = 5, iters = iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("assignment is independent of input partitioning") {
    val base = run(quantized, 2)
    val shuffled = run(quantized.repartition(7, col("v")), 2)
    assert(base.sameElements(shuffled))
  }

  test("every input id assigned exactly once, clusters within [0, k)") {
    val out = run(quantized, 2)
    val n = quantized.count()
    assert(out.length == n)
    assert(out.map(_._1).distinct.length == n)
    assert(out.forall { case (_, c, d) => c >= 0 && c < 5 && d >= 0 })
  }

  test("total WCSS is non-increasing across Lloyd's iterations") {
    // each update step re-centers clusters on their members' (rounded)
    // mean, so total squared distance cannot grow by more than the
    // integer-rounding slack; pin strict non-increase plus a tiny epsilon
    val w1 = run(quantized, 1).map(_._3).sum.toDouble
    val w3 = run(quantized, 3).map(_._3).sum.toDouble
    assert(w3 <= w1 * 1.001, s"WCSS grew: iters=1 $w1 -> iters=3 $w3")
  }

  test("kmeans-trained IVF recall@10 vs brute-force cosine truth") {
    plans.GraftFunctions.ensureRegistered(spark)
    def pairs(q: QueryDef): Map[Long, Set[Long]] =
      q.run(spark, sfDir)
        .select(col("query_id"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val truth = pairs(operators.Similarity.bruteForceTopK)
    val approx = pairs(operators.Clustering.ivfKmeans)
    assert(truth.nonEmpty)
    val recalls = truth.map { case (qid, t) =>
      approx.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"ivf-kmeans mean recall@10 $mean")
  }

  test("each row sits with its true nearest centroid (assignment optimality)") {
    // recompute distances to ALL final centroids by brute force on the
    // collected vectors; the operator's choice must be the argmin
    val vecs = quantized.collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).map(_.toLong).toArray)
      .toMap
    val out = ops.kmeansI8(quantized, "vec_id", "v", k = 5, iters = 2)
    val byCluster = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // centroids are not returned; reconstruct the winning distance check
    // via the pigeonhole: a row's dist2 must be <= the dist2 any other row
    // of a DIFFERENT cluster has to ITS centroid plus their cross distance
    // is too weak — instead recompute centroids exactly as the operator
    // does (rounded means of iter-1 assignment) and compare argmin.
    val firstPass = ops.kmeansI8(quantized, "vec_id", "v", k = 5, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seeds = vecs.toSeq.sortBy(_._1).take(5).map(_._2).toArray
    val cents = seeds.map(_.clone())
    firstPass.groupBy(_._2).foreach { case (cl, members) =>
      val vs = members.map(m => vecs(m._1))
      (0 until 64).foreach { d =>
        val s = vs.map(_(d)).sum
        cents(cl.toInt)(d) =
          math.floor(s.toDouble / vs.length.toDouble + 0.5).toLong
      }
    }
    byCluster.foreach { case (id, cl, d2) =>
      val dists = cents.map { c =>
        val v = vecs(id)
        (0 until 64).map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
      }
      val best = dists.zipWithIndex.minBy(t => (t._1, t._2))
      assert(best._2 == cl.toInt && best._1 == d2,
        s"id=$id operator=($cl,$d2) bruteforce=(${best._2},${best._1})")
    }
  }

  test("semDedup: drop decisions are exactly the pairwise-τ rule") {
    plans.GraftFunctions.ensureRegistered(spark)
    val emb = Tables(spark, sfDir, "embeddings")
    val tau = 0.3
    val out = ops.semDedup(emb, "vec_id", "embedding", k = 8, iters = 2, tau)
      .select(col("id"), col("cluster"), col("kept"), col("max_prior_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(out.map(_._1).distinct.size == out.size, "one row per input id")
    val dropped = out.filter(!_._3)
    assert(dropped.nonEmpty, "τ=0.3 must actually drop something at sf0.01")
    assert(dropped.size < out.size / 2, "must not collapse the corpus")
    // every decision consistent with its reported similarity evidence
    out.foreach { case (id, _, kept, ms) =>
      assert(kept == ms.forall(_ < tau),
        s"id=$id kept=$kept but max_prior_sim=$ms")
    }
    // each cluster's rank-1 (farthest-from-centroid) row carries no prior
    val noPrior = out.filter(_._4.isEmpty)
    assert(noPrior.size == out.map(_._2).distinct.size &&
      noPrior.forall(_._3), "exactly one prior-less, always-kept row per cluster")
    // τ above any attainable cosine keeps everything
    val all = ops.semDedup(emb, "vec_id", "embedding", 8, 2, tau = 1.1)
    assert(all.filter(!col("kept")).count() == 0L)
  }
}
