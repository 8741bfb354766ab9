package graft

import org.apache.spark.sql.functions._

/** Structural pins for the integer PageRank the oracle's unrolled replay
  * can't see: base floor, sink behavior, and hub dominance on a graph with
  * known shape. */
class GraphsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  test("pageRankInt: hub dominates, no-inlink node sits at the base floor") {
    // star graph: 1,2,3 all point at 10; 10 points at 2 (so it has
    // out-degree and is not dangling); node 1 has NO in-links
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (10L, 2L))
      .toDF("src", "dst")
    val r = ops.pageRankInt(edges, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 10L))
    // base = 15% of 1e6; a node nobody links to holds exactly the base
    assert(r(1L) == 150000L, s"no-inlink rank ${r(1L)}")
    assert(r(3L) == 150000L)
    // the hub out-ranks everything, and its feeder 2 out-ranks the floor
    assert(r(10L) > r(2L) && r(2L) > r(1L), r.toString)
    // determinism: a second run is bit-identical
    val again = ops.pageRankInt(edges, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == r)
  }

  test("triangleCounts: K4 + pendant + noise edges count exactly") {
    // K4 on {1,2,3,4} has 4 triangles, every node in 3 of them; node 5 is
    // a pendant, 6-7-8 is an open wedge, and the input carries reversed
    // duplicates and a self-loop that canonicalization must absorb
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L),           // reversed duplicates
      (5L, 5L),                     // self-loop
      (4L, 5L),                     // pendant
      (6L, 7L), (7L, 8L))           // open wedge
      .toDF("src", "dst")
    val r = ops.triangleCounts(edges, "src", "dst")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), r.toString)
    // total participation 12 = 3 corners x 4 triangles
    assert(r.values.sum == 12L)
  }

  test("triangleCounts: hub star has none, closing one edge makes one") {
    // star: hub 100 connected to 1..6 — zero triangles despite the hub's
    // degree (the orientation bound is what keeps hubs cheap at scale)
    val star = (1L to 6L).map(i => (i, 100L)).toDF("src", "dst")
    assert(ops.triangleCounts(star, "src", "dst").count() == 0)
    val closed = star.unionAll(Seq((2L, 3L)).toDF("src", "dst"))
    val r = ops.triangleCounts(closed, "src", "dst")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(2L -> 1L, 3L -> 1L, 100L -> 1L), r.toString)
  }

  test("kCore: peels the tail, keeps the clique, cascades removals") {
    // K4 core {1,2,3,4} + a chain 4-5-6 hanging off it; node 5 has deg 2
    // and falls in round 1, which drops 6 to deg 0 — the cascade the
    // round-by-round peel must propagate
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)) ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val r = ops.kCore(edges, "src", "dst", k = 3, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), r.toString)
    // k above the clique degree empties the graph
    assert(ops.kCore(edges, "src", "dst", k = 4, rounds = 3).count() == 0)
  }

  test("pageRankInt: 30 iterations stay planning-bounded and exact") {
    // directed 5-cycle: every node has in/out degree 1, so 1e6 micro-rank
    // is a FIXED POINT (cs = 1e6 DIV 1; rank = 150000 + 85·1e6 DIV 100 =
    // 1e6) — 30 rounds must return exactly 1e6 everywhere. The point of
    // the case is the lineage contract: without the every-8th-round
    // localCheckpoint the carried table's plan grows 30 joins deep and
    // analysis time balloons; the wall-clock bound pins that planning
    // stays bounded at iteration counts far past the shipped defaults.
    val cyc = (0L to 4L).map(i => (i, (i + 1) % 5)).toDF("src", "dst")
    val t0 = System.nanoTime()
    val r = ops.pageRankInt(cyc, "src", "dst", iters = 30)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r == (0L to 4L).map(_ -> 1000000L).toMap, r.toString)
    assert(secs < 120, f"30-iteration pageRank took $secs%.1fs")
    sp.catalog.clearCache()
  }

  test("triangleCounts: out-of-domain node ids fail loudly") {
    val bad = Seq((1L, 1000000000L)).toDF("src", "dst")
    val ex = intercept[Exception] {
      ops.triangleCounts(bad, "src", "dst").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("node id outside")), ex.toString)
  }

  test("pageRankInt: rank mass stays bounded by the closed-form ceiling") {
    // with damping d, unnormalized ranks satisfy
    // sum(r) <= N*base + d*sum(prev)/100 -> bounded by N*1e6 for any graph
    val docs = Tables(sp, sfDir, "documents").limit(100)
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
      (col("doc_id") * 7 % n).as("dst"))
    val total = ops.pageRankInt(edges, "src", "dst", iters = 4)
      .agg(sum(col("rank_u"))).head.getLong(0)
    assert(total > 0 && total <= n * 1000000L,
      s"total rank $total exceeds the ceiling ${n * 1000000L}")
  }
}
