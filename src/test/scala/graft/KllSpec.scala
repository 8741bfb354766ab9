package graft

import org.apache.spark.sql.functions._

/** Accuracy/determinism bounds for the KLL-style quantile sketch UDAF
  * (graft.functions.KllQuantile) — the sketch-family analogue of KmvSpec's
  * cardinality bounds. */
class KllSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  private def li = Tables(sp, sfDir, "lineitem")

  test("rank error of the sketch quantile is within 3% of N") {
    val n = li.count()
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val est = li.agg(expr(s"kll_quantile(l_extendedprice, ${q}D)"))
        .head.getDouble(0)
      // true rank of the estimate
      val rank = li.filter(col("l_extendedprice") <= est).count()
      val err = math.abs(rank.toDouble - q * n) / n
      assert(err <= 0.03, s"q=$q est=$est rank=$rank n=$n err=$err")
    }
  }

  test("sketch estimate is deterministic across runs") {
    def run() = li.groupBy(col("l_returnflag"))
      .agg(expr("kll_quantile(l_quantity, 0.5D)").as("m"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(run() == run())
  }

  test("merged sketches over a repartitioned input stay within bound") {
    val n = li.count()
    val est = li.repartition(32)
      .agg(expr("kll_quantile(l_extendedprice, 0.5D)")).head.getDouble(0)
    val rank = li.filter(col("l_extendedprice") <= est).count()
    assert(math.abs(rank.toDouble - 0.5 * n) / n <= 0.03)
  }

  test("degenerate inputs: empty group is NaN, single value is exact") {
    import sp.implicits._
    val one = Seq(42.0).toDF("v")
      .agg(expr("kll_quantile(v, 0.5D)")).head.getDouble(0)
    assert(one == 42.0)
    val none = Seq.empty[Double].toDF("v")
      .agg(expr("kll_quantile(v, 0.5D)")).head.getDouble(0)
    assert(none.isNaN)
  }

  test("materialized kll_state rollups stay within the rank bound") {
    // the quantile member of the materialized-sketch-table family: per-
    // month binary states re-aggregated two- AND three-level; KLL merge
    // is mergeable-but-not-lossless, so the claim that survives rollup is
    // the RANK-ERROR guarantee, not value equality with the direct sketch
    import org.apache.spark.sql.functions.month
    val n = li.count()
    val monthly = li
      .groupBy(month(col("l_shipdate")).as("mo"))
      .agg(expr("kll_state(l_extendedprice)").as("st"))
    val two = monthly.agg(expr("kll_merge(st, 0.5D)")).head.getDouble(0)
    val r2 = li.filter(col("l_extendedprice") <= two).count()
    assert(math.abs(r2.toDouble - 0.5 * n) / n <= 0.03, s"two-level $two")
    val three = monthly
      .withColumn("qr", expr("(mo + 2) div 3"))
      .groupBy(col("qr")).agg(expr("kll_merge_state(st)").as("st"))
      .agg(expr("kll_merge(st, 0.95D)")).head.getDouble(0)
    val r3 = li.filter(col("l_extendedprice") <= three).count()
    assert(math.abs(r3.toDouble - 0.95 * n) / n <= 0.03,
      s"three-level $three")
    // a state column is small: O(k log n) doubles, not the raw rows
    val bytes = monthly.selectExpr("max(octet_length(st))")
      .head.getInt(0)
    assert(bytes < 64 * 1024, s"state unexpectedly big: $bytes bytes")
  }

  test("kll_merge fails loudly on a k mismatch instead of degrading") {
    // states built with k=64 read under the default k=256 would silently
    // reinterpret the compaction parameter and void the 1.5/k rank bound
    // (ADVICE r8) — the encoded-k header must reject the merge...
    val st64 = li.limit(1000)
      .agg(expr("kll_state(l_extendedprice, 64)").as("st"))
    val e = intercept[Exception] { st64.selectExpr("kll_merge(st, 0.5D)")
      .collect() }
    assert(e.getMessage.contains("k=64"), e.getMessage)
    // ...and the matching k merges fine
    val ok = st64.selectExpr("kll_merge(st, 0.5D, 64)").head.getDouble(0)
    assert(!ok.isNaN)
  }

  test("deserialized buffer survives add() and deep compaction") {
    // round-trip a multi-level sketch through the wire format, then keep
    // feeding it: compactions must have grown in lockstep with levels
    // (ADVICE r8 — fromBytes used to leave compactions at length 1)
    import graft.functions.KllBuffer
    val b = new KllBuffer(8)
    (1 to 500).foreach(i => b.add(i.toDouble))
    assert(b.levels.length > 2, s"want a multi-level sketch: ${b.levels.length}")
    val rt = KllBuffer.fromBytes(KllBuffer.toBytes(b), 8)
    (501 to 2000).foreach(i => rt.add(i.toDouble)) // compacts at i >= 1
    assert(rt.count == 2000L)
    val med = rt.quantile(0.5)
    assert(math.abs(med - 1000.0) / 2000.0 <= 0.2, s"median $med")
  }

  test("kll_merge rejects a non-binary child at analysis") {
    val e = intercept[Exception] {
      li.agg(expr("kll_merge(l_extendedprice, 0.5D)")).collect()
    }
    assert(e.getMessage.contains("BINARY") ||
      e.getMessage.contains("kll_merge"), e.getMessage)
  }
}
