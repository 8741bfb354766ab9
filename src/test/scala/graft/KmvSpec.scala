package graft

import org.apache.spark.sql.functions._

/** Accuracy + mergeability bounds for the KMV distinct-count sketch
  * (graft.functions.KmvDistinct). */
class KmvSpec extends GraftSpecBase {

  test("kmv_distinct is exact below k") {
    // per-flag order counts at sf0.001 are < k=256 … no: use supplier (tiny)
    val r = Tables(spark, sfDir, "supplier")
      .agg(expr("kmv_distinct(s_suppkey)").as("a"),
        countDistinct(col("s_suppkey")).as("e")).head
    assert(r.getLong(0) == r.getLong(1), "below k the sketch is exact")
  }

  test("kmv_distinct within 10% of exact above k") {
    val r = Tables(spark, sfDir, "lineitem")
      .agg(expr("kmv_distinct(l_orderkey)").as("a"),
        countDistinct(col("l_orderkey")).as("e")).head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(e > 256, "fixture must exceed k for this test to bite")
    assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
  }

  test("kmv_distinct_det: exact below k, within 10% above, agrees with xx") {
    // below k the det sketch IS the distinct hash set → exact
    val s = Tables(spark, sfDir, "supplier")
      .agg(expr("kmv_distinct_det(cast(s_suppkey as string))").as("a"),
        countDistinct(col("s_suppkey")).as("e")).head
    assert(s.getLong(0) == s.getLong(1), "below k the det sketch is exact")
    // above k: ±10% of exact, and within 10% of the xxhash sketch (both
    // estimate the same cardinality from independent hash families)
    val r = Tables(spark, sfDir, "lineitem")
      .agg(expr("kmv_distinct_det(cast(l_orderkey as string))").as("d"),
        expr("kmv_distinct(l_orderkey)").as("x"),
        countDistinct(col("l_orderkey")).as("e")).head
    val (d, x, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble)
    assert(e > 512, "fixture must exceed k for this test to bite")
    assert(math.abs(d - e) / e < 0.10, s"det $d vs exact $e")
    assert(math.abs(d - x) / e < 0.10, s"det $d vs xx $x")
  }

  test("kmv_distinct_det rejects a non-string child at analysis") {
    val ex = intercept[Exception] {
      Tables(spark, sfDir, "supplier")
        .agg(expr("kmv_distinct_det(s_suppkey)")).head
    }
    assert(ex.getMessage.toLowerCase.contains("string"), ex.getMessage)
  }

  test("det materialized states merge losslessly (two-level == direct)") {
    val li = Tables(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(expr("kmv_distinct_det(cast(l_partkey as string))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = li
      .groupBy(col("l_returnflag"), month(col("l_shipdate")))
      .agg(expr("kmv_state_det(cast(l_partkey as string))").as("st"))
      .groupBy(col("l_returnflag"))
      .agg(expr("kmv_merge_det(st)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == rolled, s"direct $direct vs rolled $rolled")
  }

  test("approx_count_distinct (HLL++) within 5% and deterministic") {
    // raw estimates (the registry row q_agg_approx_distinct now emits the
    // derived envelope fact for the driver gate; the raw values live here)
    val run = () => Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        countDistinct(col("l_orderkey")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val first = run()
    first.foreach { case (_, a, e) =>
      assert(math.abs(a - e).toDouble / math.max(e, 1L) < 0.05, s"$a vs $e")
    }
    assert(run().sameElements(first), "sketch must be deterministic")
    // and the registry row's derived envelope flag is 1 everywhere
    val env = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .collect().map(_.getInt(2))
    assert(env.nonEmpty && env.forall(_ == 1))
  }

  test("kmv_distinct survives shuffle (partial/merge path)") {
    val df = Tables(spark, sfDir, "lineitem")
      .repartition(8, col("l_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(expr("kmv_distinct(l_orderkey)").as("a"),
        countDistinct(col("l_orderkey")).as("e"))
    df.collect().foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / math.max(e, 1.0) < 0.10, s"$a vs $e")
    }
  }

  test("approx_percentile tracks exact percentiles within rank tolerance") {
    // GK sketch at accuracy 1000: rank error ≤ n/1000, so on l_quantity
    // (integral 1..50) the value error at sf0.001 is at most one step
    val rows = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("approx_percentile(l_quantity, 0.9, 1000)").as("ap90"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"p50: ${r.getDouble(1)} vs ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) <= 1.0,
        s"p90: ${r.getDouble(3)} vs ${r.getDouble(4)}")
    }
  }

  test("materialized sketch states merge losslessly (two-level == direct)") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, sfDir, "lineitem")
    plans.GraftFunctions.ensureRegistered(spark)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(expr("kmv_distinct(l_partkey)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val monthly = li.groupBy(col("l_returnflag"),
        month(col("l_shipdate")).as("mo"))
      .agg(expr("kmv_state(l_partkey)").as("state"))
    // two-level: monthly states -> estimate
    val twoLevel = monthly.groupBy(col("l_returnflag"))
      .agg(expr("kmv_merge(state)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoLevel == direct,
      s"two-level merge must be lossless: $twoLevel vs $direct")
    // three-level: monthly -> quarterly states -> estimate
    val quarterly = li.groupBy(col("l_returnflag"),
        month(col("l_shipdate")).as("mo"))
      .agg(expr("kmv_state(l_partkey)").as("state"))
      .withColumn("q", (col("mo") + lit(2)) / lit(3))
      .groupBy(col("l_returnflag"), col("q"))
      .agg(expr("kmv_merge_state(state)").as("state"))
    val threeLevel = quarterly.groupBy(col("l_returnflag"))
      .agg(expr("kmv_merge(state)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(threeLevel == direct,
      s"state-of-states merge must be lossless: $threeLevel vs $direct")
  }

  test("kmv_merge rejects a non-binary input at analysis") {
    plans.GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      Tables(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("kmv_merge(l_partkey)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary") ||
      e.getMessage.contains("kmv_merge"), e.getMessage)
  }
}
