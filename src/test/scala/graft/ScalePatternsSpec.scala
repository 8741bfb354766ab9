package graft


import org.apache.spark.sql.functions._

/** 100 TB scale patterns demonstrated concretely at test scale:
  * salted aggregation for skewed keys, bucketed co-located joins (zero
  * shuffle), and the cosineTopK custom-operator plan shape. */
class ScalePatternsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  test("salted two-stage aggregation equals direct aggregation") {
    // skew pattern: key 'hot' holds ~90% of rows
    val df = sp.range(0, 10000)
      .select(
        when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"),
          (col("id") % 7).cast("string"))).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    // stage 1: shard the hot key across 16 salts (map-side spread);
    // stage 2: merge partials per real key
    val salted = df
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(16)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pn"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("s"), sum(col("pn")).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a temp dir set at session creation (GraftSpecBase)
    sp.sql("DROP TABLE IF EXISTS b_orders")
    sp.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables(sp, sfDir, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(sp, sfDir, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = sp.table("b_lineitem").hint("merge")
      .join(sp.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the join itself must need no exchange: only the final tiny
    // aggregation shuffles
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side:\n$plan")
    // correctness against the unbucketed path
    val expected = Tables(sp, sfDir, "lineitem")
      .join(Tables(sp, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // at 100 TB a selective dim filter should reach the fact scan as a
    // runtime bloom filter (InjectRuntimeFilter) — the modern cousin of the
    // reference's static pushdown. Thresholds lowered so fixture-scale
    // stats qualify; broadcast disabled so the shuffle-join path (the one
    // bloom filters target) is planned.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold" ->
        sp.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        sp.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sp.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables(sp, sfDir, "lineitem")
      val s = Tables(sp, sfDir, "supplier").filter(col("s_acctbal") > 9000.0)
      val j = li.join(s, col("l_suppkey") === col("s_suppkey"))
        .agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
    } finally restore.foreach { case (k, v) => sp.conf.set(k, v) }
  }

  test("AQE splits a skewed join partition (skew-join at scale)") {
    // one hot key carrying most rows on both sides of an SMJ; thresholds
    // lowered so sf-test data trips the same machinery a 100 TB skew would
    val keys = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> sp.conf.getOption(k)).toMap
    sp.conf.set("spark.sql.shuffle.partitions", "100")
    sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "800")
    sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "800")
    sp.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1")
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // hot keys on both sides; the SMJ sits in the result stage (where
      // OptimizeSkewedJoin can split without re-shuffling upstream)
      val d1 = sp.range(0, 1000, 1, 10)
        .select(when(col("id") < 250, 249)
          .when(col("id") >= 750, 1000)
          .otherwise(col("id")).as("key1"), col("id").as("value1"))
      val d2 = sp.range(0, 1000, 1, 10)
        .select(when(col("id") < 250, 249)
          .otherwise(col("id")).as("key2"), col("id").as("value2"))
      val joined = d1.hint("merge").join(d2, col("key1") === col("key2"))
      val rows = joined.collect()
      // hot key 249: 250x250; keys 250..749 exact 1:1; d1's 1000 unmatched
      assert(rows.length == 63000)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => sp.conf.set(k, v)
      case (k, None) => sp.conf.unset(k)
    }
  }

  test("rangeBucketJoin plans an equi-join, not a nested loop") {
    val bands = Tables(sp, sfDir, "nation").select(
      col("n_nationkey"),
      (col("n_nationkey") * 400 - 500).cast("double").as("lo"),
      (col("n_nationkey") * 400 + 100).cast("double").as("hi"))
    val c = Tables(sp, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val bucketed = graft.ops.rangeBucketJoin(c, "c_acctbal", bands,
      "lo", "hi", 500L)
    bucketed.collect()
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketized range join must be an equi-join:\n$plan")
    // exact same pairs as the naive theta join
    val got = bucketed.select(col("c_custkey"), col("n_nationkey"))
      .collect().map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong)).toSet
    val want = c.join(bands,
        col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .select(col("c_custkey"), col("n_nationkey"))
      .collect().map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables(sp, sfDir, "orders")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val fact = sp.read.parquet(dir)
    // the dim predicate must be on a NON-join column over a real source:
    // a join-key literal gets inferred transitively (static pruning), and a
    // filtered LocalRelation constant-folds away — both bypass DPP
    val mins = Tables(sp, sfDir, "orders")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(min(col("o_orderkey")).as("mn"))
    // literal threshold at the median of the per-priority minima: keeps a
    // nonempty strict subset, and a literal comparison is the "likely
    // selective" filter shape DPP requires
    val cut = mins.collect().map(_.getLong(1)).sorted.apply(2)
    val dim = mins.filter(col("mn") < cut)
    val joined = fact.join(dim, col("o_orderpriority") === col("prio"))
      .agg(count(lit(1)).as("n"))
    val n = joined.collect().head.getLong(0)
    val kept = dim.collect().map(_.getString(0)).toSeq
    assert(kept.nonEmpty && kept.size < 5, s"want a selective dim: $kept")
    val expected = Tables(sp, sfDir, "orders")
      .filter(col("o_orderpriority").isin(kept: _*)).count()
    assert(n == expected)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the scan:\n$plan")
  }

  test("cosineTopK custom operator plans broadcast + window, and matches brute force") {
    val e = Tables(sp, sfDir, "embeddings")
    val qs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val cs = e.filter(col("vec_id") >= 4)
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"))
    val df = graft.ops.cosineTopK(qs, cs, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("cosine_sim"), plan)
    assert(plan.contains("row_number"), plan)
    // per query exactly 5 candidates, ranked by descending cosine
    val rows = df.select(col("query_id"), col("cos"), col("rn")).collect()
    assert(rows.length == 4 * 5)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(2)).map(_.getDouble(1)).toSeq
      assert(byRank == byRank.sorted.reverse, "cos must decrease with rank")
    }
  }

  test("ops.compacted (REBALANCE) controls output file count at write") {
    // small-files control: a 50-partition upstream stage writes 50 tiny
    // files naively; through the REBALANCE shuffle, AQE re-sizes output
    // partitions to the advisory byte target — fewer, evenly-sized files,
    // governed by CONFIG instead of a per-dataset repartition(n) guess.
    val saved = sp.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1048576")
    try {
      val wide = sp.range(0, 20000, 1, 50)
        .select(col("id"), (col("id") % 97).as("k"))
      def partFiles(dir: java.nio.file.Path): Int =
        java.nio.file.Files.list(dir).filter(_.getFileName.toString
          .endsWith(".parquet")).count().toInt
      val d1 = java.nio.file.Files.createTempDirectory("graft-plain")
      val d2 = java.nio.file.Files.createTempDirectory("graft-rebal")
      wide.write.mode("overwrite").parquet(d1.toString)
      ops.compacted(wide).write.mode("overwrite").parquet(d2.toString)
      val (plain, rebal) = (partFiles(d1), partFiles(d2))
      assert(plain == 50, s"naive write should emit one file per task: $plain")
      assert(rebal < 10,
        s"rebalanced write should coalesce to the advisory size: $rebal")
      // and the hint survives into the plan as a rebalance shuffle
      val plan = ops.compacted(wide).queryExecution.optimizedPlan.toString
      assert(plan.contains("RebalancePartitions") ||
        plan.contains("rebalance"), plan)
    } finally {
      saved match {
        case Some(v) => sp.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None => sp.conf.unset(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }
  }
}
