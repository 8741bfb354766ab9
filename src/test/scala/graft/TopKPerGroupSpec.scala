package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator machinery (graft.plans.TopKPerGroup →
  * GraftStrategies → TopKPerGroupExec): result parity with the window
  * formulation, plan shape, and edge cases. */
class TopKPerGroupSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  private def orders = Tables(sp, sfDir, "orders")
    .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("matches the row_number window formulation exactly") {
    val k = 5
    val custom = ops.topKPerGroup(
      orders, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", k)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
    assert(asSet(custom) == asSet(viaWindow))
    assert(custom.count() == 5L * k) // 5 priorities, k rows each
  }

  test("plans the custom exec node over ONE exchange") {
    val df = ops.topKPerGroup(
      orders, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(s.contains("TopKPerGroup"), s)
    assert("Exchange".r.findAllIn(s).size == 1, s)
    assert(!s.contains("Sort"), s"no sort expected:\n$s")
  }

  test("k >= group size returns every row of the group") {
    import sp.implicits._
    val tiny = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0))
      .toDF("g", "tie", "v")
    val r = ops.topKPerGroup(tiny, Seq("g"), "v", "tie", 10)
    assert(r.count() == 3)
  }

  test("multi-column grouping keys") {
    import sp.implicits._
    val df = sp.range(0, 1000).select(
      (col("id") % 3).as("g1"), (col("id") % 4).as("g2"),
      col("id").as("tie"), (col("id") % 97).cast("double").as("v"))
    val custom = ops.topKPerGroup(df, Seq("g1", "g2"), "v", "tie", 2)
    val w = Window.partitionBy(col("g1"), col("g2"))
      .orderBy(col("v").desc, col("tie"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(custom.collect().map(key).toSet == expected.collect().map(key).toSet)
  }

  test("unknown column fails fast with a clear message") {
    val e = intercept[Exception] {
      ops.topKPerGroup(orders, Seq("nope"), "o_totalprice", "o_orderkey", 3)
        .collect()
    }
    assert(e.getMessage.contains("nope"))
  }

  test("per-partition group cap fails fast instead of slow-OOMing (ADVICE r4)") {
    val key = "spark.graft.topk.maxGroupsPerPartition"
    spark.conf.set(key, "2")
    try {
      // one partition, many distinct group keys -> must trip the cap with
      // an actionable message, not an executor OOM
      val df = spark.range(0, 100).toDF("id").coalesce(1)
        .select(col("id").as("g"), col("id").as("tie"),
          col("id").cast("double").as("v"))
      val e = intercept[Exception] {
        ops.topKPerGroup(df, Seq("g"), "v", "tie", 2).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("maxGroupsPerPartition")),
        s"expected the cap message in: ${msgs(e)}")
    } finally spark.conf.unset(key)
  }

  test("publishes operator SQLMetrics: output rows, heaps, evictions") {
    val k = 3
    val df = ops.topKPerGroup(
      orders, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", k)
    // collect() (not count()) so the metrics land on THIS queryExecution —
    // count() builds its own plan instance around the frame
    val n = df.collect().length.toLong
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // descend through AQE's QueryStageExec wrappers (Spark 4 puts the final
    // stage in a ResultQueryStageExec whose plan SparkPlan.collect skips)
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.plans.TopKPerGroupExec] = p match {
      case t: graft.plans.TopKPerGroupExec => Seq(t)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(s.plan)
      case other => other.children.flatMap(find)
    }
    val exec = find(plan).head
    assert(exec.metrics("numOutputRows").value == n)
    // 5 priorities; heaps may exceed 5 only if a group spans... it can't —
    // the declared distribution co-locates each group, so one heap per group
    assert(exec.metrics("numGroups").value == 5)
    // 75k orders into 5 heaps of 3: the bounded heap must have displaced
    // rows (this is the measure of work a full sort would have done)
    assert(exec.metrics("numEvicted").value > 0)
  }

  test("ambiguous duplicate column name is rejected, not silently bound") {
    val a = orders.select(col("o_orderkey"), col("o_totalprice"))
    val b = orders.select(col("o_orderkey").as("k2"),
      col("o_totalprice").as("o_totalprice"))
    val joined = a.join(b, col("o_orderkey") === col("k2"))
    val e = intercept[Exception] {
      ops.topKPerGroup(joined, Seq("o_orderkey"), "o_totalprice",
        "k2", 2).collect()
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }
}
