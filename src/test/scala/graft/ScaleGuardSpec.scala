package graft

import graft.plans.ScaleGuard
import org.apache.spark.sql.functions._

/** The scale audit must flag exactly the cluster-killer shapes — cartesian
  * pairing, nested-loop broadcast joins, single-partition windows — and
  * stay silent on well-partitioned plans. */
class ScaleGuardSpec extends GraftSpecBase {

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan

  test("flags cartesian products") {
    // small sides would broadcast into a BNLJ; force the true cartesian
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val a = spark.range(10).toDF("x")
      val b = spark.range(10).toDF("y")
      val f = ScaleGuard.findings(planOf(a.crossJoin(b)))
      assert(f.exists(_.contains("CartesianProduct")), f.mkString("; "))
    } finally spark.conf.set(key, prev)
  }

  test("flags nested-loop theta joins") {
    val a = spark.range(10).toDF("x")
    val b = spark.range(10).toDF("y")
    val f = ScaleGuard.findings(planOf(a.join(b, col("x") < col("y"))))
    assert(f.exists(_.contains("BroadcastNestedLoopJoin")), f.mkString("; "))
  }

  test("flags single-partition windows") {
    val w = org.apache.spark.sql.expressions.Window.orderBy("x")
    val df = spark.range(10).toDF("x")
      .withColumn("rn", row_number().over(w))
    val f = ScaleGuard.findings(planOf(df))
    assert(f.exists(_.contains("empty PARTITION BY")), f.mkString("; "))
  }

  test("silent on partitioned window + equi-join + aggregate plans") {
    val li = Tables(spark, sfDir, "lineitem")
    val orders = Tables(spark, sfDir, "orders")
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    assert(ScaleGuard.findings(planOf(joined)).isEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_orderkey")
    val windowed = li.withColumn("rn", row_number().over(w))
    assert(ScaleGuard.findings(planOf(windowed)).isEmpty)
  }
}
