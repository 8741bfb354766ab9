package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal private-API bridge: constructing a Dataset from a custom
  * LogicalPlan requires `Dataset.ofRows`, which is `private[sql]`. The
  * reference uses the same technique for its plan-level classes (e.g.
  * core/src/main/scala/org/apache/spark/sql/execution/ColumnarShuffleExchangeExec.scala
  * lives inside the org.apache.spark.sql tree). Only this file and
  * [[ArrowPipe]] live outside the graft package namespace.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column over a raw catalyst Expression (Column constructors are
    * `private[sql]` in Spark 4). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Catalyst expression behind a Column (`Column.expr` is gone in 4.x). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Defensive planner-strategy mount for sessions built WITHOUT
    * spark.sql.extensions=graft.plans.GraftExtensions: adds the strategy to
    * `experimental.extraStrategies` once (idempotent). */
  def ensureStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Session-local function registry (private[sql]); used to register the
    * graft functions defensively when the session wasn't built with
    * spark.sql.extensions=graft.plans.GraftExtensions. */
  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
