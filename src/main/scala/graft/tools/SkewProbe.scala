package graft.tools

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: what does it take for OptimizeSkewedJoin to fire locally. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(SparkSession.builder()
      .master("local[4]"))
      .config("spark.sql.shuffle.partitions", "100")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "800")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "800")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d1 = spark.range(0, 1000, 1, 10)
      .select(when(col("id") < 250, 249)
        .when(col("id") >= 750, 1000)
        .otherwise(col("id")).as("key1"), col("id").as("value1"))
    val d2 = spark.range(0, 1000, 1, 10)
      .select(when(col("id") < 250, 249)
        .otherwise(col("id")).as("key2"), col("id").as("value2"))
    val joined = d1.hint("merge").join(d2, col("key1") === col("key2"))
    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    println("[skewprobe] rows=" + n)
    println("[skewprobe] skew=true present: " + plan.contains("skew=true"))
    joined.collect()
    val plan2 = joined.queryExecution.executedPlan.toString
    println("[skewprobe] skew=true after collect: " + plan2.contains("skew=true"))
    spark.stop()
  }
}
