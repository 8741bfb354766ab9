package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the join/exchange/aggregate skeleton of the final
  * (AQE-resolved) physical plan for the named registry queries.
  * `sbt "runMain graft.tools.PlanPeek q_tpch_q2 q_ssb_q2_1"`.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.configure(
      SparkSession.builder().master("local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("Subquery") ||
          l.contains("CartesianProduct") || l.contains("Scan") ||
          l.contains("Window") || l.contains("Sort ") || l.contains("Expand"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
