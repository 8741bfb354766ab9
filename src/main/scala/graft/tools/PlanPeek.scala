package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the join/exchange/aggregate skeleton of the final
  * (AQE-resolved) physical plan for the named registry queries.
  * `sbt "runMain graft.tools.PlanPeek q_tpch_q2 q_ssb_q2_1"`;
  * `SPARK_GRAFT_DIR=/tmp/graft_scale_x100` overrides the data dir.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_DIR", "/root/testdata/sf0.01")
    val spark = graft.Engine.configure(
      SparkSession.builder().master(s"local[${graft.Engine.cpus}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
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
