package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Steady-state probe for the KMV aggregate and the cluster query. */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("kmv-probe")
    val li = Tables(spark, dir, "lineitem")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      li.groupBy(col("l_returnflag"))
        .agg(expr("kmv_distinct(l_orderkey)").as("approx"))
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] kmv iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
