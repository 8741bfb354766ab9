package graft.tools

import graft.{Engine, SparkEntry}

/** Steady-state probe for the connected-components dedup query. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("cluster-probe")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_dedup_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[probe] clusters iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
