package graft.tools

import graft.Engine
import org.apache.spark.sql.SparkSession

/** Dev probe: time ONE scale-gate entry (registry query or ScaleSmoke
  * extra runner) against an existing replica scratch dir, without paying
  * for the full gate. Usage:
  *   sbt "runMain graft.tools.ScaleProbe <name> <dir> [reps]"
  * e.g. runMain graft.tools.ScaleProbe op_fuzzy_link_rep /tmp/graft_scale_x30
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/tmp/graft_scale_x30")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = ScaleSmoke.runnerFor(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe $i/$reps] $name rows=$n ${dt}%.2fs")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    println(f"[probe] $name min=${times.min}%.2fs over $reps reps @ $dir")
    spark.stop()
  }
}
