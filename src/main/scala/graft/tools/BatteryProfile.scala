package graft.tools

import graft.{Engine, SparkEntry}

/** Dev probe: wall-clock any registry query end-to-end (what Bench
  * measures), warm runs in one JVM.
  * `sbt "runMain graft.tools.BatteryProfile q_golden_pg_union"` */
object BatteryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_golden_coerce_decimal_precision")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.session("battery-profile")
    spark.sql("SELECT 1").collect()
    val q = SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"no registry query named $name"))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).collect().length
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"query=$name run=$i rows=$n wall=$wall%.2fs")
    }
    spark.stop()
  }
}
