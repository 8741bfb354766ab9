package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line of per-query wall times at the driver's
  * scale factor. Results are fully materialized through a noop sink (count()
  * alone would let column pruning skip most of the work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/file-index warmup so the first measured query isn't
    // charged for session spin-up
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // dev loop: SPARK_GRAFT_BENCH_ONLY=q1_agg,q_rollup limits the run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.registry
      else SparkEntry.registry.filter(q => only.contains(q.name))
    val results = selected.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // release per-query persisted intermediates between measurements
      spark.catalog.clearCache()
      q.name -> dt
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
