package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end proof that the pluggable cache serializer carries df.cache():
  * builds a session with spark.sql.cache.serializer=GraftCachedBatchSerializer
  * (static conf — needs its own JVM, hence a main, not a spec), caches a
  * table, and checks cached results + plan against the uncached run. */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[${Engine.cpus}]"))
      .config("spark.sql.cache.serializer",
        "graft.sources.GraftCachedBatchSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = Tables(spark, dir, "orders")
    val uncached = o.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val c = o.cache()
    c.count() // populate through GraftCachedBatchSerializer
    val agg = c.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"))
    val cached = agg.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plan = agg.queryExecution.executedPlan.toString
    val usedCache = plan.contains("InMemoryTableScan")
    println(s"[cacheprobe] plan uses InMemoryTableScan: $usedCache")
    println(s"[cacheprobe] cached == uncached: ${cached == uncached}")
    assert(usedCache && cached == uncached)
    c.unpersist()
    spark.stop()
    println("[cacheprobe] OK")
  }
}
