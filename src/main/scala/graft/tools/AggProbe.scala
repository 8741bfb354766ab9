package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Scratch probe: cost of decimal(18,2) accumulation vs long-cents vs plain
  * double sum over lineitem at a given SF. Informs the Exact helpers. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("agg-probe")
    val li = Tables(spark, dir, "lineitem")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("sum_double") {
      li.agg(sum(col("l_quantity"))).collect()
    }
    time("sum_decimal") {
      li.agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()
    }
    time("sum_cents") {
      li.agg(sum(round(col("l_quantity") * 100).cast("long"))).collect()
    }
    time("grp_decimal") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")),
          sum(col("l_extendedprice").cast("decimal(18,2)")),
          avg(col("l_discount").cast("decimal(18,2)"))).collect()
    }
    time("grp_cents") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")),
          sum(round(col("l_extendedprice") * 100).cast("long")),
          avg(round(col("l_discount") * 100).cast("long"))).collect()
    }
    spark.stop()
  }
}
