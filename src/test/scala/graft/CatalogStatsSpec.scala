package graft

import org.apache.spark.sql.functions._

/** Catalog statistics surface (ANALYZE TABLE → CBO inputs): table row
  * counts and per-column stats land in the catalog and reach the optimized
  * plan's Statistics. On a cluster these feed join-strategy and
  * build-side choices before AQE refines them at runtime. */
class CatalogStatsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  test("ANALYZE TABLE computes table + column statistics into the plan") {
    sp.sql("DROP TABLE IF EXISTS stat_orders")
    Tables(sp, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.saveAsTable("stat_orders")
    try {
      sp.sql("ANALYZE TABLE stat_orders COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderkey, o_orderstatus")
      val expected = Tables(sp, sfDir, "orders").count()
      // catalog rowCount reaches plan Statistics only under CBO
      sp.conf.set("spark.sql.cbo.enabled", "true")
      val stats = sp.table("stat_orders").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == expected),
        s"rowCount=${stats.rowCount}, want $expected")
      assert(stats.sizeInBytes > 0)
      val desc = sp.sql("DESCRIBE EXTENDED stat_orders o_orderstatus")
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      // fixture has a handful of statuses; distinct_count must be sane
      val dc = desc("distinct_count").toLong
      assert(dc >= 2 && dc <= 10, s"distinct_count=$dc")
      assert(desc("max_col_len").toLong == 1) // statuses are single chars
    } finally {
      sp.conf.set("spark.sql.cbo.enabled", "false")
      sp.sql("DROP TABLE IF EXISTS stat_orders")
    }
  }
}
