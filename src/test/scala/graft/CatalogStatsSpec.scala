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

  test("CBO join reorder: analyzed snowflake joins dims-first, not syntax order") {
    // the reorder lever ANALYZE buys on a cluster: the query text joins
    // fact->customer->nation->region in syntax order (left-deep, fact
    // first — the worst tree under a selective region filter); with table
    // + join-key column stats and spark.sql.cbo.joinReorder on, the DP
    // reorder must produce a DIFFERENT tree that builds the tiny
    // region⋈nation side before touching the fact
    val tables = Map(
      "stat_o2" -> Tables(sp, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "stat_c2" -> Tables(sp, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
      "stat_n2" -> Tables(sp, sfDir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name")),
      "stat_r2" -> Tables(sp, sfDir, "region")
        .select(col("r_regionkey"), col("r_name")))
    tables.foreach { case (name, df) =>
      sp.sql(s"DROP TABLE IF EXISTS $name")
      df.write.saveAsTable(name)
    }
    val q = """
      SELECT n_name, sum(o_totalprice) AS rev
      FROM stat_o2
        JOIN stat_c2 ON o_custkey = c_custkey
        JOIN stat_n2 ON c_nationkey = n_nationkey
        JOIN stat_r2 ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name"""
    // leaf order of the optimized join tree, left to right
    def leafOrder(plan: String): Seq[String] =
      "stat_[ocnr]2".r.findAllIn(plan).toSeq
    def optimized = sp.sql(q).queryExecution.optimizedPlan.toString
    try {
      val statsless = leafOrder(optimized)
      assert(statsless == Seq("stat_o2", "stat_c2", "stat_n2", "stat_r2"),
        s"without stats the optimizer keeps syntax order: $statsless")
      sp.sql("ANALYZE TABLE stat_o2 COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderkey, o_custkey")
      sp.sql("ANALYZE TABLE stat_c2 COMPUTE STATISTICS " +
        "FOR COLUMNS c_custkey, c_nationkey")
      sp.sql("ANALYZE TABLE stat_n2 COMPUTE STATISTICS " +
        "FOR COLUMNS n_nationkey, n_regionkey")
      sp.sql("ANALYZE TABLE stat_r2 COMPUTE STATISTICS " +
        "FOR COLUMNS r_regionkey, r_name")
      sp.conf.set("spark.sql.cbo.enabled", "true")
      sp.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = leafOrder(optimized)
      assert(reordered != statsless,
        s"CBO should change the join order, still $reordered")
      assert(reordered.indexOf("stat_r2") < reordered.indexOf("stat_o2"),
        s"filtered region must join before the fact: $reordered")
      // and the answer is unchanged by the reorder
      val a = sp.sql(q).collect().map(r => (r.getString(0),
        math.round(r.getDouble(1)))).toSet
      sp.conf.set("spark.sql.cbo.enabled", "false")
      sp.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val b = sp.sql(q).collect().map(r => (r.getString(0),
        math.round(r.getDouble(1)))).toSet
      assert(a == b, "reorder changed the result")
    } finally {
      sp.conf.set("spark.sql.cbo.enabled", "false")
      sp.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      tables.keys.foreach(t => sp.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
