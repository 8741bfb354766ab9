package graft

import org.apache.spark.sql.functions._

/** JDBC source/sink (SURVEY §2.1 last row — the reference inherits it from
  * Spark untouched; tests: core/src/test/.../jdbc/JDBCSuite.scala). Embedded
  * Derby (shipped with Spark for the Hive metastore) stands in for the
  * external database. */
class JdbcSourceSpec extends GraftSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("jdbc write + read round-trip with predicate pushdown") {
    val nation = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    nation.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "nation_jdbc").mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "nation_jdbc").load()
      .filter(col("n_regionkey") === 1)
    // predicate reaches the JDBC source (PushedFilters in the v1 scan)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"expected the filter pushed to JDBC:\n$plan")
    val got = back.collect().map(_.get(0).toString.toLong).sorted
    val want = nation.filter(col("n_regionkey") === 1)
      .collect().map(_.get(0).toString.toLong).sorted
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("jdbc partitioned parallel read") {
    val orders = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(500)
    orders.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "orders_jdbc").mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "orders_jdbc")
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "0").option("upperBound", "10000000")
      .option("numPartitions", "4")
      .load()
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 500)
  }
}
