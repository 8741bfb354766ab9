package graft

/** Error-output TCs of the reference's group-analytics.sql and
  * higher-order-functions.sql (see GoldenSqltGroupHof's exclusion list)
  * — statements whose golden output is an analysis/parse error. */
class GoldenGroupHofErrorsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  private val sales = """(VALUES ('a', 2012, 10), ('b', 2013, 20))
    AS t(course, year, earnings)"""

  private def err(sql: String): String =
    intercept[Exception] { sp.sql(sql).collect() }.getMessage

  test("GROUPING on a plain GROUP BY is rejected") {
    // group-analytics.sql:44 — grouping() without CUBE/ROLLUP/SETS
    val m = err(
      s"SELECT course, GROUPING(course) FROM $sales GROUP BY course, year")
    assert(m.contains("GROUPING") || m.contains("grouping"), m)
  }

  test("GROUPING_ID on a plain GROUP BY is rejected") {
    // group-analytics.sql:45
    val m = err(s"SELECT course, GROUPING_ID(course, year) FROM $sales " +
      "GROUP BY course, year")
    assert(m.contains("GROUPING") || m.contains("grouping"), m)
  }

  test("GROUPING in HAVING without grouping sets is rejected") {
    // group-analytics.sql:49-50
    val m = err(s"SELECT course FROM $sales GROUP BY course, year " +
      "HAVING GROUPING(course) > 0")
    assert(m.contains("GROUPING") || m.contains("grouping"), m)
  }

  test("lambda outside a higher-order function is rejected") {
    // higher-order-functions.sql:14 — upper(x -> x)
    val m = err("SELECT upper(x -> x) AS v")
    assert(m.toLowerCase.contains("lambda") ||
      m.contains("INVALID_LAMBDA"), m)
  }

  test("'all' works as a lambda parameter even under ANSI mode") {
    // higher-order-functions.sql:94-95 — the reference's comment scopes
    // these to !ansi, but Spark 4's lambda-parameter grammar accepts the
    // soft keyword either way; the value rows are ported in
    // q_golden_sqlt_hof_maps
    val r = sp.sql("SELECT to_json(transform(array(32, 97), " +
      "all -> all * all)) AS v").head.getString(0)
    assert(r == "[1024,9409]", r)
  }
}
