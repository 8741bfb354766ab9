package graft

/** The "Invalid window frame" block of the reference's window.sql
  * (native-sql-engine/core/src/test/resources/sql-tests/inputs/window.sql:
  * 64-78) — statements whose GOLDEN OUTPUT is an analysis error, pinned
  * here as error-class assertions (the oracle comparator can only check
  * row sets; see GoldenSqltWindow's exclusion list). */
class GoldenWindowErrorsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  private val testdata = """(VALUES
    (1, 'a'), (2, 'a'), (CAST(NULL AS INT), 'b'), (3, 'b')
  ) AS t(val, cate)"""

  private def err(sql: String): String =
    intercept[Exception] { sp.sql(sql).collect() }.getMessage

  test("frame starting at UNBOUNDED FOLLOWING is rejected") {
    val m = err(s"""SELECT count(val) OVER (PARTITION BY cate
      ROWS BETWEEN UNBOUNDED FOLLOWING AND 1 FOLLOWING) FROM $testdata""")
    assert(m.contains("FOLLOWING") || m.contains("frame"), m)
  }

  test("RANGE frame without ORDER BY is rejected") {
    val m = err(s"""SELECT count(val) OVER (PARTITION BY cate
      RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING) FROM $testdata""")
    assert(m.contains("RANGE_FRAME_WITHOUT_ORDER") || m.contains("ORDER"),
      m)
  }

  test("offset RANGE frame over a multi-column ORDER BY is rejected") {
    val m = err(s"""SELECT count(val) OVER (PARTITION BY cate
      ORDER BY val, cate RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING)
      FROM $testdata""")
    assert(m.contains("RANGE_FRAME_MULTI_ORDER") || m.contains("multi"), m)
  }

  test("inverted frame bounds (1 FOLLOWING .. 1 PRECEDING) are rejected") {
    val m = err(s"""SELECT count(val) OVER (PARTITION BY cate ORDER BY val
      RANGE BETWEEN 1 FOLLOWING AND 1 PRECEDING) FROM $testdata""")
    assert(m.contains("lower bound") || m.contains("FRAME") ||
      m.contains("frame"), m)
  }

  test("non-numeric RANGE bound against a numeric order key is rejected") {
    val m = err(s"""SELECT count(val) OVER (PARTITION BY cate ORDER BY val
      RANGE BETWEEN CURRENT ROW AND current_date PRECEDING)
      FROM $testdata""")
    assert(m.nonEmpty)
  }

  test("window aggregate with FILTER predicate is rejected by Spark 4") {
    // window.sql:121-124 — runs in neither the reference fork nor Spark 4
    val m = err(s"""SELECT count(val) FILTER (WHERE val > 1)
      OVER (PARTITION BY cate) FROM $testdata""")
    assert(m.toLowerCase.contains("filter"), m)
  }

  test("ROWS frame bound past INT range is rejected by Spark 4") {
    // window.sql:45-47 ports with INT_MAX instead (GoldenSqltWindow
    // exclusion): the analyzer types ROWS bounds as INT
    val m = err(s"""SELECT sum(val) OVER (PARTITION BY cate ORDER BY val
      ROWS BETWEEN CURRENT ROW AND 2147483648 FOLLOWING) FROM $testdata""")
    assert(m.contains("SPECIFIED_WINDOW_FRAME") || m.contains("INT"), m)
  }
}
