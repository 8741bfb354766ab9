package graft

/** misc-functions.sql TCs with no cross-engine oracle (see
  * GoldenSqltMisc's exclusion list): the typeof battery returns
  * Spark-spelled type names, and assert_true / raise_error golden
  * outputs are errors. */
class GoldenMiscSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  private def one(sql: String): String =
    sp.sql(sql).head.getString(0)

  test("typeof battery returns the Spark type names") {
    // misc-functions.sql:1-7
    assert(one("SELECT typeof(null)") == "void")
    assert(one("SELECT typeof(true)") == "boolean")
    assert(one("SELECT typeof(1Y)") == "tinyint")
    assert(one("SELECT typeof(1S)") == "smallint")
    assert(one("SELECT typeof(1)") == "int")
    assert(one("SELECT typeof(1L)") == "bigint")
    assert(one("SELECT typeof(cast(1.0 as float))") == "float")
    assert(one("SELECT typeof(1.0D)") == "double")
    assert(one("SELECT typeof(1.2)") == "decimal(2,1)")
    assert(one("SELECT typeof(date '1986-05-23')") == "date")
    assert(one("SELECT typeof(timestamp '1986-05-23')") == "timestamp")
    assert(one("SELECT typeof(x'ABCD')") == "binary")
    assert(one("SELECT typeof('SPARK')") == "string")
    assert(one("SELECT typeof(array(1, 2))") == "array<int>")
    assert(one("SELECT typeof(map(1, 2))") == "map<int,int>")
    assert(one("SELECT typeof(named_struct('a', 1, 'b', 'spark'))")
      == "struct<a:int,b:string>")
  }

  test("assert_true passes silently on true, raises on false/null") {
    // misc-functions.sql:9-14
    assert(sp.sql("SELECT assert_true(true), assert_true(boolean(1))")
      .collect().length == 1)
    Seq("assert_true(false)", "assert_true(boolean(0))",
      "assert_true(null)", "assert_true(boolean(null))").foreach { e =>
      val m = intercept[Exception] {
        sp.sql(s"SELECT $e").collect()
      }.getMessage
      assert(m.nonEmpty, e)
    }
    val custom = intercept[Exception] {
      sp.sql("SELECT assert_true(false, 'custom error message')")
        .collect()
    }.getMessage
    assert(custom.contains("custom error message"), custom)
  }

  test("raise_error raises, incl. conditionally inside if()") {
    // misc-functions.sql:16-18
    val m1 = intercept[Exception] {
      sp.sql("SELECT raise_error('error message')").collect()
    }.getMessage
    assert(m1.contains("error message"), m1)
    val m2 = intercept[Exception] {
      sp.sql("SELECT if(v > 5, raise_error('too big: ' || v), v + 1) " +
        "FROM (VALUES (1), (8), (2)) AS t(v)").collect()
    }.getMessage
    assert(m2.contains("too big"), m2)
    // the non-raising rows alone pass
    val ok = sp.sql("SELECT if(v > 5, raise_error('x'), v + 1) " +
      "FROM (VALUES (1), (2)) AS t(v)").collect().map(_.getInt(0)).sorted
    assert(ok.toSeq == Seq(2, 3))
  }

  test("table-alias arity mismatches and renamed-away columns reject") {
    // table-aliases.sql error TCs
    Seq("SELECT * FROM (VALUES (1, 1)) testData(a, b), " +
          "LATERAL (SELECT 1) x(c1, c2, c3)",
      "SELECT * FROM (SELECT 1 AS a, 2 AS b) AS t(col1)",
      "SELECT * FROM (SELECT 1 AS a, 2 AS b) AS t(col1, col2, col3)",
      "SELECT a FROM (SELECT 1 AS a, 2 AS b) AS t(c, d)")
      .foreach { q =>
        val m = intercept[Exception] { sp.sql(q).collect() }.getMessage
        assert(m.nonEmpty, q)
      }
  }

  test("invalid LIMIT expressions are rejected") {
    // limit.sql error TCs: negative, NULL, non-integer, non-foldable
    Seq("SELECT * FROM (VALUES (1)) t(key) LIMIT -1",
      "SELECT * FROM (VALUES (1)) t(key) LIMIT CAST(NULL AS INT)",
      "SELECT * FROM (VALUES (1)) t(key) LIMIT key > 3",
      "SELECT * FROM (VALUES (1)) t(key) LIMIT true",
      "SELECT * FROM (VALUES (1)) t(key) LIMIT 'a'")
      .foreach { q =>
        val m = intercept[Exception] { sp.sql(q).collect() }.getMessage
        assert(m.nonEmpty, q)
      }
  }

  test("string(1, 2) arity and bare GROUP BY WITH ROLLUP are rejected") {
    // sql-compatibility-functions.sql:12 / grouping_set.sql tail
    val m1 = intercept[Exception] {
      sp.sql("SELECT string(1, 2)").collect()
    }.getMessage
    assert(m1.nonEmpty)
    val m2 = intercept[Exception] {
      sp.sql("SELECT a, count(b) FROM (VALUES (1, 1)) t(a, b) " +
        "GROUP BY WITH ROLLUP").collect()
    }.getMessage
    assert(m2.nonEmpty)
  }
}
