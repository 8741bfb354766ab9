package graft

/** Error-output TCs of the reference's string-functions.sql (see
  * GoldenSqltString's exclusion notes) — zero-arity varargs and the
  * ANSI string-length casts whose golden output is an error. */
class GoldenStringErrorsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  private def err(sql: String): String =
    intercept[Exception] { sp.sql(sql).collect() }.getMessage

  test("concat_ws() with no arguments is rejected") {
    // string-functions.sql:2
    val m = err("SELECT concat_ws()")
    assert(m.contains("concat_ws") || m.contains("PARAMETER"), m)
  }

  test("format_string() with no arguments is rejected") {
    // string-functions.sql:3
    val m = err("SELECT format_string()")
    assert(m.contains("format_string") || m.contains("PARAMETER"), m)
  }

  test("left/right with a non-numeric length string raises under ANSI") {
    // string-functions.sql:8-11 — the reference's non-ANSI golden
    // returned NULL; Spark 4 ANSI raises CAST_INVALID_INPUT by design
    val m1 = err("SELECT left('abcd', 'a')")
    assert(m1.contains("CAST_INVALID_INPUT") || m1.contains("cast"), m1)
    val m2 = err("SELECT right('abcd', 'a')")
    assert(m2.contains("CAST_INVALID_INPUT") || m2.contains("cast"), m2)
  }

  test("parameterless count() is rejected under the default conf") {
    // count.sql:43-45 — legal only under
    // spark.sql.legacy.allowParameterlessCount
    val m = err("SELECT count() FROM (VALUES (1)) t(a)")
    assert(m.contains("count") || m.contains("PARAMETER"), m)
  }

  test("lpad/rpad with a non-numeric length raises under ANSI") {
    // string-functions.sql:54-55
    val m1 = err("SELECT lpad('hi', 'invalid_length')")
    assert(m1.contains("CAST_INVALID_INPUT") || m1.contains("cast"), m1)
    val m2 = err("SELECT rpad('hi', 'invalid_length')")
    assert(m2.contains("CAST_INVALID_INPUT") || m2.contains("cast"), m2)
  }
}
