package graft

import graft.operators.{GoldenCoercion, GoldenPg}
import graft.operators.GoldenCoercion.Stmt

/** Error pins + inventory for the postgreSQL/ golden port
  * (operators/GoldenPg.scala), mirroring GoldenCoercionSpec: each
  * battery's statement stream replays in file order (table DML through
  * the GoldenPg temp-view interpreter), error TCs assert their pinned
  * Spark 4.1 exception class, value TCs must still run clean at their
  * stream position, and the inventory test pins the per-file statement
  * partition against the reference's golden .out statement counts. */
class GoldenPgSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  for (base <- GoldenPg.bases) {
    test(s"pg $base: error TCs raise the pinned exception class in order") {
      val sess = sp.newSession() // fresh-session-per-file, no leakage
      GoldenPg.registerFixtures(sess)
      val cat = new GoldenPg.PgCatalog
      val (_, stmts) = GoldenCoercion.loadAll(s"pg_$base")
      var checked = 0
      GoldenCoercion.withConfRestore(sess) { stmts.foreach {
        case Stmt(_, "setup", s) =>
          GoldenPg.executeSetup(sess, cat, s)
        case Stmt(_, "tc", s) =>
          sess.sql(s).collect()
        case Stmt(_, kind, s) if kind.startsWith("skip:") =>
          sess.sql(s).collect()
        case Stmt(id, kind, s) =>
          val expected = kind.stripPrefix("err:")
          // a failing DML statement (e.g. a width-mismatch INSERT whose
          // golden outcome is an AnalysisException) must fail through the
          // same interpreter path the runtime uses
          val up = s.trim.toUpperCase
          val isQuery = up.startsWith("SELECT") || up.startsWith("WITH") ||
            up.startsWith("VALUES") || up.startsWith("TABLE") ||
            up.startsWith("(")
          val e = intercept[Throwable] {
            if (isQuery) sess.sql(s).collect()
            else GoldenPg.executeSetup(sess, cat, s)
          }
          assert(e.getClass.getSimpleName == expected,
            s"$base/$id: expected $expected, got " +
              s"${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
          checked += 1
      } }
      val (_, _, declaredErrs) = GoldenCoercion.declaredCounts(s"pg_$base")
      assert(checked == declaredErrs)
    }
  }

  test("pg inventory: every statement of every file is accounted for") {
    // statement counts from the reference's golden .out files
    // (results/postgreSQL); insert.sql and create_view.sql are excluded
    // (catalog/metadata DDL), aggregates_part4 runs 0 statements upstream
    val expectedTotals = Map(
      "aggregates_part1" -> 44, "aggregates_part2" -> 29,
      "aggregates_part3" -> 5, "boolean" -> 92, "case" -> 35,
      "comments" -> 6, "date" -> 60, "float4" -> 43, "float8" -> 95,
      "groupingsets" -> 55, "int2" -> 35, "int4" -> 53, "int8" -> 85,
      "interval" -> 24, "join" -> 181, "limit" -> 7, "numeric" -> 592,
      "select" -> 37, "select_distinct" -> 19, "select_having" -> 22,
      "select_implicit" -> 38, "strings" -> 121, "text" -> 42,
      "timestamp" -> 30, "union" -> 72, "window_part1" -> 43,
      "window_part2" -> 31, "window_part3" -> 30, "window_part4" -> 39,
      "with" -> 51)
    assert(GoldenPg.bases.toSet == expectedTotals.keySet)
    for (base <- GoldenPg.bases) {
      val (_, stmts) = GoldenCoercion.loadAll(s"pg_$base")
      assert(stmts.length == expectedTotals(base),
        s"$base: ${stmts.length} statements, reference golden has " +
          s"${expectedTotals(base)}")
    }
  }

  test("pg fixtures match the regression-data row counts") {
    GoldenPg.registerFixtures(sp)
    assert(sp.table("onek").count() == 1000)
    assert(sp.table("tenk1").count() == 10000)
    assert(sp.table("aggtest").count() == 4)
    assert(sp.table("testdata").count() == 100)
  }
}
