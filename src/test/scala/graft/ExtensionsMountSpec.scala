package graft

import org.apache.spark.sql.functions._

/** The spark.sql.extensions mount (graft.plans.GraftExtensions) in
  * ISOLATION: a fresh newSession() rebuilds SessionState from the injected
  * extensions with EMPTY experimental.extraStrategies, so anything that
  * works there is powered by the mount alone — not by the defensive
  * per-session registration path (GraftFunctions.ensureRegistered). */
class ExtensionsMountSpec extends GraftSpecBase {

  private val sp = TestSpark.spark

  test("session is built with the extensions mount") {
    assert(sp.conf.get("spark.sql.extensions")
      .contains("graft.plans.GraftExtensions"))
  }

  test("injected SQL functions resolve in a fresh child session") {
    val s2 = sp.newSession()
    val r = s2.sql(
      "SELECT simhash64(array('a','b')) AS h, " +
        "kll_quantile(v, 0.5D) AS m FROM (SELECT CAST(7.0 AS DOUBLE) AS v)")
      .collect()
    assert(r.length == 1 && r(0).getDouble(1) == 7.0)
  }

  test("injected planner strategy plans TopKPerGroup without the defensive path") {
    val s2 = sp.newSession()
    import s2.implicits._
    val child = Seq(("a", 1L, 1.0), ("a", 2L, 5.0), ("b", 3L, 2.0))
      .toDF("g", "tie", "v")
    // build the node directly via Bridge — ops.topKPerGroup would call
    // ensureRegistered and defeat the isolation
    val df = org.apache.spark.sql.graft.Bridge.ofRows(
      s2, graft.plans.TopKPerGroup(Seq("g"), "v", "tie", 1,
        child.queryExecution.analyzed))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("b", 3L)))
  }

  test("injected resolution rule lowers CosineTopKJoin in a fresh session") {
    val s2 = sp.newSession()
    import s2.implicits._
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("qid", "qe")
    val c = Seq((1L, Seq(1.0f, 0.1f)), (2L, Seq(-1.0f, 0.0f)))
      .toDF("cid", "ce")
    val top = ops.cosineTopK(q, c, 1)
      .select(col("qid"), col("cid")).collect()
    assert(top.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((0L, 1L)))
  }
}
