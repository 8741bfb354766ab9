package graft

import graft.operators.TpcdsVerbatim

/** Meaningfulness pins for the verbatim TPC-DS port
  * (operators/TpcdsVerbatim.scala): the texts must run UNMODIFIED and the
  * synthesized micro-schema must be selective-but-hitting — every query
  * returns rows at the driver's sf0.01 gate scale, so the oracle compare
  * is never vacuously-empty-vs-empty. Also pins the fixture shape. */
class TpcdsVerbatimSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  private val gateDir = "/root/testdata/sf0.01"

  test("all 14 verbatim texts return rows at the sf0.01 gate scale") {
    val counts = TpcdsVerbatim.queryNames.map { q =>
      q -> TpcdsVerbatim.run(sp, gateDir, q).count()
    }
    counts.foreach { case (q, n) =>
      assert(n > 0, s"$q returned no rows — fixture no longer hits it")
    }
  }

  test("fixture tables have the designed shapes at sf0.01") {
    val s = sp.newSession()
    Tables.registerAll(s, gateDir)
    Seq("orders", "lineitem", "part", "supplier").foreach(t =>
      s.table(t).createOrReplaceTempView(s"tpch_$t"))
    TpcdsVerbatim.fixtures.foreach { case (n, sql) =>
      s.sql(sql).createOrReplaceTempView(n) }
    assert(s.table("date_dim").count() == 1500)
    assert(s.table("store").count() == 6)
    assert(s.table("household_demographics").count() == 20)
    assert(s.table("time_dim").count() == 200)
    assert(s.table("item").count() == 400)
    assert(s.table("customer").count() == 1500)
    assert(s.table("customer_address").count() == 600)
    // referential closure: every store_sales fk resolves at gate scale
    val dangling = s.sql("""SELECT count(*) FROM store_sales ss
      LEFT JOIN item i ON ss.ss_item_sk = i.i_item_sk
      LEFT JOIN date_dim d ON ss.ss_sold_date_sk = d.d_date_sk
      LEFT JOIN store st ON ss.ss_store_sk = st.s_store_sk
      LEFT JOIN customer c ON ss.ss_customer_sk = c.c_customer_sk
      WHERE i.i_item_sk IS NULL OR d.d_date_sk IS NULL
         OR st.s_store_sk IS NULL OR c.c_customer_sk IS NULL""")
      .head.getLong(0)
    assert(dangling == 0L, s"$dangling store_sales rows dangle")
  }

  test("the shipped texts are the reference's, character for character") {
    // spot-pin two: a drifted text would silently turn 'verbatim' into
    // 'adapted'
    val q3 = TpcdsVerbatim.queryText("q3")
    assert(q3.contains("FROM date_dim dt, store_sales, item"))
    assert(q3.contains("AND item.i_manufact_id = 128"))
    val q88 = TpcdsVerbatim.queryText("q88")
    assert(q88.count(_ == ',') > 20 && q88.contains("h8_30_to_9"))
  }
}
