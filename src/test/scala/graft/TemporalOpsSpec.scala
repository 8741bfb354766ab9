package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Behavioral pins for the temporal operators: multi-touch attribution's
  * exact-conservation invariant and the point-in-time join's interval
  * semantics — the properties the DuckDB oracle replay states only
  * implicitly. */
class TemporalOpsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("linearAttribution: credits conserve value exactly per conversion") {
    // conv of 100.01 (10001 cents) split over 3 touches: 3333+3333+3335 —
    // the remainder (2) lands on the LAST touch, and the sum is EXACT
    val events = Seq(
      (1L, 7L, "view", ts("2026-01-01 10:00:00"), 0.0),
      (2L, 7L, "click", ts("2026-01-01 11:00:00"), 0.0),
      (3L, 7L, "view", ts("2026-01-01 12:00:00"), 0.0),
      (4L, 7L, "purchase", ts("2026-01-02 09:00:00"), 100.01),
      // a touch OUTSIDE the 7-day lookback: never credited
      (5L, 8L, "click", ts("2025-12-01 10:00:00"), 0.0),
      (6L, 8L, "purchase", ts("2026-01-02 09:00:00"), 50.0),
      // a touch AFTER the conversion: never credited
      (7L, 9L, "view", ts("2026-01-03 10:00:00"), 0.0),
      (8L, 9L, "purchase", ts("2026-01-02 09:00:00"), 25.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val credited = operators.Events.linearAttribution(
      events, "purchase", Seq("view", "click"), lookbackDays = 7)
    val rows = credited.select("conv_id", "touch_id", "credit_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only user 7's conversion has in-window touches
    assert(rows.map(_._1).toSet == Set(4L), rows.mkString(", "))
    val byTouch = rows.map(t => t._2 -> t._3).toMap
    assert(byTouch == Map(1L -> 3333L, 2L -> 3333L, 3L -> 3335L),
      byTouch.toString) // remainder -> latest touch (id 3)
    assert(byTouch.values.sum == 10001L, "conservation: sum == conv cents")
  }

  test("pitJoin: half-open [from, to) interval picks exactly one version") {
    val dim = Seq(
      (1L, "v1", ts("1990-01-01 00:00:00"), ts("2026-06-01 00:00:00")),
      (1L, "v2", ts("2026-06-01 00:00:00"), ts("2099-01-01 00:00:00"))
    ).toDF("key", "payload", "valid_from", "valid_to")
    val fact = Seq(
      (10L, 1L, ts("2026-05-31 23:59:59")),  // last instant of v1
      (11L, 1L, ts("2026-06-01 00:00:00")),  // boundary -> v2 (half-open)
      (12L, 1L, ts("2026-07-01 00:00:00")),  // inside v2
      (13L, 2L, ts("2026-07-01 00:00:00"))   // unknown key -> dropped
    ).toDF("fact_id", "fk", "ts")
    val got = operators.Mutations.pitJoin(
        fact, dim, "fk", "key", "ts", "valid_from", "valid_to")
      .select("fact_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "v1", 11L -> "v2", 12L -> "v2"), got.toString)
    // exactly one version per fact row: no interval overlap fan-out
    val n = operators.Mutations.pitJoin(
      fact, dim, "fk", "key", "ts", "valid_from", "valid_to").count()
    assert(n == 3L)
  }

  test("driftReport: 0 for identical shapes, 1000 for disjoint, 0 guard") {
    val cut = "2026-01-10 00:00:00"
    def ev(key: String, t: String, v: Long) = (key, ts(t), v)
    // identical value multisets in both epochs -> tv = 0
    val same = Seq(
      ev("a", "2026-01-05 00:00:00", 10), ev("a", "2026-01-05 00:00:00", 300),
      ev("a", "2026-01-15 00:00:00", 10), ev("a", "2026-01-15 00:00:00", 300),
      // every epoch-B value in a different log2 bucket -> tv = 1000
      ev("b", "2026-01-05 00:00:00", 7), ev("b", "2026-01-05 00:00:00", 6),
      ev("b", "2026-01-15 00:00:00", 900), ev("b", "2026-01-15 00:00:00", 901),
      // key entirely missing from epoch B -> guarded 0, n_b carries it
      ev("c", "2026-01-05 00:00:00", 5)
    ).toDF("k", "ts", "vc")
    val r = operators.Profiling.driftReport(same, "k", "vc", "ts", cut)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("n_a"), x.getAs[Long]("n_b"),
          x.getAs[Long]("tv_permille"))).toMap
    assert(r("a") == ((2L, 2L, 0L)), r.toString)
    assert(r("b") == ((2L, 2L, 1000L)), r.toString)
    assert(r("c") == ((1L, 0L, 0L)), r.toString)
  }
}
