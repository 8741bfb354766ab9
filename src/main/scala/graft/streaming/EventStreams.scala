package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One event row as consumed by the typed stateful operators. */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Per-user running state maintained by [[EventStreams.userRunningStats]]. */
final case class UserStats(
    user_id: Long,
    n_events: Long,
    total_value: Double,
    last_ts: java.sql.Timestamp)

/** Structured Streaming surface over the `events` fixture schema.
  *
  * The reference implements no streaming operators — its test tree runs
  * vanilla Spark's streaming suites with the plugin falling back to row
  * execution (reference: ColumnarPlugin.scala:350 refuses streaming plans;
  * suites under core/src/test/scala/org/apache/spark/sql/streaming). For us
  * Structured
  * Streaming is native: watermarks bound state, windowed aggregations run as
  * partial/final pairs, stream-static joins broadcast the static side, and
  * custom state uses mapGroupsWithState — all of which scale out by key.
  */
object EventStreams {

  /** Watermarked tumbling-window aggregation per event type. */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant (window + slide). */
  def slidingCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows (gap-based, built-in session_window) per user — the
    * streaming twin of the batch gap-and-islands sessionization in
    * operators.Events.sessionize. */
  def sessionWindows(
      events: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Watermarked streaming deduplication on event_id (state is dropped once
    * the watermark passes — bounded memory at scale). */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join (static side broadcast). */
  def enrich(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), Seq("user_id"), "left_outer")

  /** Watermarked STREAM-STREAM interval join: each purchase attributed to
    * the same user's click that preceded it within `attribution`. Both
    * sides carry watermarks and the join condition bounds event time in
    * both directions, so Spark can expire join state — the configuration
    * that stays bounded-memory on an unbounded 100 TB/day stream. (The
    * reference cannot express stream-stream joins at all.) */
  def clickAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      watermark: String = "1 hour",
      attribution: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"),
      col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"),
      col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $attribution"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** LEFT OUTER stream-stream join: like [[clickAttribution]] but
    * unconverted clicks are ALSO emitted (purchase columns null) — which
    * the engine can only do once the watermark proves no matching purchase
    * can still arrive, so each unmatched row is held in state exactly until
    * click_ts + attribution + watermark passes. The canonical funnel-drop
    * query shape on an unbounded stream. */
  def clickAttributionOuter(
      clicks: DataFrame,
      purchases: DataFrame,
      watermark: String = "10 minutes",
      attribution: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"),
      col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"),
      col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $attribution"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Custom keyed state via mapGroupsWithState: per-user running stats.
    * The KeyValueGroupedDataset path the reference can't express natively. */
  def userRunningStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0L)))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(
              uid,
              acc.n_events + 1,
              acc.total_value + e.value,
              if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Milestone record emitted by [[milestones]]. */
  final case class Milestone(
      user_id: Long,
      n_events: Long,
      total_value: Double)

  /** Custom multi-output keyed state via flatMapGroupsWithState: emits one
    * Milestone row each time a user's event count crosses a multiple of
    * `every` — zero, one, or many output rows per invocation, the arity
    * mapGroupsWithState can't express. State is one UserStats per key in the
    * state store, partitioned by user_id (bounded, scales out). */
  def milestones(
      events: Dataset[Event],
      every: Long = 2L): Dataset[Milestone] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, Milestone](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0L)))
          val (next, out) = batch.foldLeft((prev, List.empty[Milestone])) {
            case ((acc, emitted), e) =>
              val upd = UserStats(uid, acc.n_events + 1,
                acc.total_value + e.value,
                if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
              val hit =
                if (upd.n_events % every == 0L)
                  Milestone(uid, upd.n_events, upd.total_value) :: emitted
                else emitted
              (upd, hit)
          }
          state.update(next)
          out.reverseIterator
      }
  }

  /** Spark-4 arbitrary-state v2: the same per-user running stats as
    * [[userRunningStats]], but on the `transformWithState` /
    * [[StatefulProcessor]] API — named state variables resolved from a
    * handle (here one ValueState; a processor can hold several, plus
    * list/map state, TTL, and timers), the state-management surface the
    * mapGroupsWithState generation cannot express. Requires the RocksDB
    * state-store provider (bundled). Output parity with the v1 operator is
    * pinned in StreamingSpec. */
  class RunningStatsProcessor
      extends StatefulProcessor[Long, Event, UserStats] {
    @transient private var stats: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[UserStats]("stats",
        org.apache.spark.sql.Encoders.product[UserStats], TTLConfig.NONE)

    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserStats] = {
      val prev =
        if (stats.exists()) stats.get()
        else UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0L))
      val next = rows.foldLeft(prev) { (acc, e) =>
        UserStats(uid, acc.n_events + 1, acc.total_value + e.value,
          if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
      }
      stats.update(next)
      Iterator.single(next)
    }
  }

  /** [[userRunningStats]] on the transformWithState API (state store v2). */
  def userRunningStatsV2(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** One closed session emitted by [[timedSessions]]. */
  final case class SessionOut(
      user_id: Long, n_events: Long, total_value: Double, last_ts_ms: Long)

  /** Event-time TIMER-driven sessionization on the v2 API: accumulate
    * per-user stats in ValueState and register a watermark timer at
    * last-event-time + gap on every input; when the watermark passes the
    * timer ([[handleExpiredTimer]]) the closed session is emitted and state
    * cleared. This is the state-expiry pattern the v1 API could only
    * approximate with GroupStateTimeout — here the timer registry is
    * explicit, per-key, and watermark-exact. State is bounded: one
    * UserStats + one timer per active user. */
  class SessionTimeoutProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var sess: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[UserStats]("session",
        org.apache.spark.sql.Encoders.product[UserStats], TTLConfig.NONE)

    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val prev =
        if (sess.exists()) sess.get()
        else UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0L))
      val next = rows.foldLeft(prev) { (acc, e) =>
        UserStats(uid, acc.n_events + 1, acc.total_value + e.value,
          if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
      }
      sess.update(next)
      // slide the gap timer: drop any previously registered expiry, arm at
      // the new last-event-time + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(next.last_ts.getTime + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(
        uid: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val out =
        if (sess.exists()) {
          val s = sess.get()
          Iterator.single(
            SessionOut(uid, s.n_events, s.total_value, s.last_ts.getTime))
        } else Iterator.empty
      sess.clear()
      out
    }
  }

  /** Timer-driven sessions over a watermarked event stream (v2 API). */
  def timedSessions(
      events: Dataset[Event],
      watermark: String = "0 seconds",
      gapMs: Long = 30000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One (user, event_type) running count emitted by [[typeCounts]]. */
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** MapState coverage on the v2 API: per-user map of event_type → count.
    * The map lives in the state store KEYED BY (grouping key, user map key)
    * — only touched entries read/write per batch, unlike a ValueState
    * holding a whole Map (which would deserialize every entry every time).
    * Emits the updated (type, count) entries of each batch. */
  class TypeCountProcessor
      extends StatefulProcessor[Long, Event, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val next =
          (if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
           else 0L) + 1L
        counts.updateValue(e.event_type, next)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(uid, t, counts.getValue(t)))
    }
  }

  /** Per-user per-type running counts on MapState (state store v2). */
  def typeCounts(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** One rolling-window summary row emitted by [[recentWindow]]. */
  final case class RecentOut(
      user_id: Long, n_recent: Long, recent_sum: Double, newest_ms: Long)

  /** ListState coverage on the v2 API: each user's last `keep` event
    * values as an explicit bounded list in the state store. ListState
    * appends without deserializing the existing list (unlike a
    * ValueState[Seq]), and the processor re-writes the trimmed tail only
    * when the cap is exceeded — the rolling-window-of-raw-events pattern
    * (fraud windows, rate limiters) that aggregate state can't express. */
  class RecentWindowProcessor(keep: Int)
      extends StatefulProcessor[Long, Event, RecentOut] {
    @transient private var recent: ListState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[(Long, Double)]("recent",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[RecentOut] = {
      rows.foreach(e => recent.appendValue((e.ts.getTime, e.value)))
      val all = recent.get().toSeq.sortBy(_._1)
      val kept = all.takeRight(keep)
      if (kept.size != all.size) recent.put(kept.toArray)
      Iterator.single(RecentOut(uid, kept.size.toLong,
        kept.map(_._2).sum, kept.map(_._1).max))
    }
  }

  /** Per-user rolling window of the last `keep` events (state store v2). */
  def recentWindow(events: Dataset[Event], keep: Int = 3)
      : Dataset[RecentOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentWindowProcessor(keep),
        TimeMode.None(), OutputMode.Update())
  }

  /** Default sink for tests: in-memory table in update mode. */
  def toMemorySink(df: DataFrame, name: String, outputMode: String = "update") =
    df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
}
