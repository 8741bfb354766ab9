package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` fixture — the batch twins of the
  * Structured Streaming operators in graft.streaming.EventStreams (tumbling
  * windows, sessionization, dedup) plus funnel analysis. At scale every
  * query here shuffles once on user_id (or the window key) and the session
  * assignment is the classic gap-and-islands pattern: lag → new-session flag
  * → running sum, three window functions over one user_id partition, no
  * self-join.
  *
  * `ts` arrives as nanosecond parquet (normalized in Tables.apply); outputs
  * emit epoch millis for cross-engine comparison.
  */
object Events {

  /** Tumbling 1-hour windows per event type (batch twin of
    * EventStreams.windowedCounts). */
  val tumbling = QueryDef(
    "q_events_tumbling",
    (spark, dir) => {
      Tables(spark, dir, "events")
        .groupBy(
          window(col("ts"), "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .select(
          unix_millis(col("w.start").cast("timestamp")).as("win_start_ms"),
          col("event_type"), col("n"), col("sum_value"))
    },
    Some("""
      SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_ms,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type"""))

  /** Sliding 2-hour windows every hour (batch twin of the streaming sliding
    * aggregation) — each event contributes to two windows; the oracle
    * replicates rows into both slide offsets. */
  val sliding = QueryDef(
    "q_events_sliding",
    (spark, dir) => {
      Tables(spark, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          unix_millis(col("w.start").cast("timestamp")).as("win_start_ms"),
          col("event_type"), col("n"))
    },
    Some("""
      SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)
                      - k * INTERVAL 1 HOUR) AS win_start_ms,
             event_type, count(*) AS n
      FROM (SELECT ts, event_type, unnest([0, 1]) AS k FROM events)
      GROUP BY 1, 2"""))

  /** Sessionization (gap > 30 min starts a new session): lag → flag →
    * running sum → per-session aggregate. */
  val sessionize = QueryDef(
    "q_events_sessionize",
    (spark, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val e = Tables(spark, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("sess_idx", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      e.groupBy(col("user_id"), col("sess_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          unix_millis(min(col("ts"))).as("sess_start_ms"),
          unix_millis(max(col("ts"))).as("sess_end_ms"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_sess_events"),
          max(col("sess_end_ms") - col("sess_start_ms")).as("max_sess_dur_ms"))
    },
    Some("""
      SELECT user_id, count(*) AS n_sessions,
             CAST(max(n_events) AS BIGINT) AS max_sess_events,
             CAST(max(sess_end_ms - sess_start_ms) AS BIGINT)
               AS max_sess_dur_ms
      FROM (
        SELECT user_id, sess_idx, count(*) AS n_events,
               epoch_ms(min(ts)) AS sess_start_ms,
               epoch_ms(max(ts)) AS sess_end_ms
        FROM (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS sess_idx
          FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ts IS NULL
                          OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                        THEN 1 ELSE 0 END AS new_sess
            FROM (
              SELECT user_id, ts, event_id,
                     lag(ts, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_ts
              FROM events)))
        GROUP BY user_id, sess_idx)
      GROUP BY user_id"""))

  /** Funnel: users whose first view < first click < first purchase. */
  val funnel = QueryDef(
    "q_events_funnel",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val firsts = e.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      firsts.agg(
        count(lit(1)).as("n_users"),
        count(when(col("t_view").isNotNull, 1)).as("n_view"),
        count(when(col("t_view") < col("t_click"), 1)).as("n_view_click"),
        count(when(col("t_view") < col("t_click") &&
          col("t_click") < col("t_buy"), 1)).as("n_full_funnel"))
    },
    Some("""
      SELECT count(*) AS n_users,
             count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
             count(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
             count(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 END)
               AS n_full_funnel
      FROM (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id)"""))

  /** Batch dedup on event_id keeping the earliest row (twin of streaming
    * dropDuplicatesWithinWatermark). */
  val dedupBatch = QueryDef(
    "q_events_dedup",
    (spark, dir) => {
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("ts"), col("user_id"))
      Tables(spark, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""
      SELECT event_type, count(*) AS n
      FROM (SELECT event_type,
                   row_number() OVER (PARTITION BY event_id
                                      ORDER BY ts, user_id) AS rn
            FROM events)
      WHERE rn = 1
      GROUP BY event_type"""))

  /** Spark-native `session_window` (the dedicated session operator; the
    * manual gap-and-islands in [[sessionize]] is its window-function twin).
    * Sessions merge while the inter-event gap is < 30 min; window end =
    * last event + gap. Oracle mirrors that semantics exactly (note `>=` to
    * split: merge-on-strictly-less). */
  val sessionWindow = QueryDef(
    "q_events_session_window",
    (spark, dir) => {
      Tables(spark, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_millis(col("sw.start").cast("timestamp")).as("sess_start_ms"),
          unix_millis(col("sw.end").cast("timestamp")).as("sess_end_ms"),
          col("n_events"))
    },
    Some("""
      SELECT user_id, epoch_ms(min(ts)) AS sess_start_ms,
             epoch_ms(max(ts)) + 1800000 AS sess_end_ms,
             count(*) AS n_events
      FROM (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS sess_idx
        FROM (
          SELECT user_id, ts, event_id,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000
                      THEN 1 ELSE 0 END AS new_sess
          FROM (
            SELECT user_id, ts, event_id,
                   lag(ts, 1) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_ts
            FROM events)))
      GROUP BY user_id, sess_idx"""))

  /** Day-over-day retention: per active day, how many users return the
    * next day — the canonical cohort/engagement query of event analytics.
    * Distinct user-days reduce first (one shuffle), then a self equi-join
    * on (user, day+1) — bounded by actives, never the raw event volume.
    * Days are integer epoch-days (ms ÷ 86400000 in exact integer space);
    * the timestamp spelling is the only dialect split. */
  val retention = {
    def text(epochMs: String) =
      s"""WITH d AS (
           SELECT DISTINCT user_id,
                  CAST(floor($epochMs / 86400000) AS BIGINT) AS day
           FROM events)
         SELECT a.day AS day,
                count(*) AS n_active,
                CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_retained_next
         FROM d a LEFT JOIN d b
           ON a.user_id = b.user_id AND b.day = a.day + 1
         GROUP BY a.day"""
    QueryDef.sql("q_events_retention",
      text("unix_millis(ts)"), text("epoch_ms(ts)"))
  }

  /** Time-series gap-fill + forward-fill — the resample step of a metrics
    * pipeline: per-user daily activity, with MISSING days materialized at
    * zero events and the last observed daily value carried forward. The
    * scale shape: per-key day spans explode bounded by each key's own range
    * (never a global calendar cross join), one left join on (user, day), one
    * forward-fill window per user partition. Value sums are exact cents. */
  val gapfill = QueryDef(
    "q_events_gapfill",
    (spark, dir) => {
      val daily = Tables(spark, dir, "events")
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("day_cents"))
      val days = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(daily, Seq("user_id", "day"), "left_outer")
        .select(col("user_id"), col("day").cast("string").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("day_cents"), ignoreNulls = true).over(w)
            .as("ffill_cents"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS day_cents
        FROM events WHERE user_id < 10 GROUP BY user_id, CAST(ts AS DATE)),
      days AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1,
                 INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
              FROM daily GROUP BY user_id)),
      filled AS (
        SELECT d.user_id, d.day, coalesce(y.n_events, 0) AS n_events,
               last_value(y.day_cents IGNORE NULLS)
                 OVER (PARTITION BY d.user_id ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS ffill_cents
        FROM days d LEFT JOIN daily y
          ON d.user_id = y.user_id AND d.day = y.day)
      SELECT user_id, CAST(day AS VARCHAR) AS day, n_events, ffill_cents
      FROM filled"""))

  /** Peak activity hour per event type — the argmax-with-tiebreak pattern
    * (count DESC, hour ASC) spelled as a window group-limit, which Spark
    * plans with WindowGroupLimit pushdown (bounded per-partition state,
    * never a full sort of the hour matrix). */
  val peakHour = QueryDef.sqlSame(
    "q_events_peak_hour",
    """WITH h AS (
         SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS n
         FROM events GROUP BY event_type, hour(ts))
       SELECT event_type, hr AS peak_hour, n AS n_events
       FROM (SELECT event_type, hr, n,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY n DESC, hr) AS rn
             FROM h)
       WHERE rn = 1""")

  /** Telemetry burst collapse: retries/double-clicks emit the same
    * (user, event_type) within seconds — collapse each CHAIN of events
    * whose consecutive gaps are < 5 s down to its first event (classic
    * gaps-and-islands: lag → new-burst flag → running count), then
    * census the compression per event type. One shuffle on the
    * (user, type) window key, nothing global. */
  val burstCollapse = QueryDef(
    "q_events_burst_collapse",
    (spark, dir) => {
      val byKey = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val flagged = Tables(spark, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byKey))
        .withColumn("new_burst",
          when(col("prev_ts").isNull ||
            unix_millis(col("ts")) - unix_millis(col("prev_ts")) >= 5000L,
            1L).otherwise(0L))
        .withColumn("burst_id", sum(col("new_burst")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy(col("event_type"), col("user_id"), col("burst_id"))
        .agg(count(lit(1)).as("blen"))
        .groupBy(col("event_type"))
        .agg(sum(col("blen")).as("n_events"),
          count(lit(1)).as("n_kept"),
          max(col("blen")).as("max_burst_len"))
    },
    Some("""
      SELECT event_type, CAST(sum(blen) AS BIGINT) AS n_events,
             count(*) AS n_kept, CAST(max(blen) AS BIGINT) AS max_burst_len
      FROM (
        SELECT event_type, user_id, burst_id, count(*) AS blen
        FROM (
          SELECT event_type, user_id,
                 sum(new_burst) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS burst_id
          FROM (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN prev_ts IS NULL
                          OR epoch_ms(ts) - epoch_ms(prev_ts) >= 5000
                        THEN 1 ELSE 0 END AS new_burst
            FROM (
              SELECT user_id, event_type, ts, event_id,
                     lag(ts, 1) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS prev_ts
              FROM events)))
        GROUP BY event_type, user_id, burst_id)
      GROUP BY event_type"""))

  /** Robust anomaly detection: per-type median/MAD outlier census — the
    * monitoring primitive that survives the skewed, heavy-tailed value
    * distributions where mean/stddev z-scores drown (one fat purchase
    * shifts a mean; it cannot shift a median). Flag = |v − median| >
    * 3·MAD, the standard robust-z cut.
    *
    * Exactness discipline: values go to int64 cents ([[graft.Exact]]),
    * and because an interpolated median of integers is always a multiple
    * of ½, the median is carried as `med_x2 = 2·percentile` and the MAD
    * as `mad_x4 = 2·percentile(2·|v−med|)` — integers end to end, so the
    * DuckDB replay (quantile_cont spells Spark's percentile) is bit-exact
    * with no float tolerance. The outlier cut |v−med| > 3·MAD multiplies
    * through to 2·dev_x2 > 3·mad_x4.
    *
    * Scale shape (reworked r9 — was two full-corpus exact-percentile
    * aggregates, each buffering every group value, plus a corpus-wide
    * join; 2.1× gate drift): ONE map-side-combinable `(key, value)`
    * HISTOGRAM aggregate touches the corpus, and every later stage —
    * median, deviation histogram, MAD, outlier census — runs over the
    * histogram, whose size is bounded by the DISTINCT value domain, not
    * the row count. A duplicated/replicated corpus collapses in the
    * partial aggregate; the exact interpolated medians come from
    * cumulative-weight windows over the histogram (the value pair at
    * 0-indexed ranks `(n−1) div 2` and `n div 2`, whose sum IS the
    * ×2-carried median — for odd n the ranks coincide and the sum is
    * 2·v). Integer end to end. */
  /** Library form: per-`keyCol` robust outlier census over an integer
    * value column. Output: (key, n, med_x2, mad_x4, n_outliers) — the
    * median carried ×2 and the MAD ×4 so interpolated medians of
    * integers stay integers (see [[madOutliers]]). */
  def madOutlierCensus(df: DataFrame, keyCol: String,
      intCol: String): DataFrame = {
    val e = df.select(col(keyCol), col(intCol).cast("long").as("vc"))
    // the one corpus-wide stage: value histogram (partial-agg combines
    // duplicates map-side, so replicas never cross the shuffle). persist:
    // two consumers (median, deviation histogram) must not re-scan the
    // corpus — released by the runner's per-query clearCache, same
    // contract as triangles/basket. Library callers outside the runner
    // should clearCache()/catalog.clearCache() after materializing, or
    // this one histogram-sized cache entry accumulates per call.
    val hist = e.groupBy(col(keyCol), col("vc"))
      .agg(count(lit(1)).as("w"))
      .persist()
    // weighted median from cumulative weights: v_at(k) is the value whose
    // cumulative range covers rank k (0-indexed)
    def medianX2(h: DataFrame, vCol: String): DataFrame = {
      val wCum = Window.partitionBy(col(keyCol)).orderBy(col(vCol))
      h.withColumn("cum", sum(col("w")).over(wCum))
        .withColumn("n", sum(col("w")).over(Window.partitionBy(col(keyCol))))
        .withColumn("k1", expr("(n - 1) div 2")) // 0-indexed lower rank
        .withColumn("k2", expr("n div 2"))       // == k1 for odd n
        .groupBy(col(keyCol))
        .agg(min(col("n")).as("n"),
          sum(when(col("cum") - col("w") <= col("k1") &&
            col("k1") < col("cum"), col(vCol)).otherwise(0L))
            .plus(sum(when(col("cum") - col("w") <= col("k2") &&
              col("k2") < col("cum"), col(vCol)).otherwise(0L)))
            .as("med_x2"))
    }
    val med = medianX2(hist, "vc")
    // deviation HISTOGRAM (|2v − med| folds symmetric values together) —
    // derived from the value histogram, so it is histogram-sized, and the
    // med frame it joins is |keys|-rows (broadcast). med's n and med_x2
    // are constant per key, so they ride through the regroup via min()
    val devHist = hist.join(broadcast(med), keyCol)
      .withColumn("dev_x2", abs(lit(2L) * col("vc") - col("med_x2")))
      .groupBy(col(keyCol), col("dev_x2"))
      .agg(sum(col("w")).as("w"), min(col("med_x2")).as("med_x2"),
        min(col("n")).as("n"))
    // MAD median AND outlier census in ONE pass over devHist (r10 — was a
    // second persist + two broadcast joins): the cumulative-weight window
    // locates the MAD rank rows, a full-partition window sums their
    // contribution into a per-row mad_x4, and the final groupBy classifies
    // each deviation row against it. Both windows share the (key, dev_x2)
    // sort, so devHist is consumed exactly once — no persist needed.
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("dev_x2"))
    val wAll = Window.partitionBy(col(keyCol)).orderBy(col("dev_x2"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    devHist
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("k1", expr("(n - 1) div 2")) // 0-indexed lower rank
      .withColumn("k2", expr("n div 2"))       // == k1 for odd n
      .withColumn("mad_x4", sum( // 2·(interpolated MAD of ×2 deviations)
        when(col("cum") - col("w") <= col("k1") &&
          col("k1") < col("cum"), col("dev_x2")).otherwise(0L)
          + when(col("cum") - col("w") <= col("k2") &&
            col("k2") < col("cum"), col("dev_x2")).otherwise(0L))
        .over(wAll))
      .groupBy(col(keyCol))
      .agg(min(col("n")).as("n"), min(col("med_x2")).as("med_x2"),
        min(col("mad_x4")).as("mad_x4"),
        sum(when(lit(2L) * col("dev_x2") > lit(3L) * col("mad_x4"),
          col("w")).otherwise(0L)).as("n_outliers"))
  }

  val madOutliers = QueryDef(
    "q_events_mad_outliers",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"), graft.Exact.cents(col("value")).as("vc"))
      madOutlierCensus(e, "event_type", "vc")
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events),
      med AS (
        SELECT event_type, count(*) AS n,
               CAST(2 * quantile_cont(vc, 0.5) AS BIGINT) AS med_x2
        FROM e GROUP BY event_type),
      dev AS (
        SELECT e.event_type, med.n, med.med_x2,
               abs(2 * vc - med_x2) AS dev_x2
        FROM e JOIN med USING (event_type)),
      mad AS (
        SELECT event_type,
               CAST(2 * quantile_cont(dev_x2, 0.5) AS BIGINT) AS mad_x4
        FROM dev GROUP BY event_type)
      SELECT dev.event_type, CAST(min(dev.n) AS BIGINT) AS n,
             CAST(min(dev.med_x2) AS BIGINT) AS med_x2,
             CAST(min(mad.mad_x4) AS BIGINT) AS mad_x4,
             CAST(sum(CASE WHEN 2 * dev_x2 > 3 * mad_x4
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev JOIN mad USING (event_type)
      GROUP BY dev.event_type"""))

  /** Multi-touch linear attribution: each conversion's value is split
    * evenly (in exact integer cents) across every qualifying touch by the
    * same user inside the lookback window, with the division remainder
    * credited to the LAST touch — so per-conversion credits sum to the
    * conversion value EXACTLY, and the corpus-level invariant
    * Σcredit = Σvalue(attributed conversions) is auditable bit-for-bit.
    * (The streaming twin, [[graft.streaming.EventStreams.clickAttribution]],
    * is last-touch only; this is the batch multi-touch generalization.)
    *
    * Scale shape: the pairing key is (user_id, time-bucket) with bucket
    * width = the lookback window and the conversion side exploded to its
    * own and the previous bucket — the [[graft.ops.rangeBucketJoin]]
    * discipline — so a candidate touch is always in one of the two probed
    * buckets (coverage is exact for lookback ≤ bucket width) and hash-join
    * probe work is bounded by PER-WINDOW activity, not by a user's whole
    * history (a years-long user on a plain user_id key would make every
    * probe walk every historical touch). The exact interval filter then
    * rides the join; one window partitioned by conversion id splits the
    * credit. */
  def linearAttribution(events: DataFrame, convType: String,
      touchTypes: Seq[String], lookbackDays: Int): DataFrame = {
    val bucketSecs = lookbackDays * 86400L
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c) / lit(bucketSecs)).cast("long")
    val conv = events.filter(col("event_type") === convType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("conv_ts"), graft.Exact.cents(col("value")).as("vc"))
      .withColumn("tb", explode(array(bucketOf(col("conv_ts")),
        bucketOf(col("conv_ts")) - 1)))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("event_type").as("touch_type"), col("ts").as("touch_ts"))
      .withColumn("tb", bucketOf(col("touch_ts")))
    val joined = conv.join(touch, Seq("user_id", "tb"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $lookbackDays DAYS"))
    val w = Window.partitionBy(col("conv_id"))
    val wLast = w.orderBy(col("touch_ts").desc, col("touch_id"))
    joined
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("rn_last", row_number().over(wLast))
      .withColumn("credit_cents",
        expr("vc DIV n_touches") +
          when(col("rn_last") === 1, expr("vc % n_touches")).otherwise(0L))
  }

  /** Attribution census per touch channel: credited cents, touches, and
    * distinct conversions reached — plus the exactness invariant that the
    * per-channel credits re-aggregate to the attributed conversion total
    * (pinned in LinkageSpec; the oracle replays the same split). */
  val attribution = QueryDef(
    "q_events_attribution",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      linearAttribution(e, "purchase", Seq("view", "click"),
        lookbackDays = 7)
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("conv_id")).as("n_conversions"),
          sum(col("credit_cents")).as("credit_cents"))
    },
    Some("""
      WITH conv AS (
        SELECT event_id AS conv_id, user_id, ts AS conv_ts,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase'),
      touch AS (
        SELECT event_id AS touch_id, user_id, event_type AS touch_type,
               ts AS touch_ts
        FROM events WHERE event_type IN ('view', 'click')),
      joined AS (
        SELECT c.conv_id, c.vc, t.touch_id, t.touch_type,
               count(*) OVER (PARTITION BY c.conv_id) AS n_touches,
               row_number() OVER (PARTITION BY c.conv_id
                 ORDER BY t.touch_ts DESC, t.touch_id) AS rn_last
        FROM conv c JOIN touch t ON c.user_id = t.user_id
        WHERE t.touch_ts < c.conv_ts
          AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY)
      SELECT touch_type, count(*) AS n_touches,
             CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
             CAST(sum(vc // n_touches +
               CASE WHEN rn_last = 1 THEN vc % n_touches ELSE 0 END)
               AS BIGINT) AS credit_cents
      FROM joined GROUP BY touch_type"""))

  /** First-order Markov transition census over per-user event streams:
    * P(next type | type) as exact integer per-mille, from one lag window
    * per user. The behavioral-model primitive behind session simulators,
    * anomaly detectors (a transition whose probability collapses
    * week-over-week), and bot heuristics (transition entropy too low).
    *
    * Scale shape: one window partitioned by user (bounded by per-user
    * activity) + one (prev, next) count aggregate over the
    * |types|²-bounded transition frame; the row-total for the per-mille
    * rides a window over that tiny frame. */
  val transitions = QueryDef(
    "q_events_transitions",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val t = Tables(spark, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("c"))
      val wRow = Window.partitionBy(col("event_type"))
      t.withColumn("row_total", sum(col("c")).over(wRow))
        .withColumn("p_permille", expr("1000 * c DIV row_total"))
        .select(col("event_type"), col("next_type"), col("c"),
          col("row_total"), col("p_permille"))
    },
    Some("""
      WITH nxt AS (
        SELECT event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
        FROM events),
      t AS (
        SELECT event_type, next_type, count(*) AS c
        FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT event_type, next_type, c,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
               AS row_total,
             CAST(1000 * c // sum(c) OVER (PARTITION BY event_type)
               AS BIGINT) AS p_permille
      FROM t"""))

  val all: Seq[QueryDef] =
    Seq(tumbling, sliding, sessionize, funnel, dedupBatch, sessionWindow,
      retention, gapfill, peakHour, burstCollapse, madOutliers,
      attribution, transitions)
}
