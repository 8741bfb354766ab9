package graft

import java.sql.Timestamp

import graft.streaming.{Event, EventStreams}
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming coverage: watermarked windowed aggregation, streaming
  * dedup, stream-static join, custom keyed state (mapGroupsWithState). The
  * reference runs all of this as row-fallback vanilla Spark (SURVEY §2.11);
  * here it's first-class. */
class StreamingSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._
  private implicit def sqlCtx: SQLContext = sp.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def mkEvents(rows: Event*): MemoryStream[Event] = {
    val ms = MemoryStream[Event]
    ms.addData(rows: _*)
    ms
  }

  test("watermarked tumbling window aggregation") {
    val ms = mkEvents(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(1), 101, "click", 2.0),
      Event(3, ts(6), 100, "view", 3.0))
    val q = EventStreams.toMemorySink(
      EventStreams.windowedCounts(ms.toDF(), "10 minutes", "5 minutes"),
      "win_counts")
    try {
      q.processAllAvailable()
      val out = sp.table("win_counts")
        .select(col("event_type"), col("n"), col("sum_value")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sliding windows produce overlapping buckets") {
    val ms = mkEvents(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(7), 100, "click", 1.0))
    val q = EventStreams.toMemorySink(
      EventStreams.slidingCounts(ms.toDF(), "10 minutes", "10 minutes",
        "5 minutes"), "slide_counts")
    try {
      q.processAllAvailable()
      // 10-min windows sliding by 5: event@10:00 lands in [09:55,10:05] and
      // [10:00,10:10]; event@10:07 in [10:00,10:10] and [10:05,10:15]
      val out = sp.table("slide_counts")
        .select(col("win_start"), col("n")).collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      assert(out == Map(
        "2024-01-01 09:55:00.0" -> 1L,
        "2024-01-01 10:00:00.0" -> 2L,
        "2024-01-01 10:05:00.0" -> 1L))
    } finally q.stop()
  }

  test("session windows merge events within the gap and split across it") {
    val ms = mkEvents(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(3), 100, "view", 2.0),  // within 5-min gap → same session
      Event(3, ts(20), 100, "click", 4.0), // > gap → new session
      Event(4, ts(1), 200, "view", 8.0))
    val q = EventStreams.toMemorySink(
      EventStreams.sessionWindows(ms.toDF(), "10 minutes", "5 minutes"),
      "sess_counts", "complete")
    try {
      q.processAllAvailable()
      val out = sp.table("sess_counts")
        .select(col("user_id"), col("n_events"), col("sum_value")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out == Set((100L, 2L, 3.0), (100L, 1L, 4.0), (200L, 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed event_ids") {
    val ms = mkEvents(
      Event(10, ts(0), 1, "click", 1.0),
      Event(10, ts(1), 1, "click", 1.0), // duplicate id
      Event(11, ts(2), 2, "view", 2.0))
    val q = EventStreams.toMemorySink(
      EventStreams.dedup(ms.toDF(), "10 minutes"), "dedup_out", "append")
    try {
      q.processAllAvailable()
      assert(sp.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment join") {
    val users = Seq((100L, "gold"), (101L, "basic")).toDF("user_id", "tier")
    val ms = mkEvents(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(1), 101, "view", 2.0),
      Event(3, ts(2), 999, "view", 3.0))
    val q = EventStreams.toMemorySink(
      EventStreams.enrich(ms.toDF(), users), "enrich_out", "append")
    try {
      q.processAllAvailable()
      val out = sp.table("enrich_out")
        .select(col("event_id"), col("tier")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(out == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    val clicks = mkEvents(
      Event(1, ts(0), 100, "click", 0.0),
      Event(2, ts(40), 100, "click", 0.0), // second click, later
      Event(3, ts(0), 200, "click", 0.0))
    val purchases = mkEvents(
      Event(50, ts(10), 100, "purchase", 9.99),  // within 30m of click 1
      Event(51, ts(45), 100, "purchase", 5.00),  // within 30m of click 2 only
      Event(52, ts(55), 200, "purchase", 1.00))  // 55m after click 3: outside
    val q = EventStreams.toMemorySink(
      EventStreams.clickAttribution(clicks.toDF(), purchases.toDF()),
      "attr_out", "append")
    try {
      q.processAllAvailable()
      val got = sp.table("attr_out")
        .select(col("click_id"), col("purchase_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 50L), (2L, 51L)), s"got $got")
    } finally q.stop()
  }

  test("outer stream-stream join emits unmatched clicks after watermark") {
    val clicks = mkEvents(
      Event(1, ts(0), 100, "click", 0.0),   // converts (purchase at :10)
      Event(2, ts(1), 200, "click", 0.0))   // never converts
    val purchases = mkEvents(
      Event(50, ts(10), 100, "purchase", 9.99))
    val q = EventStreams.toMemorySink(
      EventStreams.clickAttributionOuter(clicks.toDF(), purchases.toDF()),
      "attr_outer_out", "append")
    try {
      q.processAllAvailable()
      // push both watermarks far past click2's join window (:01 + 30m + 10m)
      clicks.addData(Event(3, ts(59), 300, "click", 0.0))
      purchases.addData(Event(51, ts(59), 300, "purchase", 1.0))
      q.processAllAvailable()
      val got = sp.table("attr_outer_out")
        .select(col("click_id"), col("purchase_id")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(got(1L) == 50L, s"converted click must join: $got")
      assert(got(2L) == -1L,
        s"unconverted click must emit null-extended after watermark: $got")
    } finally q.stop()
  }

  test("file-source streaming replay matches the batch tumbling aggregation") {
    import org.apache.spark.sql.types._
    // ts arrives either as TIMESTAMP(NANOS) → LongType under nanosAsLong
    // (older fixture generations) or as a plain TIMESTAMP(MICROS); mirror
    // Tables.apply's batch normalization by adapting to the batch schema
    val tsType = sp.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file stream source needs a directory
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = sp.readStream.schema(schema).parquet(dir.toString)
    val stream =
      if (tsType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = EventStreams.toMemorySink(agg, "replay_counts", "complete")
    try {
      q.processAllAvailable()
      val got = sp.table("replay_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val want = Tables(sp, sfDir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch upsert sink: per-batch merge, idempotent on replay") {
    // the exactly-once lake-merge pattern: foreachBatch gives (df, batchId);
    // the writer keys its commit on batchId so a replayed microbatch (failure
    // + restart re-offers the same id) merges to the identical end state
    val store = new java.util.concurrent.ConcurrentHashMap[Long, Double]()
    val committed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def mergeBatch(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        batchId: Long): Unit = {
      if (committed.add(batchId)) { // idempotence gate
        df.groupBy(col("user_id"))
          .agg(sum(col("value")).as("v")).collect()
          .foreach(r => store.merge(r.getLong(0), r.getDouble(1), _ + _))
      }
    }
    val ms = mkEvents(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(1), 100, "click", 2.0),
      Event(3, ts(2), 101, "view", 5.0))
    val q = ms.toDF()
      .writeStream.outputMode("update")
      .foreachBatch(mergeBatch _)
      .start()
    try {
      q.processAllAvailable()
      ms.addData(Event(4, ts(3), 100, "view", 4.0))
      q.processAllAvailable()
      assert(store.get(100L) == 7.0 && store.get(101L) == 5.0)
      // simulate a replayed microbatch: same id, same data → no double count
      val replayId = committed.iterator().next()
      mergeBatch(sp.range(1).select(lit(100L).as("user_id"),
        lit(99.0).as("value")), replayId)
      assert(store.get(100L) == 7.0, "replayed batchId must be a no-op")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits milestones (multi-output keyed state)") {
    val ms = MemoryStream[Event]
    val q = EventStreams.toMemorySink(
      EventStreams.milestones(ms.toDS(), every = 2L).toDF(),
      "milestones_out", "append")
    try {
      // batch 1: 3 events for user 42 -> one milestone (at 2 events);
      // 1 event for user 7 -> none
      ms.addData(Event(1, ts(0), 42, "click", 1.0),
        Event(2, ts(1), 42, "view", 2.5),
        Event(3, ts(2), 42, "view", 0.5),
        Event(4, ts(0), 7, "click", 9.0))
      q.processAllAvailable()
      // batch 2: user 42 crosses 4, user 7 crosses 2 -> two more milestones
      ms.addData(Event(5, ts(3), 42, "click", 1.0),
        Event(6, ts(4), 7, "view", 1.0))
      q.processAllAvailable()
      val out = sp.table("milestones_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out == Set((42L, 2L, 3.5), (42L, 4L, 5.0), (7L, 2L, 10.0)))
    } finally q.stop()
  }

  test("custom keyed state: per-user running stats across batches") {
    val ms = MemoryStream[Event]
    val q = EventStreams.toMemorySink(
      EventStreams.userRunningStats(ms.toDS()).toDF(), "user_stats")
    try {
      ms.addData(Event(1, ts(0), 7, "click", 1.5))
      q.processAllAvailable()
      ms.addData(Event(2, ts(5), 7, "view", 2.5))
      q.processAllAvailable()
      val rows = sp.table("user_stats")
        .groupBy(col("user_id")).agg(max(col("n_events")).as("n"),
          max(col("total_value")).as("tv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSet == Set((7L, 2L, 4.0)))
    } finally q.stop()
  }

  test("transformWithState (state v2) matches the mapGroupsWithState stats") {
    // the v2 arbitrary-state API requires the RocksDB provider; scope it to
    // this query and restore the default afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    val q = EventStreams.toMemorySink(
      EventStreams.userRunningStatsV2(ms.toDS()).toDF(), "user_stats_v2")
    try {
      ms.addData(Event(1, ts(0), 7, "click", 1.5),
        Event(2, ts(1), 42, "view", 2.0))
      q.processAllAvailable()
      ms.addData(Event(3, ts(5), 7, "view", 2.5))
      q.processAllAvailable()
      val rows = sp.table("user_stats_v2")
        .groupBy(col("user_id")).agg(max(col("n_events")).as("n"),
          max(col("total_value")).as("tv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // same per-user end state the v1 operator produces on this input
      assert(rows.toSet == Set((7L, 2L, 4.0), (42L, 1L, 2.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => sp.conf.set(key, v)
        case None => sp.conf.unset(key)
      }
    }
  }

  test("stateful query resumes from checkpoint with state intact") {
    // the property that matters on a real cluster: a stateful query
    // restarted against its checkpointLocation must carry keyed state
    // across the restart, not recount from zero. The memory sink refuses
    // recovery, so this runs against a fault-tolerant parquet file sink
    // with the Append-mode milestones operator.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val ms = MemoryStream[Event]
    def start() = EventStreams.milestones(ms.toDS(), every = 2L).toDF()
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      // 3 events -> one milestone at n=2 (value 3.5); one event in state
      ms.addData(Event(1, ts(0), 42, "click", 1.0),
        Event(2, ts(1), 42, "view", 2.5),
        Event(3, ts(2), 42, "view", 0.5))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      // one more event -> n crosses 4 ONLY if the pre-restart count of 3
      // was recovered; lost state would restart the count at 1
      ms.addData(Event(4, ts(3), 42, "click", 1.0))
      q2.processAllAvailable()
      val rows = sp.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((42L, 2L, 3.5), (42L, 4L, 5.0)),
        s"state lost across restart: $rows")
    } finally q2.stop()
  }

  test("v2 MapState keeps per-user per-type counts across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    val q = EventStreams.toMemorySink(
      EventStreams.typeCounts(ms.toDS()).toDF(), "type_counts")
    try {
      ms.addData(Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(1), 7, "view", 1.0),
        Event(3, ts(2), 7, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Event(4, ts(3), 7, "click", 1.0),
        Event(5, ts(3), 42, "view", 1.0))
      q.processAllAvailable()
      val latest = sp.table("type_counts")
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(col("n")).as("n")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(latest == Set((7L, "click", 3L), (7L, "view", 1L),
        (42L, "view", 1L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => sp.conf.set(key, v)
        case None => sp.conf.unset(key)
      }
    }
  }

  test("v2 ListState holds a bounded rolling window of raw events") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    val q = EventStreams.toMemorySink(
      EventStreams.recentWindow(ms.toDS(), keep = 3).toDF(), "recent_win")
    try {
      ms.addData(Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(1), 7, "view", 2.0))
      q.processAllAvailable()
      // two more events: the window must hold the LAST 3 (values 2,3,4)
      ms.addData(Event(3, ts(2), 7, "view", 3.0),
        Event(4, ts(3), 7, "click", 4.0))
      q.processAllAvailable()
      val latest = sp.table("recent_win")
        .groupBy(col("user_id"))
        .agg(max(col("n_recent")).as("n"), max(col("recent_sum")).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(latest.toSet == Set((7L, 3L, 9.0)),
        s"expected last-3 window (2+3+4), got ${latest.toSet}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => sp.conf.set(key, v)
        case None => sp.conf.unset(key)
      }
    }
  }

  test("v2 event-time timers close sessions when the watermark passes") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    // zero watermark delay: watermark = max event time seen in prior batches
    val q = EventStreams.toMemorySink(
      EventStreams.timedSessions(ms.toDS(), "0 seconds", gapMs = 10000L)
        .toDF(), "timed_sessions", "append")
    try {
      // batch 1: two events for user 7 within the gap; timer armed at
      // ts(1) + 10s; nothing can close yet (watermark is behind)
      ms.addData(Event(1, ts(0), 7, "click", 1.5),
        Event(2, ts(1), 7, "view", 2.5))
      q.processAllAvailable()
      assert(sp.table("timed_sessions").count() == 0)
      // batch 2: a far-future event for user 42 pushes the watermark past
      // user 7's timer -> 7's session closes with both events aggregated
      ms.addData(Event(3, ts(120), 42, "click", 9.0))
      q.processAllAvailable()
      ms.addData(Event(4, ts(121), 42, "view", 1.0))
      q.processAllAvailable()
      val closed = sp.table("timed_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(closed == Set((7L, 2L, 4.0)),
        s"expected user 7's session closed, got $closed")
    } finally {
      q.stop()
      prev match {
        case Some(v) => sp.conf.set(key, v)
        case None => sp.conf.unset(key)
      }
    }
  }

  test("streaming incremental curation: foreachBatch admits only novel docs") {
    // the 100 TB ingestion pattern: documents arrive as a stream; each
    // micro-batch is admitted against the curated corpus with
    // ops.admitBatch (intra-batch exact dedup -> fingerprint anti-join vs
    // corpus -> LSH near-dup check vs the corpus band index), and the
    // corpus grows by exactly the novel docs. Exact replays of earlier
    // batches and near-dup rewrites must both bounce.
    val d1 = (1L, "the quick brown fox jumps over the lazy dog today")
    val d2 = (2L, "completely different content about spark physical plans")
    val d1Exact = (3L, d1._2)                         // exact dup of d1
    val d2Near = (4L,
      "completely different content about spark physical plan")  // near-dup
    val novel = (5L, "a genuinely new document with original words here")

    var corpus = Seq(d1).toDF("doc_id", "text")
    val admittedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    def admit(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        batchId: Long): Unit = this.synchronized {
      val fresh = graft.ops
        .admitBatch(corpus, df, "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"), col("text")).collect()
      admittedIds ++= fresh.map(_.getLong(0))
      if (fresh.nonEmpty) {
        corpus = corpus.union(
          sp.createDataFrame(java.util.Arrays.asList(fresh: _*),
            corpus.schema))
      }
    }
    val ms = MemoryStream[(Long, String)]
    ms.addData(d2, d1Exact)
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch(admit _).start()
    try {
      q.processAllAvailable()
      assert(admittedIds.sorted == Seq(2L),
        s"batch 1: only d2 is novel (d1Exact is an exact corpus dup): $admittedIds")
      ms.addData(d2Near, novel)
      q.processAllAvailable()
      assert(admittedIds.sorted == Seq(2L, 5L),
        s"batch 2: near-dup of admitted d2 must bounce, novel admits: $admittedIds")
      assert(corpus.count() == 3)  // d1, d2, novel
    } finally q.stop()
  }

  test("foreachBatch SCD2 MERGE sink: exactly-once across checkpoint restart") {
    // the streaming→mutation closure, end to end through REAL storage: a
    // change stream upserts into an SCD2 history PARQUET WAREHOUSE via
    // ops.scd2Merge inside foreachBatch (copy-on-write: each batch writes
    // history version v<batchId>, then atomically advances a LATEST
    // pointer file — the Delta/Iceberg commit protocol in miniature). A
    // crash is INJECTED after the v1 data write but before the pointer
    // commit, killing the query mid-batch; the restarted query (same
    // checkpointLocation) must genuinely RE-OFFER batchId 1, whose replay
    // re-merges from the last committed pointer — so the end state equals
    // the batch twin despite the partial write. No driver-side state
    // anywhere: history lives only in parquet + the pointer file.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ckpt = Files.createTempDirectory("graft-scd2").toString
    val wh = Files.createTempDirectory("graft-scd2-wh").toString
    val ptr = Paths.get(wh, "LATEST")
    val seed = Seq((100L, "O", 1000L, 1L, true), (200L, "O", 2000L, 1L, true))
    def seedDf = seed.toDF("k", "st", "pc", "version", "is_current")
    def lastCommitted: Long =
      if (Files.exists(ptr))
        new String(Files.readAllBytes(ptr)).trim.toLong
      else -1L
    def histAt(b: Long) =
      if (b < 0) seedDf else sp.read.parquet(s"$wh/v$b")
    @volatile var crashOnce = false
    val offers = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    def mergeBatch(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        batchId: Long): Unit = {
      offers.merge(batchId, 1, (a, b) => a + b)
      val last = lastCommitted
      if (batchId <= last) return // committed batch re-offered: no-op
      graft.ops.scd2Merge(histAt(last), df.toDF("k", "st", "pc"), "k")
        .write.mode("overwrite").parquet(s"$wh/v$batchId")
      if (crashOnce) { // dies AFTER the data write, BEFORE the commit
        crashOnce = false
        throw new RuntimeException("injected crash before pointer commit")
      }
      val tmp = Paths.get(wh, s".LATEST.$batchId")
      Files.write(tmp, batchId.toString.getBytes)
      Files.move(tmp, ptr, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    val ms = MemoryStream[(Long, String, Long)]  // (k, st, pc)
    def start() = ms.toDF().toDF("k", "st", "pc")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(mergeBatch _).start()
    val batchA = Seq((100L, "F", 1100L), (300L, "O", 3000L))
    val batchB = Seq((100L, "P", 1200L), (200L, "F", 2200L))
    val batchC = Seq((300L, "F", 3300L))
    // batch 0 commits cleanly, then the query is stopped (planned restart)
    val q1 = start()
    try { ms.addData(batchA: _*); q1.processAllAvailable() } finally q1.stop()
    assert(lastCommitted == 0L)
    // batch 1 crashes mid-commit: v1 parquet exists, pointer still at 0
    crashOnce = true
    val q2 = start()
    ms.addData(batchB: _*)
    intercept[Exception] { q2.processAllAvailable(); q2.awaitTermination() }
    assert(!q2.isActive, "injected crash must kill the query")
    assert(lastCommitted == 0L, "crashed batch must not commit")
    // restart from the checkpoint: batchId 1 is genuinely re-offered and
    // its replay re-merges from v0 (overwriting the orphan v1), commits,
    // then batch 2 proceeds on top
    val q3 = start()
    try {
      q3.processAllAvailable()
      assert(lastCommitted == 1L, "replayed batch must commit")
      ms.addData(batchC: _*)
      q3.processAllAvailable()
    } finally q3.stop()
    assert(lastCommitted == 2L)
    assert(offers.get(1L) == 2, s"batch 1 must run twice (crash + replay): $offers")

    // batch twin: the same change-sets folded through scd2Merge directly
    var twin = seedDf
    Seq(batchA, batchB, batchC).foreach { b =>
      twin = graft.ops.scd2Merge(twin, b.toDF("k", "st", "pc"), "k")
    }
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val got = toSet(sp.read.parquet(s"$wh/v$lastCommitted"))
    val want = toSet(twin)
    assert(got == want, s"warehouse history != batch twin:\n$got\n$want")
    // shape sanity: k=100 has 3 versions, exactly one current (the latest)
    val k100 = got.filter(_._1 == 100L)
    assert(k100.map(_._4) == Set(1L, 2L, 3L))
    assert(k100.count(_._5) == 1 && k100.find(_._5).get._2 == "P")
    // k=300 inserted in batch 0, updated in batch 2 -> versions 1, 2
    val k300 = got.filter(_._1 == 300L)
    assert(k300.map(_._4) == Set(1L, 2L))
    assert(k300.find(_._5).get._2 == "F")
  }

  test("streaming curation composes with the Gopher quality gate") {
    // same ingestion pattern, with ops.gopherFlags filtering each
    // micro-batch BEFORE admission: repetitive spam never reaches the
    // dedup index (the gate is a pure map stage, so it adds no shuffle to
    // the micro-batch plan), while a clean novel doc still admits.
    graft.plans.GraftFunctions.ensureRegistered(sp)
    val clean = (10L,
      "the cat and dog runs over hill with big red fox near tall tree " +
        "then bird flies past open door into warm home")
    val spam = (11L, Seq.fill(30)("spam").mkString(" "))

    var corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    def admit(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        batchId: Long): Unit = this.synchronized {
      val gated = graft.ops.gopherFlags(df).filter(col("is_clean"))
        .select(col("doc_id"), col("text"))
      val fresh = graft.ops
        .admitBatch(corpus, gated, "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"), col("text")).collect()
      admitted ++= fresh.map(_.getLong(0))
    }
    val ms = MemoryStream[(Long, String)]
    ms.addData(clean, spam)
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch(admit _).start()
    try {
      q.processAllAvailable()
      assert(admitted.sorted == Seq(10L),
        s"only the clean doc passes the gate and admits: $admitted")
    } finally q.stop()
  }
}
