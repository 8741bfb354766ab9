package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session factory + table catalog for the graft engine.
  *
  * The reference (oap-project/native-sql-engine) attaches to Spark via
  * `spark.sql.extensions=com.intel.oap.ColumnarPlugin`
  * (reference: native-sql-engine/core/src/main/scala/com/intel/oap/ColumnarPlugin.scala:387-394).
  * We keep the same shape — an extensions entry point (`graft.plans.GraftExtensions`)
  * — but the execution engine is stock Catalyst + Tungsten: declarative plans,
  * whole-stage codegen, AQE. Defaults below are chosen for cluster citizenship
  * (AQE coalesce/skew handling on, shuffle parallelism = cores locally, UTC).
  */
object Engine {
  /** local parallelism: match cores, not Spark's default 200 shuffle partitions */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def session(appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder().appName(appName).master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Shared config for every entry point (Verify/Bench/tests), so the
    * correctness gate and the bench measure the same engine. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // testdata parquet carries ms-precision timestamps with
    // isAdjustedToUTC=false; read them as session-TZ (UTC) timestamps, not
    // TIMESTAMP_NTZ, so datetime functions apply uniformly.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // events.parquet carries TIMESTAMP(NANOS) which the parquet vectorized
    // reader rejects; read as raw long nanos and normalize in Tables.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** One shared small-fixture session profile for the verbatim-corpus
    * sessions (TPC-H / TPC-DS / SSB fixture sessions — previously three
    * duplicated string-configs, VERDICT r12 #6).
    *
    * Rationale (one place, session-scoped): a materialized micro-schema
    * whose largest fact is under [[smallFactRows]] runs 22-103 sub-second
    * queries where 32-way shuffles are pure task-scheduling floor — 8
    * partitions cut per-query stage-launch overhead without moving any
    * value (every fixture sum is exact under any accumulation order by
    * design). Above the threshold (the scaled verbatim runs,
    * [[graft.tools.TpchScaleBench]]) the floor would SERIALIZE real work
    * onto a quarter of the cores, so the session keeps the engine-wide
    * cores-wide default. At deploy scale the partition count is a
    * deploy-time conf, not a plan property — plan signatures normalize it
    * away. (The battery replay's 4-partition conf is a different surface:
    * serial statement replay, tuned separately — ecd5a91.) */
  val smallFactRows = 2000000L

  def tuneFixtureSession(spark: SparkSession, largestFactRows: Long): Unit = {
    if (largestFactRows < smallFactRows)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
    // Join strategy (guide §3.1/§9), gated by the SAME fact-size threshold
    // as the partition floor (VERDICT r13 #1): r13 applied
    // preferSortMergeJoin=false to every fixture session unconditionally,
    // and the committed driver run showed the tpcds_verbatim family +4.5 s.
    // A 32-core fresh-JVM A/B this round (min-of-2 per side, both orders)
    // measured the flip NET-NEGATIVE at micro-fixture scale on all three
    // corpora — TPC-DS 31.5 vs 29.2 s, TPC-H+SSB 14.0 vs 12.6 s (geomean
    // ratio 1.08/1.10): micro-scale joins mostly broadcast, and where a
    // shuffle survives, the SHJ build adds planning/AQE-rewrite overhead
    // without a sort worth skipping. ABOVE the threshold (the scaled
    // verbatim runs, TpchScaleBench x30/x100) shuffled-hash is measured to
    // win big — q9 5.9→2.0 s at x30, section 26.2→18.4 s — because the
    // fact⋈fact joins otherwise pay two full sorts. The OOM risk SMJ
    // hedges against stays bounded: the static pick still requires the
    // planner's size conditions, and the AQE threshold only rewrites when
    // EVERY post-shuffle partition fits the memory-derived per-task build
    // budget. GRAFT_PREFER_SHJ=false restores the SMJ default (A/B knob).
    if (largestFactRows >= smallFactRows &&
        sys.env.getOrElse("GRAFT_PREFER_SHJ", "true").toBoolean) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        shjLocalMapThreshold(Runtime.getRuntime.maxMemory,
          spark.sparkContext.defaultParallelism).toString)
    }
  }

  /** AQE SHJ rewrite threshold derived from the memory envelope (VERDICT
    * r13 #7, guide §5): the r13 constant 64m OOM'd at an 8 GB heap with 32
    * concurrent builds ("Can't acquire 67108864 bytes") — 32×64 MB of hash
    * relations plus probe/sort buffers exceed the 0.6-fraction execution
    * pool. Budget: execution pool ≈ heap × memory.fraction (0.6); one
    * concurrent task per core; a build may take at most a quarter of its
    * task's share (hash relation overhead ≈2× raw bytes, plus headroom for
    * the probe side and concurrent non-join operators). Clamped to
    * [16 MB, 256 MB]: below 16 MB the rewrite isn't worth the bookkeeping
    * (broadcast usually wins there anyway), above 256 MB per-partition
    * builds stop being the cheap case SHJ targets. */
  def shjLocalMapThreshold(heapBytes: Long, cores: Int): Long = {
    val perBuild = (heapBytes * 0.6).toLong / math.max(cores, 1) / 4
    math.max(16L << 20, math.min(256L << 20, perBuild))
  }
}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md).
  * Plain `spark.read.parquet` — Spark's vectorized parquet reader with
  * predicate pushdown and column pruning is the idiomatic equivalent of the
  * reference's Arrow Dataset scan
  * (reference: arrow-data-source/standard/.../ArrowDataSourceV2.scala:27-41).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog-style metadata reuse: a production engine resolves a table's
  // schema + file listing once (metastore), not per query. Re-running
  // spark.read.parquet per query re-reads footers and re-lists files — at
  // ~10 tables × ~100 queries that fixed cost dominates small-SF benches and
  // is pure waste at any scale. Keyed by session identity so concurrent
  // sessions (tests) stay isolated.
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()
  private val viewsFor =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    dfCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // nanosAsLong=true surfaces NANOS parquet as Long nanos; truncate to
      // micros and rebuild a proper timestamp column (session TZ is UTC).
      // `div` keeps the arithmetic integral — `/` would detour through
      // double, and epoch-ns values (~1.7e18) exceed double's 2^53 exact
      // range, silently rounding sub-ms digits. Re-written events tables
      // (e.g. ScaleSmoke) arrive as TIMESTAMP already and pass through.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** guide §2.5 "input skew — one huge unsplittable file": parquet scans
    * parallelize at ROW-GROUP granularity, so a table whose files carry
    * fewer row groups than the session has cores runs its scan stage — and
    * any per-row-heavy work fused into it (sketch updates, hash chains,
    * decimal arithmetic, text shingling) — on fewer tasks than cores no
    * matter how Spark byte-splits the files. [[spread]] redistributes such
    * a table once, by a natural high-cardinality key (never rand(): retry
    * safety, guide §2.5), to the session's shuffle parallelism BEFORE the
    * heavy compute. The condition derives from the input itself (footer
    * row-group count vs `defaultParallelism`), so at production layouts —
    * hundreds of row groups per 100 TB table — it is the identity and adds
    * NO exchange; only a degenerate layout pays the (tiny, proportional)
    * one-time shuffle. Callers are the per-row-heavy operators only:
    * shuffle-bound queries (joins/aggregations on keys) repartition anyway
    * and must not pay a second exchange. */
  private val spreadKeys: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "orders" -> Seq("o_orderkey"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val rgCounts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def rowGroupCount(spark: SparkSession, path: String): Int =
    rgCounts.computeIfAbsent(path, _ => {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(f =>
            f.isFile && !f.getPath.getName.startsWith("_"))
        else Array(fs.getFileStatus(p))
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try r.getRowGroups.size finally r.close()
      }.sum
    })

  /** `keys` override: when the first downstream operation groups by a
    * known key, spreading BY THAT KEY lets the exchange double as the
    * operation's own shuffle (no second exchange); default is the table's
    * natural key. The partition count is deliberately left to AQE
    * (`parallelismFirst` coalescing): measured at sf0.1, forcing
    * `defaultParallelism` partitions pays more per-task floor than the
    * extra parallelism earns — AQE's size-derived pick is the
    * scale-adaptive one (guide §2.2). */
  def spread(spark: SparkSession, dir: String, name: String,
      keys: String*): DataFrame = {
    val df = apply(spark, dir, name)
    if (rowGroupCount(spark, s"$dir/$name.parquet") >=
        spark.sparkContext.defaultParallelism) df
    else {
      val ks = if (keys.nonEmpty) keys else spreadKeys(name)
      df.repartition(ks.map(df.col): _*)
    }
  }

  /** Register every table as a temp view so SQL-text queries can run.
    * Idempotent per (session, dir): re-registers only when the dir changes. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val id = System.identityHashCode(spark)
    if (viewsFor.put(id, dir) != dir)
      names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
  }

  /** A derived session whose views are registered through [[spread]] —
    * the routing target for SQL-text rows whose heavy work is FUSED INTO
    * the scan (partial aggregation, window staging over a single table):
    * at the degenerate single-row-group fixture layout those rows run the
    * fused work ~single-threaded, and the spread exchange parallelizes it.
    * Registering spread views GLOBALLY was measured net-negative (32c A/B:
    * the 147-row main-session SQL basket 80.3 vs 57.6 s) because
    * broadcast-join rows pay a new full exchange of the fact side for
    * nothing — so only rows where a per-row A/B shows a win route here
    * (QueryDef.sqlSpread). At production layouts (row groups >= cores)
    * spread is the identity, the views degenerate to the plain ones, and
    * the routing is a no-op. Cached per (outer session, dir) like the
    * verbatim fixture sessions. */
  private val spreadSessions =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), SparkSession]()

  def spreadSession(outer: SparkSession, dir: String): SparkSession =
    spreadSessions.computeIfAbsent(
      (System.identityHashCode(outer), dir), _ => {
        val s = outer.newSession()
        names.foreach { n =>
          val df =
            if (spreadKeys.contains(n)) spread(s, dir, n)
            else apply(s, dir, n)
          df.createOrReplaceTempView(n)
        }
        s
      })
}
