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

  def tuneFixtureSession(spark: SparkSession, largestFactRows: Long): Unit =
    if (largestFactRows < smallFactRows)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
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

  /** Register every table as a temp view so SQL-text queries can run.
    * Idempotent per (session, dir): re-registers only when the dir changes. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val id = System.identityHashCode(spark)
    if (viewsFor.put(id, dir) != dir)
      names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
  }
}
