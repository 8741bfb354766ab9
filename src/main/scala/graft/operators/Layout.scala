package graft.operators

import graft.QueryDef
import graft.functions.ZValue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order clustering) for write-side
  * optimization — the missing half of the scan-pruning story. Predicate
  * pushdown (PlanAuditSpec) only pays off when file/row-group min-max
  * ranges are TIGHT on the filtered columns; a 100 TB table sorted by one
  * column still reads everything for a predicate on another. Z-order
  * clustering sorts by the Morton interleave of several bucketized columns
  * at once, so every participating dimension gets bounded per-file ranges
  * and a multi-dimensional box predicate skips proportionally.
  *
  * No reference counterpart (the reference engine reads what it is given);
  * this is the Delta/Iceberg `OPTIMIZE ZORDER BY` capability rebuilt from
  * first principles on public Spark APIs: a codegen [[ZValue]] expression +
  * `repartitionByRange` + `sortWithinPartitions` — no custom physical
  * operator needed, and the whole pipeline is one range shuffle.
  */
object Layout {

  /** Linear min-max bucketization of a numeric column into [0, 2^bits):
    * one tiny global aggregate for the bounds (collected to the driver —
    * a handful of longs, same pattern as repartitionByRange's own range
    * sampling), then a pure map stage. Monotonic, so per-file z-ranges
    * translate back to per-file value ranges. For heavily skewed columns
    * pre-transform (log, rank) before layout. */
  def zorderWrite(
      df: DataFrame, cols: Seq[String], path: String,
      files: Int, bits: Int = 8): Unit =
    zorderRepartition(df, cols, files, bits).write
      .mode("overwrite").parquet(path)

  /** The layout plan without the sink (exposed for tests / other sinks):
    * bucketize → zvalue → ONE range shuffle on z → in-partition sort → drop
    * the helper column. */
  def zorderRepartition(
      df: DataFrame, cols: Seq[String], files: Int, bits: Int = 8)
      : DataFrame = {
    require(cols.nonEmpty, "zorderRepartition needs at least one column")
    val buckets = 1L << bits
    val bounds = df.select(
      cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*)
      .collect()(0)
    val bucketized = cols.zipWithIndex.map { case (c, idx) =>
      val lo = bounds.getDouble(2 * idx)
      val hi = bounds.getDouble(2 * idx + 1)
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit(buckets - 1), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(buckets.toDouble))
          .cast("long")))
    }
    val zCol = org.apache.spark.sql.graft.Bridge.column(
      ZValue(bucketized.map(org.apache.spark.sql.graft.Bridge.expression), bits))
    df.withColumn("__graft_z", zCol)
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** Oracle-checked query: the z-values themselves, computed by the codegen
    * expression on the Spark side and by the expanded floor-div/mod bit
    * arithmetic ([[ZValue.oracleSqlExpr]]) on the DuckDB side — pins the
    * interleave bit-for-bit, which is what the write path sorts by. */
  val zvalueQuery: QueryDef = {
    val sparkSql =
      """SELECT o_orderkey,
                zvalue(o_custkey % 256, o_orderkey % 256, 8) AS z
         FROM orders
         ORDER BY z, o_orderkey
         LIMIT 100"""
    val duckSql =
      s"""SELECT o_orderkey,
                 ${ZValue.oracleSqlExpr(Seq("(o_custkey % 256)", "(o_orderkey % 256)"), 8)} AS z
          FROM orders
          ORDER BY z, o_orderkey
          LIMIT 100"""
    QueryDef.sql("q_layout_zorder", sparkSql, duckSql)
  }

  val all: Seq[QueryDef] = Seq(zvalueQuery)
}
