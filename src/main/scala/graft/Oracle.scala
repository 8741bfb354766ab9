package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared engine capability: a named DataFrame query plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * The driver's t2 gate runs both at sf0.01 and hash-compares result sets
  * (columns sorted by name, rows sort-normalized).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"query name must be a slug: $name")
}

object QueryDef {
  /** SQL-text query: same logical query is run through Spark SQL and given to
    * DuckDB verbatim (dialect-portable subset only). */
  def sql(name: String, sparkSql: String, duckSql: String): QueryDef =
    QueryDef(
      name,
      (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(sparkSql) },
      Some(duckSql))

  /** SQL that is textually identical in both dialects. */
  def sqlSame(name: String, q: String): QueryDef = sql(name, q, q)
}

/** Cross-engine determinism helpers.
  *
  * The t2 gate compares raw values, so any double that is *computed* (rather
  * than passed through from parquet) must come out bit-identical from Spark
  * and DuckDB. Floating-point `sum()` is order-dependent, so we accumulate in
  * exact decimal — all money/rate columns in the testdata carry <=2 decimal
  * places (FIXTURES.md), so `cast(x as decimal(18,2))` is lossless — and cast
  * the exact result to double at the very end. Averages are `sum/count` in
  * exact decimal then one double division, identical IEEE ops on both sides.
  */
object Exact {
  /** lossless decimal image of a <=2-decimal-place double column */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** order-independent, bit-deterministic sum of a 2-dp double column */
  def sumd(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** bit-deterministic average of a 2-dp double column */
  def avgd(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c).cast(DoubleType)

  /** SQL-side mirrors (DuckDB + Spark SQL, both accept this spelling) */
  def sumdSql(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def avgdSql(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / CAST(count($col) AS DOUBLE)"
}
