package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Data profiling: per-column null/distinct/min/max stats in one scan —
  * the ANALYZE-style data-quality pass a training pipeline runs before
  * ingestion. One aggregation over the table (no per-column rescans), then
  * an unpivot into (column, stats) rows. At 100 TB this is a single
  * map-combine aggregate; the distinct counts are the only memory-heavy
  * part and switch to kmv_distinct when exactness isn't required.
  */
object Profiling {

  private val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val profileLineitem = QueryDef(
    "q_profile_lineitem",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val agged = li.agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_distinct"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))): _*)
      val stackArgs = cols.map(c =>
        s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max").mkString(", ")
      agged.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_v, max_v)"))
    },
    Some {
      val selects = cols.map(c => s"""
        SELECT (SELECT count(*) FROM lineitem) AS n_rows, '$c' AS col_name,
               CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               count(DISTINCT $c) AS n_distinct,
               min($c) AS min_v, max($c) AS max_v
        FROM lineitem""")
      selects.mkString(" UNION ALL ")
    })

  val all: Seq[QueryDef] = Seq(profileLineitem)
}
