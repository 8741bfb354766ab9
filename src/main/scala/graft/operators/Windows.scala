package graft.operators

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function capability surface.
  *
  * The reference's `ColumnarWindowExec` whitelists sum/avg/min/max/count/
  * count(literal)/rank over whole-partition frames only
  * (reference: core/com/intel/oap/execution/ColumnarWindowExec.scala:120-167;
  * no ROWS/RANGE frame handling exists). Spark gives us full frame specs,
  * dense_rank/row_number/lag/lead/ntile/percent_rank as a superset — all
  * covered here. Determinism rules for the oracle: every ORDER BY inside a
  * window carries a unique-key tiebreak, and windowed sums go through exact
  * decimal accumulation (graft.Exact).
  *
  * Scale note: a window's partitionBy is a shuffle key — every query below
  * partitions on a bounded-cardinality or well-distributed column, never on
  * a constant (which would serialize 100 TB through one task). The one global
  * window (ntile) is documented as driver-bound and kept on a dimension table.
  */
object Windows {

  /** rank + dense_rank, top-3 orders per priority class. */
  val rank = QueryDef(
    "q_window_rank",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(spark, dir, "orders")
        .withColumn("rnk", org.apache.spark.sql.functions.rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), col("rnk").cast("long").as("rnk"),
          col("drnk").cast("long").as("drnk"))
    },
    Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rnk <= 3"""))

  /** row_number top-5 customers by balance per market segment. */
  val rowNumber = QueryDef(
    "q_window_row_number",
    (spark, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(spark, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          col("rn").cast("long").as("rn"))
    },
    Some("""
      SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn
      FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
      WHERE rn <= 5"""))

  /** Running (cumulative) spend per customer — ROWS frame, the frame kind the
    * reference cannot express. Exact decimal accumulation for determinism. */
  val runningSum = QueryDef(
    "q_window_running_sum",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir, "orders")
        .withColumn("cum_spend", sum(cents(col("o_totalprice"))).over(w)
          .cast("double") / lit(100.0))
        .withColumn("ord_idx", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("ord_idx"),
          col("cum_spend"))
    },
    Some(s"""
      SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER w AS BIGINT) AS ord_idx,
             CAST(sum(${centsSql("o_totalprice")})
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / 100.0 AS cum_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""))

  /** Numeric RANGE frame: parts within ±2 size of the current row. */
  val rangeFrame = QueryDef.sqlSame(
    "q_window_range_frame",
    s"""SELECT p_partkey, p_type, p_size,
              CAST(count(*) OVER w AS BIGINT) AS n_near,
              CAST(sum(${centsSql("p_retailprice")}) OVER w AS DOUBLE) / 100.0
                AS sum_near_price
       FROM part
       WINDOW w AS (PARTITION BY p_type ORDER BY p_size
                    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)""")

  /** lag/lead across a customer's order history. */
  val lagLead = QueryDef(
    "q_window_lag_lead",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(spark, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          coalesce(lag(col("o_totalprice"), 2, 0.0).over(w), lit(0.0))
            .as("prev2_price"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price,
             coalesce(lag(o_totalprice, 2) OVER w, 0.0) AS prev2_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""))

  /** ntile + percent_rank + cume_dist over a global ordering
    * (dimension-table sized). With a unique-key tiebreak both rank
    * fractions are exact integer ratios → bit-identical doubles. */
  val ntileQ = QueryDef.sqlSame(
    "q_window_ntile",
    """SELECT tile, count(*) AS n,
              min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
              max(pr) AS max_pr, max(cd) AS max_cd
       FROM (
         SELECT c_acctbal,
                CAST(ntile(4) OVER w AS BIGINT) AS tile,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd
         FROM customer
         WINDOW w AS (ORDER BY c_acctbal, c_custkey))
       GROUP BY tile""")

  /** Whole-partition frame — the only frame the reference supports
    * (ColumnarWindowExec.scala:120-167): per-flag totals attached to rows,
    * reduced back to one row per partition for a stable result. */
  val partitionFrame = QueryDef.sqlSame(
    "q_window_partition_frame",
    s"""SELECT DISTINCT l_returnflag,
              CAST(sum(${centsSql("l_quantity")}) OVER p AS DOUBLE) / 100.0
                AS part_sum_qty,
              min(l_quantity) OVER p AS part_min_qty,
              max(l_quantity) OVER p AS part_max_qty,
              CAST(count(*) OVER p AS BIGINT) AS part_n
       FROM lineitem
       WINDOW p AS (PARTITION BY l_returnflag)""")

  /** first_value / last_value / nth_value over an explicit frame. */
  val valueFns = QueryDef.sqlSame(
    "q_window_value_fns",
    """SELECT o_custkey, o_orderkey,
              first_value(o_totalprice) OVER w AS first_price,
              last_value(o_totalprice) OVER w AS last_price,
              nth_value(o_totalprice, 2) OVER w AS second_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")

  /** Partitioned distribution functions — percent_rank/cume_dist keyed by
    * market segment (q_window_ntile covers the GLOBAL variants; this pins
    * the per-partition path, the one that scales). Exact-rational outputs:
    * both functions are ratios of integer ranks, identical across engines. */
  val distFns = QueryDef.sqlSame(
    "q_window_dist",
    """SELECT c_mktsegment, c_custkey,
              percent_rank() OVER w AS pr,
              cume_dist() OVER w AS cd
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal, c_custkey)""")

  val all: Seq[QueryDef] = Seq(
    rank, rowNumber, runningSum, rangeFrame, lagLead, ntileQ, partitionFrame,
    valueFns, distFns)
}
