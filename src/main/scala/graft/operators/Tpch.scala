package graft.operators

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** Additional TPC-H-shape headline queries (the reference's benchmark corpus
  * is TPC-H/TPC-DS derived — resources/tpch/, docs/index.md:128). Adapted to
  * the fixture schemas (FIXTURES.md §A; no partsupp table; dates are
  * timestamps). Each exercises a canonical plan shape at 100 TB:
  * q6 = pure scan+filter+agg (pushdown-bound), q12 = big join + conditional
  * agg, q14 = join + ratio of conditional sums, q18 = agg-filter-join top-k,
  * q19 = OR-of-ANDs predicate pushdown.
  */
object Tpch {

  /** Q6: forecasting revenue change — scan-dominated, fully pushed down. */
  val q6 = QueryDef(
    "q_tpch_q6",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24.0)
        .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .cast("double") / lit(10000.0)).as("revenue"),
          count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT CAST(sum(${centsSql("l_extendedprice")} *
                      ${centsSql("l_discount")}) AS DOUBLE) / 10000.0
               AS revenue,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24.0"""))

  /** Q12: shipping-priority counts — lineitem⋈orders with conditional agg. */
  val q12 = QueryDef(
    "q_tpch_q12",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = Tables(spark, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_returnflag"""))

  /** Q14: promo revenue share — ratio of conditional decimal sums. */
  val q14 = QueryDef(
    "q_tpch_q14",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      val p = Tables(spark, dir, "part")
      // revenue in integer basis-point units; one double division at the end
      val revBp = cents(col("l_extendedprice")) *
        (lit(100L) - cents(col("l_discount")))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", revBp).otherwise(lit(0L)))
            .cast("double") * 100.0 /
            sum(revBp).cast("double")).as("promo_revenue_pct"),
          count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN ${centsSql("l_extendedprice")} *
                                (100 - ${centsSql("l_discount")})
                           ELSE 0 END) AS DOUBLE) * 100.0 /
             CAST(sum(${centsSql("l_extendedprice")} *
                      (100 - ${centsSql("l_discount")})) AS DOUBLE)
               AS promo_revenue_pct,
             count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""))

  /** Q18: large-volume customers — agg → HAVING-style filter → join → top-k. */
  val q18 = QueryDef(
    "q_tpch_q18",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders")
      val c = Tables(spark, dir, "customer")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sumd(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some(s"""
      SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS odate_ms,
             o_totalprice, total_qty
      FROM (SELECT l_orderkey, ${sumdSql("l_quantity")} AS total_qty
            FROM lineitem GROUP BY l_orderkey) big
      JOIN orders ON big.l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE total_qty > 150.0
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** Q19: OR-of-ANDs predicate (discounted revenue for qualifying parts) —
    * exercises complex predicate pushdown/codegen. */
  val q19 = QueryDef(
    "q_tpch_q19",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val p = Tables(spark, dir, "part")
      val j = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      j.filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) &&
            col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 35) &&
            col("l_quantity").between(20.0, 30.0)))
        .agg(sumProdD(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT ${sumProdDSql("l_extendedprice", "l_discount")} AS revenue,
             count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1.0 AND 11.0)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
             AND l_quantity BETWEEN 10.0 AND 20.0)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
             AND l_quantity BETWEEN 20.0 AND 30.0)"""))

  val all: Seq[QueryDef] = Seq(q6, q12, q14, q18, q19)
}
