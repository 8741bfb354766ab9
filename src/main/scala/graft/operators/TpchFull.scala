package graft.operators

import graft.QueryDef
import graft.Exact._

/** The 14 TPC-H query shapes not covered by [[Tpch]]/[[Joins]] — completing
  * the reference's primary corpus (reference: native-sql-engine/core/src/test/
  * resources/tpch/q1.sql..q22.sql, runner tpc/h/TPCHSuite.scala:21-60).
  *
  * Adapted to the fixture schemas (FIXTURES.md §A): there is no `partsupp`
  * table, so q2/q11/q16/q20 derive the part↔supplier relation from lineitem;
  * no commit/receipt dates, so q4/q21 define "late" as shipped >60 days after
  * the order date; no c_phone/o_comment, so q13/q22 substitute columns with
  * the same type shape. Every adaptation preserves the query's *planner*
  * shape — these exist to exercise decorrelation (q2/q17), EXISTS→semi
  * (q4), NOT-EXISTS anti chains (q21/q22), nested IN + grouped HAVING (q20),
  * global-ratio scalar subqueries (q11/q15), and left-outer double
  * aggregation (q13) — paths no hand-built DataFrame query in this repo
  * reaches. Expressed as SQL (identical text runs on Spark and DuckDB):
  * Catalyst's subquery decorrelation IS the capability under test.
  *
  * Determinism: money aggregates accumulate in exact int64 cents /
  * basis-points ([[graft.Exact]]) and convert to double once at the end, so
  * both engines emit bit-identical values regardless of accumulation order.
  * At 100 TB every aggregate here remains a partial/final hash-agg on
  * primitive longs, joins stay on key columns (shuffle or broadcast chosen
  * by AQE), and no query materializes an unbounded intermediate.
  */
object TpchFull {

  /** Q2 shape: min-cost supplier — correlated scalar MIN subquery that must
    * decorrelate into an aggregate+join. `ps` (the partsupp surrogate) is a
    * CTE referenced from both the outer query and the subquery. */
  val q2 = QueryDef.sqlSame(
    "q_tpch_q2",
    """WITH ps AS (
         SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                min(l_extendedprice / l_quantity) AS ps_supplycost
         FROM lineitem GROUP BY 1, 2)
       SELECT s_name, n_name, p_partkey, p_name, ps_supplycost
       FROM part, ps, supplier, nation, region
       WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         AND p_type = 'LARGE' AND p_size <= 15
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND ps_supplycost = (
           SELECT min(ps2.ps_supplycost)
           FROM ps ps2, supplier s2, nation n2, region r2
           WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
             AND s2.s_nationkey = n2.n_nationkey
             AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
       ORDER BY s_name, p_partkey LIMIT 100""")

  /** Q4 shape: order-priority checking — EXISTS rewritten to a left-semi
    * join with a non-equi correlated predicate ("late" = shipped >60d after
    * order date, standing in for commit<receipt). */
  val q4 = QueryDef.sqlSame(
    "q_tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority""")

  /** Q7 shape: volume shipping between two nations — 6-table join with a
    * symmetric OR nation-pair predicate and per-year conditional revenue. */
  val q7 = QueryDef.sqlSame(
    "q_tpch_q7",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INT) AS l_year,
              ${sumProdDSql("l_extendedprice", "l_discount")} AS revenue
       FROM supplier, lineitem, orders, customer, nation n1, nation n2
       WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         AND c_custkey = o_custkey
         AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY 1, 2, 3""")

  /** Q8 shape: national market share — 8-table snowflake with a conditional
    * share-of-total ratio; volume kept in exact integer basis points until
    * the final division. */
  val q8 = QueryDef.sqlSame(
    "q_tpch_q8",
    s"""SELECT o_year,
              CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END)
                   AS DOUBLE) / CAST(sum(vol) AS DOUBLE) AS mkt_share
       FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                    ${centsSql("l_extendedprice")} *
                      (100 - ${centsSql("l_discount")}) AS vol,
                    n2.n_name AS nation
             FROM part, lineitem, supplier, orders, customer,
                  nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey
               AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
               AND s_nationkey = n2.n_nationkey
               AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
               AND p_type = 'ECONOMY') t
       GROUP BY o_year""")

  /** Q9 shape: product-type profit by nation/year — LIKE-filtered part join
    * feeding a two-key aggregate; profit = revenue − retail cost of the
    * quantity (the fixture has no ps_supplycost), all in integer units. */
  val q9 = QueryDef.sqlSame(
    "q_tpch_q9",
    s"""SELECT nation, o_year,
              CAST(sum(amount) AS DOUBLE) / 10000.0 AS sum_profit
       FROM (SELECT n_name AS nation,
                    CAST(year(o_orderdate) AS INT) AS o_year,
                    ${centsSql("l_extendedprice")} *
                      (100 - ${centsSql("l_discount")})
                      - ${centsSql("p_retailprice")} *
                        ${centsSql("l_quantity")} AS amount
             FROM part, supplier, lineitem, orders, nation
             WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
               AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%widget%') t
       GROUP BY nation, o_year""")

  /** Q10 shape: returned-item reporting — fact⋈dims with a quarter window,
    * grouped on five customer attributes, top-20 by exact revenue. */
  val q10 = QueryDef.sqlSame(
    "q_tpch_q10",
    s"""SELECT c_custkey, c_name,
              ${sumProdDSql("l_extendedprice", "l_discount")} AS revenue,
              c_acctbal, n_name, c_mktsegment
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
       ORDER BY revenue DESC, c_custkey LIMIT 20""")

  /** Q11 shape: important stock — a grouped value table compared against a
    * scalar fraction of its own global sum (uncorrelated scalar subquery
    * over the same CTE). Exact: value_c*800 > sum ⟺ share > 1/800. */
  val q11 = QueryDef.sqlSame(
    "q_tpch_q11",
    s"""WITH ps AS (
         SELECT l_partkey, sum(${centsSql("l_extendedprice")}) AS value_c
         FROM lineitem, supplier, nation
         WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name IN ('NATION_1', 'NATION_6', 'NATION_11')
         GROUP BY l_partkey)
       SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
       FROM ps
       WHERE value_c * 800 > (SELECT sum(value_c) FROM ps)
       ORDER BY value_c DESC, l_partkey""")

  /** Q13 shape: customer order-count distribution — left outer join with an
    * extra ON-clause filter (o_orderpriority standing in for the o_comment
    * NOT LIKE), then a second aggregation over the first's counts. */
  val q13 = QueryDef.sqlSame(
    "q_tpch_q13",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey
               AND o_orderpriority <> '4-NOT SPECIFIED'
             GROUP BY c_custkey) t
       GROUP BY c_count""")

  /** Q15 shape: top supplier — revenue view + scalar MAX subquery over the
    * same view; revenue held in exact basis points so the max-equality
    * predicate is integer-exact on both engines. */
  val q15 = QueryDef.sqlSame(
    "q_tpch_q15",
    s"""WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                sum(${centsSql("l_extendedprice")} *
                    (100 - ${centsSql("l_discount")})) AS total_revenue_bp
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name,
              CAST(total_revenue_bp AS DOUBLE) / 10000.0 AS total_revenue
       FROM supplier, revenue
       WHERE s_suppkey = supplier_no
         AND total_revenue_bp = (SELECT max(total_revenue_bp) FROM revenue)
       ORDER BY s_suppkey""")

  /** Q16 shape: parts/supplier relationship — NOT IN (null-aware anti join)
    * against a filtered supplier list plus COUNT(DISTINCT) per part attrs
    * (the part↔supplier relation comes from lineitem; no partsupp). */
  val q16 = QueryDef.sqlSame(
    "q_tpch_q16",
    """SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         AND l_suppkey NOT IN
               (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
       GROUP BY p_brand, p_type, p_size""")

  /** Q17 shape: small-quantity-order revenue — correlated scalar AVG
    * subquery per part (decorrelates to agg+join). The average is computed
    * as exact-cents-sum / count so the 0.2× threshold is bit-identical on
    * both engines (double accumulation would be order-dependent). */
  val q17 = QueryDef.sqlSame(
    "q_tpch_q17",
    s"""SELECT CAST(sum(${centsSql("l_extendedprice")}) AS DOUBLE) / 700.0
                AS avg_yearly
       FROM lineitem, part
       WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
         AND p_type = 'SMALL'
         AND l_quantity < (
           SELECT 0.2 * (CAST(sum(${centsSql("l_quantity")}) AS DOUBLE)
                         / 100.0 / CAST(count(*) AS DOUBLE))
           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""")

  /** Q20 shape: potential part promotion — nested IN whose subquery is a
    * grouped HAVING over a LIKE-filtered join (availqty>½·sum becomes a
    * fixed quantity threshold; the nesting is what's under test). */
  val q20 = QueryDef.sqlSame(
    "q_tpch_q20",
    s"""SELECT s_name, s_nationkey
       FROM supplier, nation
       WHERE s_suppkey IN (
           SELECT l_suppkey
           FROM lineitem, part
           WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
             AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           GROUP BY l_suppkey, l_partkey
           HAVING sum(${centsSql("l_quantity")}) > 5000)
         AND s_nationkey = n_nationkey
         AND n_name IN ('NATION_0', 'NATION_5', 'NATION_10',
                        'NATION_15', 'NATION_20')
       ORDER BY s_name""")

  /** Q21 shape: suppliers who kept orders waiting — an EXISTS (semi) and a
    * NOT EXISTS (anti) self-join on lineitem, both correlated on the outer
    * order; "late" = shipped >60 days after the order date. */
  val q21 = QueryDef.sqlSame(
    "q_tpch_q21",
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         AND s_nationkey = n_nationkey
         AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 100""").copy(parityShape = true)

  /** Q21 rewritten for scale, against the ORIGINAL q21 oracle: the
    * EXISTS / NOT EXISTS pair only ask, per order, "how many distinct
    * suppliers?" and "how many of them were late?" — so one
    * lineitem⋈orders pass aggregated per (order, supplier), with the
    * per-order counts attached by a window over the reduced table,
    * replaces both correlated self-joins (three fact scans → one). A row
    * qualifies iff its supplier was late, the order has ≥2 suppliers, and
    * exactly one late supplier; numwait = the row's late-line count.
    * Warm at 30× data: 4.7s (self-join plan) → 1.9s; the gap widens with
    * scale because the self-joins shuffle the fact three times. */
  val q21Fast = QueryDef.sql(
    "q_tpch_q21_fast",
    """SELECT s_name, CAST(sum(n_late_rows) AS BIGINT) AS numwait
       FROM (
         SELECT l_suppkey, n_late_rows,
                count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                sum(CASE WHEN n_late_rows > 0 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY l_orderkey) AS n_late_supp
         FROM (
           SELECT l_orderkey, l_suppkey,
                  sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                           THEN 1 ELSE 0 END) AS n_late_rows
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'
           GROUP BY l_orderkey, l_suppkey) per_supp) flagged
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE n_late_rows > 0 AND n_supp >= 2 AND n_late_supp = 1
         AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 100""",
    // oracle: the canonical q21 formulation — the rewrite must reproduce it
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         AND s_nationkey = n_nationkey
         AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 100""")

  /** Q22 shape: global sales opportunity — substring-derived group key, an
    * uncorrelated scalar AVG threshold (exact cents), and a NOT EXISTS
    * anti join ("no urgent orders" stands in for "no orders", which would
    * be empty at this order density). */
  val q22 = QueryDef.sqlSame(
    "q_tpch_q22",
    s"""SELECT cntrycode, count(*) AS numcust,
              ${sumdSql("c_acctbal")} AS totacctbal
       FROM (SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal
             FROM customer
             WHERE substring(c_name, 17, 2) IN
                     ('13', '31', '23', '29', '30', '18', '17')
               AND c_acctbal > (SELECT ${avgdSql("c_acctbal")}
                                FROM customer WHERE c_acctbal > 0.0)
               AND NOT EXISTS (SELECT 1 FROM orders
                               WHERE o_custkey = c_custkey
                                 AND o_orderpriority = '1-URGENT')) t
       GROUP BY cntrycode""")

  val all: Seq[QueryDef] =
    Seq(q2, q4, q7, q8, q9, q10, q11, q13, q15, q16, q17, q20, q21, q21Fast,
      q22)
}
