package graft.operators

import graft.QueryDef
import graft.Exact._

/** Subquery capability surface.
  *
  * The reference wraps scalar subqueries as `ColumnarScalarSubquery`
  * (reference: core/com/intel/oap/expression/ColumnarSubquery.scala:38) and
  * relies on Catalyst's rewrite of IN/EXISTS into semi/anti/existence joins
  * (covered in Joins.scala). Here: uncorrelated + correlated scalar
  * subqueries, CTE chains, and lateral joins — all Catalyst-planned; the
  * correlated forms decorrelate into joins, so they scale like joins.
  */
object Subqueries {

  /** Uncorrelated scalar subquery (one broadcast value). The average is
    * computed in exact decimal so both engines derive the same threshold. */
  val scalarUncorrelated = QueryDef.sqlSame(
    "q_subq_scalar",
    s"""SELECT c_mktsegment, count(*) AS n_above
       FROM customer
       WHERE c_acctbal > (SELECT CAST(sum(${centsSql("c_acctbal")})
                                      AS DOUBLE) / 100.0
                                   / CAST(count(*) AS DOUBLE)
                          FROM customer)
       GROUP BY c_mktsegment""")

  /** Correlated scalar subquery — decorrelates to an aggregate + join. */
  val scalarCorrelated = QueryDef.sqlSame(
    "q_subq_scalar_corr",
    """SELECT o_orderkey, o_totalprice,
              (SELECT count(*) FROM lineitem
               WHERE l_orderkey = o_orderkey) AS n_items
       FROM orders
       WHERE o_totalprice > 150000.0""")

  /** CTE chain: two WITH stages feeding a join. */
  val cteChain = QueryDef.sqlSame(
    "q_subq_cte",
    s"""WITH cust_spend AS (
         SELECT o_custkey,
                ${sumdSql("o_totalprice")} AS spend,
                count(*) AS n_orders
         FROM orders GROUP BY o_custkey),
       big_spenders AS (
         SELECT o_custkey, spend FROM cust_spend WHERE n_orders >= 10)
       SELECT c_mktsegment, count(*) AS n,
              ${sumdSql("spend")} AS total_spend
       FROM big_spenders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""")

  /** Lateral correlated subquery join (Spark 3.2+ LATERAL). */
  val lateralJoin = QueryDef.sqlSame(
    "q_subq_lateral",
    """SELECT c_custkey, t.n_urgent
       FROM customer,
       LATERAL (SELECT count(*) AS n_urgent FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT') t
       WHERE c_acctbal > 9500.0""")

  /** Subquery in HAVING — aggregate compared against a global aggregate. */
  val havingSubquery = QueryDef.sqlSame(
    "q_subq_having",
    """SELECT l_suppkey, count(*) AS n
       FROM lineitem
       GROUP BY l_suppkey
       HAVING count(*) > (SELECT count(*) FROM lineitem) /
                         (SELECT count(*) FROM supplier)""")

  val all: Seq[QueryDef] = Seq(
    scalarUncorrelated, scalarCorrelated, cteChain, lateralJoin, havingSubquery)
}
