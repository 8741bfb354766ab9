package graft.operators

import graft.QueryDef
import graft.Exact._

/** The Star Schema Benchmark's 13 queries (reference ships them as its
  * third corpus: native-sql-engine/core/src/test/resources/ssb/1.1.sql..
  * 4.3.sql), adapted to the fixture schemas. SSB's denormalized `lineorder`
  * fact becomes lineitem (⋈ orders when the customer side is needed); the
  * `date` dimension — the benchmark's signature join — is derived as the
  * distinct ship dates with year/month/week attributes (a few-thousand-row
  * dim that Spark auto-broadcasts); city attributes (absent here) are
  * deterministic key buckets, and supplycost (absent) reuses the q9
  * retail-cost proxy.
  *
  * The four flights keep their defining plan shapes: flight 1 = fact ×
  * broadcast date dim, pure scan throughput; flight 2 = 3-dim star with a
  * narrowing part filter; flight 3 = customer×supplier nation/city matrix
  * with date-range narrowing; flight 4 = all-dims profit rollup. At 100 TB
  * every one is a single fact scan with broadcast dims — no shape here
  * shuffles the fact table more than once (the flight-3/4 orders join is
  * the one big⋈big exchange, exactly as in TPC-H q3/q5).
  *
  * Money aggregates accumulate in exact int64 basis points ([[graft.Exact]])
  * so both engines emit bit-identical doubles.
  */
object Ssb {

  private val rev =
    s"""CAST(sum(${centsSql("l_extendedprice")} *
       (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000.0"""

  private val discRev =
    s"""CAST(sum(${centsSql("l_extendedprice")} *
       ${centsSql("l_discount")}) AS DOUBLE) / 10000.0"""

  private val profit =
    s"""CAST(sum(${centsSql("l_extendedprice")} *
       (100 - ${centsSql("l_discount")})
       - ${centsSql("p_retailprice")} * ${centsSql("l_quantity")})
       AS DOUBLE) / 10000.0"""

  private val dates =
    """dates AS (
      SELECT DISTINCT l_shipdate AS d_datekey,
             CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(month(l_shipdate) AS INT) AS d_month,
             CAST(weekofyear(l_shipdate) AS INT) AS d_week
      FROM lineitem)"""

  /** customer/supplier sides widened with nation + deterministic city
    * buckets (SSB's c_city/s_city have no fixture counterpart). */
  private val city =
    """cust AS (
      SELECT c_custkey, n_name AS c_nation,
             CAST(c_custkey % 10 AS INT) AS c_city,
             n_regionkey AS c_regionkey
      FROM customer, nation WHERE c_nationkey = n_nationkey),
    supp AS (
      SELECT s_suppkey, n_name AS s_nation,
             CAST(s_suppkey % 10 AS INT) AS s_city,
             n_regionkey AS s_regionkey
      FROM supplier, nation WHERE s_nationkey = n_nationkey)"""

  private def flight1(name: String, where: String) = QueryDef.sqlSame(
    name,
    s"""WITH $dates
       SELECT $discRev AS revenue, count(*) AS n
       FROM lineitem, dates
       WHERE l_shipdate = d_datekey AND $where""")

  val q1_1 = flight1("q_ssb_q1_1",
    """d_year = 1997
      AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25.0""")
  val q1_2 = flight1("q_ssb_q1_2",
    """d_year = 1997 AND d_month = 6
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity BETWEEN 26.0 AND 35.0""")
  val q1_3 = flight1("q_ssb_q1_3",
    """d_week = 6 AND d_year = 1997
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity BETWEEN 26.0 AND 35.0""")

  private def flight2(name: String, where: String) = QueryDef.sqlSame(
    name,
    s"""WITH $dates
       SELECT $rev AS revenue, d_year, p_brand
       FROM lineitem, dates, part, supplier, nation, region
       WHERE l_shipdate = d_datekey AND l_partkey = p_partkey
         AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         AND n_regionkey = r_regionkey AND $where
       GROUP BY d_year, p_brand""")

  val q2_1 = flight2("q_ssb_q2_1",
    "p_type = 'PROMO' AND r_name = 'AMERICA'")
  val q2_2 = flight2("q_ssb_q2_2",
    "p_brand BETWEEN 'Brand#21' AND 'Brand#25' AND r_name = 'ASIA'")
  val q2_3 = flight2("q_ssb_q2_3",
    "p_brand = 'Brand#22' AND r_name = 'EUROPE'")

  val q3_1 = QueryDef.sqlSame(
    "q_ssb_q3_1",
    s"""WITH $dates, $city
       SELECT c_nation, s_nation, d_year, $rev AS revenue
       FROM cust, lineitem, orders, supp, dates, region r1, region r2
       WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND l_shipdate = d_datekey
         AND c_regionkey = r1.r_regionkey AND r1.r_name = 'ASIA'
         AND s_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA'
         AND d_year BETWEEN 1995 AND 1997
       GROUP BY c_nation, s_nation, d_year""")

  private def flight3City(name: String, where: String) = QueryDef.sqlSame(
    name,
    s"""WITH $dates, $city
       SELECT c_city, s_city, d_year, $rev AS revenue
       FROM cust, lineitem, orders, supp, dates
       WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND l_shipdate = d_datekey
         AND $where
       GROUP BY c_city, s_city, d_year""")

  val q3_2 = flight3City("q_ssb_q3_2",
    """c_nation = 'NATION_5' AND s_nation = 'NATION_5'
      AND d_year BETWEEN 1995 AND 1997""")
  val q3_3 = flight3City("q_ssb_q3_3",
    """c_city IN (1, 2) AND s_city IN (1, 2)
      AND d_year BETWEEN 1995 AND 1997""")
  val q3_4 = flight3City("q_ssb_q3_4",
    """c_city IN (1, 2) AND s_city IN (1, 2)
      AND d_year = 1997 AND d_month = 12""")

  val q4_1 = QueryDef.sqlSame(
    "q_ssb_q4_1",
    s"""WITH $dates, $city
       SELECT d_year, c_nation, $profit AS profit
       FROM dates, cust, supp, part, lineitem, orders, region r1, region r2
       WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND l_partkey = p_partkey
         AND l_shipdate = d_datekey
         AND c_regionkey = r1.r_regionkey AND r1.r_name = 'AMERICA'
         AND s_regionkey = r2.r_regionkey AND r2.r_name = 'AMERICA'
         AND p_type IN ('ECONOMY', 'PROMO')
       GROUP BY d_year, c_nation""")

  val q4_2 = QueryDef.sqlSame(
    "q_ssb_q4_2",
    s"""WITH $dates, $city
       SELECT d_year, s_nation, p_type, $profit AS profit
       FROM dates, cust, supp, part, lineitem, orders, region r1, region r2
       WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND l_partkey = p_partkey
         AND l_shipdate = d_datekey
         AND c_regionkey = r1.r_regionkey AND r1.r_name = 'AMERICA'
         AND s_regionkey = r2.r_regionkey AND r2.r_name = 'AMERICA'
         AND d_year IN (1997, 1998)
         AND p_type IN ('ECONOMY', 'PROMO')
       GROUP BY d_year, s_nation, p_type""")

  val q4_3 = QueryDef.sqlSame(
    "q_ssb_q4_3",
    s"""WITH $dates, $city
       SELECT d_year, s_city, p_brand, $profit AS profit
       FROM dates, cust, supp, part, lineitem, orders
       WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND l_partkey = p_partkey
         AND l_shipdate = d_datekey
         AND s_nation = 'NATION_3'
         AND d_year IN (1997, 1998)
         AND p_type = 'ECONOMY'
       GROUP BY d_year, s_city, p_brand""")

  val all: Seq[QueryDef] = Seq(
    q1_1, q1_2, q1_3, q2_1, q2_2, q2_3,
    q3_1, q3_2, q3_3, q3_4, q4_1, q4_2, q4_3)
}
