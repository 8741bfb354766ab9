package graft.operators

import scala.io.Source

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERBATIM TPC-DS query texts over a derived micro-schema — the round-10
  * upgrade of [[TpcdsShapes]] (which pins the COMPOSITE planner shapes
  * ds1–ds99 exercise): 14 of the reference's actual query files
  * (reference corpus: native-sql-engine/core/src/test/resources/tpcds/,
  * 103 queries; the texts ship unmodified under
  * resources/tpcds-verbatim/) now run END TO END, character for
  * character, against a deterministic TPC-DS-shaped fixture synthesized
  * from the existing TPC-H-ish parquet tables at query time.
  *
  * Fixture mechanics: each TPC-DS table (store_sales, store_returns,
  * date_dim, item, store, customer, customer_address,
  * household_demographics, time_dim) is ONE dialect-portable SQL text
  * over `tpch_*`-aliased base tables — the same text registers the Spark
  * temp views AND becomes a WITH-prefix on the DuckDB oracle, so both
  * engines derive byte-identical fixtures from the same parquet and the
  * driver's hash compare stays exact. Attributes are arithmetic
  * derivations of the base keys (modular skews, md5-free — plain `%` and
  * CASE ladders both engines fold identically); money columns are
  * INTEGER-VALUED DOUBLES (exact under any summation order below 2^53,
  * and — unlike DECIMAL — they round-trip the driver comparator
  * identically on both sides: DuckDB's wide-decimal sums come back to
  * pandas as float64, so a decimal fixture would hash-mismatch on
  * trailing zeros). The fixture scales with the sf dir (~60k store
  * sales rows at sf0.01) and every selected query returns rows there
  * (TpcdsVerbatimSpec pins that).
  *
  * Query selection: the 14 texts whose OUTPUT columns are
  * dialect-stable — counts, exact integer-double sums, strings, keys.
  * Queries
  * whose output includes decimal DIVISION or windowed AVG (q36 gross
  * margin, q89 avg deviation, q59/q98 ratios) are left to their
  * [[TpcdsShapes]] planner twins: Spark divides decimals into
  * wider-scale decimals while DuckDB yields doubles, so their rendered
  * values cannot hash-match cross-engine even when semantically equal
  * (documented dialect boundary, not an engine gap; AVG/ratio
  * comparisons INSIDE predicates — q1, q6, q65 — are fine because only
  * the comparison outcome surfaces). */
object TpcdsVerbatim {

  /** (view name, portable defining SQL) in dependency order; `tpch_*`
    * aliases keep the oracle's WITH-prefix from self-shadowing the base
    * parquet tables. */
  val fixtures: Seq[(String, String)] = Seq(
    "date_dim" ->
      """SELECT i AS d_date_sk,
                CAST(1998 + (i % 5) AS INT) AS d_year,
                CAST(1 + (i % 12) AS INT) AS d_moy,
                CAST(1 + (i % 28) AS INT) AS d_dom,
                CAST(i % 7 AS INT) AS d_dow,
                CAST(1152 + (i % 5) * 12 + 1 + (i % 12) AS INT)
                  AS d_month_seq
         FROM (SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS INT)
                        AS i
               FROM tpch_orders) n
         WHERE i <= 1500""",
    "time_dim" ->
      """SELECT CAST(p_partkey AS INT) AS t_time_sk,
                CAST(p_partkey % 24 AS INT) AS t_hour,
                CAST((p_partkey * 7) % 60 AS INT) AS t_minute
         FROM tpch_part WHERE p_partkey BETWEEN 1 AND 200""",
    "household_demographics" ->
      """SELECT CAST(p_partkey AS INT) AS hd_demo_sk,
                CAST(p_partkey % 8 AS INT) AS hd_dep_count,
                CAST(p_partkey % 5 AS INT) AS hd_vehicle_count,
                CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN '>10000'
                     WHEN 1 THEN 'unknown' ELSE '5001-10000' END
                  AS hd_buy_potential
         FROM tpch_part WHERE p_partkey BETWEEN 1 AND 20""",
    "store" ->
      """SELECT CAST(s_suppkey AS INT) AS s_store_sk,
                CASE CAST(s_suppkey % 2 AS INT)
                  WHEN 0 THEN 'ese' ELSE 'able' END AS s_store_name,
                'TN' AS s_state,
                CASE CAST(s_suppkey % 2 AS INT)
                  WHEN 0 THEN 'Williamson County'
                  ELSE 'Orange County' END AS s_county,
                CASE CAST(s_suppkey % 2 AS INT)
                  WHEN 0 THEN 'Midway' ELSE 'Fairview' END AS s_city,
                CAST(190 + s_suppkey * 18 AS INT) AS s_number_employees,
                CAST(10000 + s_suppkey * 1111 AS STRING) AS s_zip
         FROM tpch_supplier WHERE s_suppkey BETWEEN 1 AND 6""",
    "item" ->
      """SELECT CAST(p_partkey AS INT) AS i_item_sk,
                'prod_' || CAST(p_partkey AS STRING) AS i_product_name,
                'desc_' || CAST(p_partkey % 97 AS STRING) AS i_item_desc,
                'Brand#' || CAST(1 + p_partkey % 25 AS STRING) AS i_brand,
                CAST(1 + p_partkey % 25 AS INT) AS i_brand_id,
                CASE CAST(p_partkey % 7 AS INT)
                  WHEN 0 THEN 128
                  WHEN 1 THEN CAST(738 + p_partkey % 40 AS INT)
                  ELSE CAST(100 + p_partkey % 60 AS INT) END
                  AS i_manufact_id,
                'manu#' || CAST(p_partkey % 30 AS STRING) AS i_manufact,
                CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'Women'
                     WHEN 1 THEN 'Men' ELSE 'Children' END AS i_category,
                CAST(1 + p_partkey % 10 AS INT) AS i_category_id,
                'class' || CAST(p_partkey % 10 AS STRING) AS i_class,
                CAST(1 + p_partkey % 40 AS INT) AS i_manager_id,
                CAST(p_partkey * 37 % 90 + 1 AS DOUBLE) AS i_current_price,
                CAST(p_partkey * 23 % 50 + 1 AS DOUBLE)
                  AS i_wholesale_cost,
                CASE CAST(p_partkey % 16 AS INT)
                  WHEN 0 THEN 'powder' WHEN 1 THEN 'khaki'
                  WHEN 2 THEN 'brown' WHEN 3 THEN 'honeydew'
                  WHEN 4 THEN 'floral' WHEN 5 THEN 'deep'
                  WHEN 6 THEN 'light' WHEN 7 THEN 'cornflower'
                  WHEN 8 THEN 'midnight' WHEN 9 THEN 'snow'
                  WHEN 10 THEN 'cyan' WHEN 11 THEN 'papaya'
                  WHEN 12 THEN 'orange' WHEN 13 THEN 'frosted'
                  WHEN 14 THEN 'forest' ELSE 'ghost' END AS i_color,
                CASE CAST(p_partkey % 16 AS INT)
                  WHEN 0 THEN 'Ounce' WHEN 1 THEN 'Oz'
                  WHEN 2 THEN 'Bunch' WHEN 3 THEN 'Ton'
                  WHEN 4 THEN 'N/A' WHEN 5 THEN 'Dozen'
                  WHEN 6 THEN 'Box' WHEN 7 THEN 'Pound'
                  WHEN 8 THEN 'Pallet' WHEN 9 THEN 'Gross'
                  WHEN 10 THEN 'Cup' WHEN 11 THEN 'Dram'
                  WHEN 12 THEN 'Each' WHEN 13 THEN 'Tbl'
                  WHEN 14 THEN 'Lb' ELSE 'Bundle' END AS i_units,
                CASE CAST(p_partkey % 6 AS INT)
                  WHEN 0 THEN 'medium' WHEN 1 THEN 'extra large'
                  WHEN 2 THEN 'N/A' WHEN 3 THEN 'small'
                  WHEN 4 THEN 'petite' ELSE 'large' END AS i_size
         FROM tpch_part WHERE p_partkey BETWEEN 1 AND 400""",
    "customer_address" ->
      """SELECT CAST(k AS INT) AS ca_address_sk,
                'city_' || CAST(k % 30 AS STRING) AS ca_city,
                CASE CAST(k % 8 AS INT)
                  WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'NY'
                  WHEN 3 THEN 'TX' WHEN 4 THEN 'GA' WHEN 5 THEN 'OH'
                  WHEN 6 THEN 'IL' ELSE 'WA' END AS ca_state,
                CAST(10000 + (k * 37) % 90000 AS STRING) AS ca_zip
         FROM (SELECT CAST(row_number() OVER (ORDER BY o_orderkey)
                           AS BIGINT) AS k FROM tpch_orders) n
         WHERE k <= 600""",
    "customer" ->
      """SELECT CAST(k AS INT) AS c_customer_sk,
                'CUST' || CAST(k AS STRING) AS c_customer_id,
                'F' || CAST(k % 97 AS STRING) AS c_first_name,
                'L' || CAST(k % 89 AS STRING) AS c_last_name,
                CASE CAST(k % 4 AS INT) WHEN 0 THEN 'Mr.'
                     WHEN 1 THEN 'Ms.' WHEN 2 THEN 'Dr.' ELSE 'Sir' END
                  AS c_salutation,
                CASE CAST(k % 2 AS INT)
                  WHEN 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
                CAST(1 + (k * 13) % 600 AS INT) AS c_current_addr_sk
         FROM (SELECT CAST(row_number() OVER (ORDER BY o_orderkey)
                           AS BIGINT) AS k FROM tpch_orders) n
         WHERE k <= 1500""",
    "store_sales" ->
      """SELECT CAST(1 + (l_orderkey * 7 + l_linenumber) % 1460 AS INT)
                  AS ss_sold_date_sk,
                CAST(1 + (l_orderkey * 3 + l_linenumber) % 200 AS INT)
                  AS ss_sold_time_sk,
                CAST(1 + l_partkey % 400 AS INT) AS ss_item_sk,
                CAST(1 + l_orderkey % 500 AS INT) AS ss_customer_sk,
                CAST(1 + l_suppkey % 6 AS INT) AS ss_store_sk,
                CAST(1 + l_partkey % 20 AS INT) AS ss_hdemo_sk,
                CAST(1 + (l_orderkey + l_suppkey) % 600 AS INT)
                  AS ss_addr_sk,
                l_orderkey AS ss_ticket_number,
                CAST((c * 7) % 999 AS DOUBLE) AS ss_ext_sales_price,
                CAST((c * 11) % 999 AS DOUBLE) AS ss_ext_list_price,
                CAST((c * 3) % 99 AS DOUBLE) AS ss_ext_tax,
                CAST((c * 5) % 199 AS DOUBLE) AS ss_sales_price,
                CAST((c * 2) % 99 AS DOUBLE) AS ss_coupon_amt,
                CAST(((c * 13) % 199) - 100 AS DOUBLE) AS ss_net_profit
         FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                      CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
               FROM tpch_lineitem) b""",
    "store_returns" ->
      """SELECT CAST(1 + (l_orderkey * 7 + l_linenumber) % 1460 AS INT)
                  AS sr_returned_date_sk,
                CAST(1 + l_orderkey % 500 AS INT) AS sr_customer_sk,
                CAST(1 + l_suppkey % 6 AS INT) AS sr_store_sk,
                CAST((CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * 3) % 999 AS DOUBLE) AS sr_return_amt
         FROM tpch_lineitem WHERE l_returnflag = 'R'""")

  /** TPC-H base tables the fixture derives from */
  private val baseTables =
    Seq("orders", "lineitem", "part", "supplier")

  val queryNames: Seq[String] = Seq("q1", "q3", "q6", "q19", "q41", "q42",
    "q52", "q55", "q65", "q68", "q73", "q79", "q88", "q96")

  private def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  def queryText(q: String): String = resource(s"/tpcds-verbatim/$q.sql")

  /** DuckDB oracle: the fixture CTE prefix merged with the verbatim query
    * (a leading WITH in the query folds into the prefix's clause list). */
  def oracleFor(q: String): String = {
    val prefix = baseTables.map(t => s"tpch_$t AS (SELECT * FROM $t)") ++
      fixtures.map { case (n, sql) => s"$n AS ($sql)" }
    val body = queryText(q).trim
    if (body.toUpperCase.startsWith("WITH "))
      s"WITH ${prefix.mkString(",\n")},\n${body.drop(5)}"
    else
      s"WITH ${prefix.mkString(",\n")}\n$body"
  }

  /** Unaliased aggregate output columns get engine-specific auto-names
    * (Spark `count(1)` vs DuckDB `count_star()`); the comparator matches
    * columns BY NAME, so those few outputs are renamed to the DuckDB
    * spelling after the verbatim text has run. Harness shim, not a query
    * change. */
  private val renames: Map[String, Seq[String]] = Map(
    "q96" -> Seq("count_star()"))

  /** Register the fixture views on an isolated session and run the
    * verbatim text. */
  def run(outer: SparkSession, dir: String, q: String): DataFrame = {
    val spark = outer.newSession()
    Tables.registerAll(spark, dir)
    baseTables.foreach(t =>
      spark.table(t).createOrReplaceTempView(s"tpch_$t"))
    fixtures.foreach { case (n, sql) =>
      spark.sql(sql).createOrReplaceTempView(n) }
    val df = spark.sql(queryText(q))
    renames.get(q).map(ns => df.toDF(ns: _*)).getOrElse(df)
  }

  def queryFor(q: String): QueryDef = QueryDef(
    s"q_tpcds_verbatim_$q",
    (spark, dir) => run(spark, dir, q),
    Some(oracleFor(q)))

  lazy val all: Seq[QueryDef] = queryNames.map(queryFor)
}
