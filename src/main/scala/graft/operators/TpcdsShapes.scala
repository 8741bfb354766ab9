package graft.operators

import graft.QueryDef
import graft.Exact._

/** TPC-DS planner shapes (reference corpus: native-sql-engine/core/src/test/
  * resources/tpcds/, 103 queries + plan-stability goldens). The fixture has
  * no TPC-DS schema, so instead of transliterating queries this file covers
  * the COMPOSITE planner shapes TPC-DS exercises and nothing else in this
  * registry reaches — each tagged with the DS query family it stands in for:
  *
  *  - ds67: ROLLUP feeding a window rank (Expand → Window in one plan)
  *  - ds11/ds74: year-over-year ratio via CTE self-join
  *  - ds51: FULL OUTER join of two cumulative-window series
  *  - ds88: a battery of scalar subqueries materialized into one row
  *  - ds33/ds56: union of per-channel aggregates, re-aggregated
  *  - ds38/ds87: multi-column INTERSECT chain under a count
  *  - ds47/ds57: aggregated series vs trailing moving-average window
  *  - ds10/ds35/ds69: stacked correlated EXISTS / NOT EXISTS conjunction
  *  - ds54/ds58: fact restricted to a subquery-derived date set
  *  - ds78: LEFT-joined year-over-year cohorts incl. the lapsed bucket
  *
  * As of round 6 every DS query number ds1–ds99 is accounted for: each
  * QueryDef's scaladoc names the query famil(ies) it stands in for, and
  * template families that differ only in constants (e.g. the ds3/ds42/
  * ds52/ds55 brand report) share one shape.
  *
  * All exact-cents arithmetic; identical text runs on Spark and DuckDB.
  * Scale notes: the rollup/window pass shuffles once per grouping key; the
  * ds51 cumulative window is single-partition here (a month-grain series of
  * ~80 rows AFTER aggregation — the window input is already reduced; at
  * finer grains partition the running sum by year and stitch); the ds88
  * scalar
  * battery shares one scan per table via Spark's subquery reuse.
  */
object TpcdsShapes {

  /** ds67: top-k per rollup level — Expand output ranked by a window. The
    * explicit NULLS FIRST keeps the subtotal rows' tiebreak portable. */
  val rollupRank = QueryDef.sqlSame(
    "q_ds_rollup_rank",
    s"""SELECT * FROM (
         SELECT l_returnflag, l_linestatus, sum_qty,
                CAST(rank() OVER (PARTITION BY l_returnflag
                                  ORDER BY sum_qty DESC,
                                           l_linestatus ASC NULLS FIRST)
                     AS BIGINT) AS rk
         FROM (SELECT l_returnflag, l_linestatus,
                      ${sumdSql("l_quantity")} AS sum_qty
               FROM lineitem
               GROUP BY ROLLUP (l_returnflag, l_linestatus)))
       WHERE rk <= 2""")

  /** ds11/ds74: customers whose 1998 spend grew >1.5× over 1997 — the
    * yearly CTE joined to itself on the customer key. */
  val yoyRatio = QueryDef.sqlSame(
    "q_ds_yoy_ratio",
    s"""WITH yearly AS (
         SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
                sum(${centsSql("o_totalprice")}) AS spend_c
         FROM orders GROUP BY o_custkey, year(o_orderdate))
       SELECT y1.o_custkey AS custkey,
              CAST(y1.spend_c AS DOUBLE) / 100.0 AS spend_1997,
              CAST(y2.spend_c AS DOUBLE) / 100.0 AS spend_1998,
              CAST(y2.spend_c AS DOUBLE) / CAST(y1.spend_c AS DOUBLE)
                AS growth
       FROM yearly y1 JOIN yearly y2
         ON y1.o_custkey = y2.o_custkey AND y1.yr = 1997 AND y2.yr = 1998
       WHERE y2.spend_c * 2 > y1.spend_c * 3
       ORDER BY growth DESC, custkey LIMIT 50""")

  /** ds51: running totals of two order-status series stitched by FULL OUTER
    * join (web vs store cumulative revenue in the original). */
  val cumulativeFullJoin = QueryDef.sqlSame(
    "q_ds_cumulative_fulljoin",
    s"""WITH a AS (
         SELECT CAST(year(o_orderdate) AS INT) AS yr,
                CAST(month(o_orderdate) AS INT) AS mo,
                sum(${centsSql("o_totalprice")}) AS rev_c
         FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2),
       b AS (
         SELECT CAST(year(o_orderdate) AS INT) AS yr,
                CAST(month(o_orderdate) AS INT) AS mo,
                sum(${centsSql("o_totalprice")}) AS rev_c
         FROM orders WHERE o_orderstatus = 'O' GROUP BY 1, 2),
       ac AS (
         SELECT yr, mo, CAST(sum(rev_c) OVER (ORDER BY yr, mo
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 100.0 AS cum_f FROM a),
       bc AS (
         SELECT yr, mo, CAST(sum(rev_c) OVER (ORDER BY yr, mo
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 100.0 AS cum_o FROM b)
       SELECT coalesce(ac.yr, bc.yr) AS yr, coalesce(ac.mo, bc.mo) AS mo,
              cum_f, cum_o
       FROM ac FULL OUTER JOIN bc ON ac.yr = bc.yr AND ac.mo = bc.mo""")

  /** ds88: eight independent scalar subqueries in one projected row (the
    * "time-of-day buckets" battery); Spark plans each as a reusable
    * subquery over the shared scan. */
  val multiScalar = QueryDef.sqlSame(
    "q_ds_multi_scalar",
    """SELECT
        (SELECT count(*) FROM lineitem WHERE l_quantity < 10.0) AS b1,
        (SELECT count(*) FROM lineitem
         WHERE l_quantity >= 10.0 AND l_quantity < 20.0) AS b2,
        (SELECT count(*) FROM lineitem
         WHERE l_quantity >= 20.0 AND l_quantity < 30.0) AS b3,
        (SELECT count(*) FROM lineitem
         WHERE l_quantity >= 30.0 AND l_quantity < 40.0) AS b4,
        (SELECT count(*) FROM lineitem WHERE l_quantity >= 40.0) AS b5,
        (SELECT count(*) FROM orders
         WHERE o_orderpriority = '1-URGENT') AS b6,
        (SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS b7,
        (SELECT count(DISTINCT o_custkey) FROM orders) AS b8""")

  /** ds33/ds56: per-channel aggregates unioned then re-aggregated against a
    * dimension filter (return-flag classes stand in for the channels). */
  val unionReagg = QueryDef.sqlSame(
    "q_ds_union_reagg",
    s"""WITH per_channel AS (
         SELECT l_partkey, ${centsSql("l_extendedprice")} AS rev_c,
                'flagN' AS channel
         FROM lineitem WHERE l_returnflag = 'N'
         UNION ALL
         SELECT l_partkey, ${centsSql("l_extendedprice")}, 'flagR'
         FROM lineitem WHERE l_returnflag = 'R'
         UNION ALL
         SELECT l_partkey, ${centsSql("l_extendedprice")}, 'flagA'
         FROM lineitem WHERE l_returnflag = 'A'),
       chan_agg AS (
         SELECT l_partkey, channel, sum(rev_c) AS rev_c
         FROM per_channel GROUP BY l_partkey, channel)
       SELECT p_brand, count(*) AS n_pairs,
              CAST(sum(rev_c) AS DOUBLE) / 100.0 AS revenue
       FROM chan_agg JOIN part ON l_partkey = p_partkey
       WHERE p_size <= 10
       GROUP BY p_brand""")

  /** ds38/ds87: customers present in all three "channels" via a chained
    * multi-column INTERSECT under a count. */
  val intersectCount = QueryDef.sqlSame(
    "q_ds_intersect_count",
    """SELECT count(*) AS n FROM (
        SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr
        FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey, CAST(year(o_orderdate) AS INT)
        FROM orders WHERE o_orderpriority = '2-HIGH'
        INTERSECT
        SELECT o_custkey, CAST(year(o_orderdate) AS INT)
        FROM orders WHERE o_orderstatus = 'F')""")

  /** ds36: rank within the rollup LEVEL — the window partitions on
    * grouping(a)+grouping(b), so detail rows, subtotals, and the grand
    * total each rank among their own kind (Expand output feeding a window
    * keyed by the grouping flags; explicit NULLS FIRST keeps subtotal
    * tiebreaks portable). */
  val rollupGroupingRank = QueryDef.sqlSame(
    "q_ds_grouping_rank",
    s"""SELECT l_returnflag, l_linestatus, margin, lochierarchy,
              CAST(rank() OVER (PARTITION BY lochierarchy
                                ORDER BY margin DESC,
                                         l_returnflag NULLS FIRST,
                                         l_linestatus NULLS FIRST)
                   AS BIGINT) AS rk
       FROM (SELECT l_returnflag, l_linestatus,
                    CAST(sum(${centsSql("l_extendedprice")}
                             - ${centsSql("l_quantity")} * 100) AS DOUBLE)
                      / 100.0 AS margin,
                    CAST(grouping(l_returnflag) + grouping(l_linestatus)
                         AS INT) AS lochierarchy
             FROM lineitem
             GROUP BY ROLLUP (l_returnflag, l_linestatus))""")

  /** ds23: frequent-buyer semi-filter (HAVING-gated IN) combined with an
    * uncorrelated scalar cap derived from a nested aggregate. */
  val frequentBuyers = QueryDef.sqlSame(
    "q_ds_frequent_buyers",
    s"""WITH freq AS (
         SELECT o_custkey FROM orders
         GROUP BY o_custkey HAVING count(*) >= 15)
       SELECT count(*) AS n_lines,
              ${sumdSql("l_extendedprice")} AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_custkey IN (SELECT o_custkey FROM freq)
         AND l_quantity < (SELECT CAST(max(cnt) AS DOUBLE) / 4.0
                           FROM (SELECT count(*) AS cnt FROM orders
                                 GROUP BY o_custkey))""")

  /** ds47/ds57: monthly series vs its trailing moving average — aggregate,
    * then a ROWS-frame window over the aggregated series, then a ratio
    * filter. All comparisons in integer cents (rev·cnt vs sum·125) so the
    * row set is bit-stable; the emitted ratio is one int→double division.
    * Scale: the window input is the post-aggregate month grain (bounded),
    * partitioned by flag — the 100 TB fact scan reduces first. */
  val movingAvg = QueryDef.sqlSame(
    "q_ds_moving_avg",
    s"""SELECT flag, yr, mo,
              CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
              CAST(rev_c * cnt AS DOUBLE) / CAST(sum_c AS DOUBLE) AS ratio
       FROM (
         SELECT flag, yr, mo, rev_c,
                sum(rev_c) OVER w AS sum_c,
                CAST(count(*) OVER w AS BIGINT) AS cnt
         FROM (
           SELECT l_returnflag AS flag,
                  CAST(year(l_shipdate) AS INT) AS yr,
                  CAST(month(l_shipdate) AS INT) AS mo,
                  sum(${centsSql("l_extendedprice")}) AS rev_c
           FROM lineitem
           GROUP BY l_returnflag, year(l_shipdate), month(l_shipdate))
         WINDOW w AS (PARTITION BY flag ORDER BY yr, mo
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
       WHERE cnt = 3 AND rev_c * cnt * 100 > sum_c * 105""")

  /** ds10/ds35/ds69: a conjunction of correlated EXISTS / EXISTS-with-join /
    * NOT EXISTS predicates on the same outer row — the decorrelation stress
    * none of the single-flavor subquery or join queries reach (three
    * semi and anti joins stacked on one customer scan). */
  val multiExists = QueryDef.sqlSame(
    "q_ds_multi_exists",
    """SELECT c_mktsegment, count(*) AS n_cust
       FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey
                       AND year(o_orderdate) = 1997)
         AND EXISTS (SELECT 1 FROM lineitem JOIN orders
                       ON l_orderkey = o_orderkey
                     WHERE o_custkey = c_custkey AND l_returnflag = 'R')
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')
       GROUP BY c_mktsegment""")

  /** ds54/ds58: fact rows restricted to a date SET derived by a subquery
    * (here: every order date an urgent March-1995 order shipped on) — a
    * semi join on a non-key, low-cardinality column, broadcast-able. */
  val dateInSubquery = QueryDef.sqlSame(
    "q_ds_date_in",
    s"""SELECT o_orderpriority, count(*) AS n,
              ${sumdSql("o_totalprice")} AS revenue
       FROM orders
       WHERE o_orderdate IN (SELECT o_orderdate FROM orders
                             WHERE o_orderpriority = '1-URGENT'
                               AND year(o_orderdate) = 1995
                               AND month(o_orderdate) = 3)
       GROUP BY o_orderpriority""")

  /** ds78: year-over-year cohorts where the next year may be ABSENT — LEFT
    * join of the two yearly CTEs, CASE over the null side, integer-exact
    * growth compare (cohort 'grew' ⇔ 1998 ≥ 1.5 × 1997 spend). yoyRatio
    * above is the inner-join variant; this pins the outer+null-bucket plan. */
  val lapsedCohorts = QueryDef.sqlSame(
    "q_ds_lapsed_cohorts",
    s"""WITH y97 AS (
         SELECT o_custkey AS k, sum(${centsSql("o_totalprice")}) AS s
         FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey),
       y98 AS (
         SELECT o_custkey AS k, sum(${centsSql("o_totalprice")}) AS s
         FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey)
       SELECT CASE WHEN y98.k IS NULL THEN 'lapsed'
                   WHEN y98.s * 2 >= y97.s * 3 THEN 'grew'
                   ELSE 'flat' END AS cohort,
              count(*) AS n_cust,
              CAST(sum(y97.s) AS DOUBLE) / 100.0 AS spend_1997,
              CAST(sum(coalesce(y98.s, 0)) AS DOUBLE) / 100.0 AS spend_1998
       FROM y97 LEFT JOIN y98 ON y97.k = y98.k
       GROUP BY 1""")

  /** ds30/ds81: rows exceeding 1.2× their GROUP's average — the correlated
    * aggregate-over-aggregate decorrelation (the scalar subqueries aggregate
    * an already-aggregated CTE per outer group). The compare is kept in
    * integer cents (tot·cnt·10 > sum·12), so no cross-engine double-avg
    * drift can flip a row. */
  val aboveGroupAvg = QueryDef.sqlSame(
    "q_ds_above_group_avg",
    s"""WITH cust_tot AS (
         SELECT o_custkey, c_nationkey,
                sum(${centsSql("o_totalprice")}) AS tot_c
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY o_custkey, c_nationkey)
       SELECT c_nationkey, count(*) AS n_cust,
              CAST(sum(tot_c) AS DOUBLE) / 100.0 AS spend
       FROM cust_tot a
       WHERE tot_c * (SELECT count(*) FROM cust_tot b
                      WHERE b.c_nationkey = a.c_nationkey) * 10
             > (SELECT sum(tot_c) FROM cust_tot b
                WHERE b.c_nationkey = a.c_nationkey) * 12
       GROUP BY c_nationkey""")

  /** ds49: one aggregate ranked under TWO different window orderings, rows
    * kept when they medal in EITHER — two Window operators (distinct sort
    * orders) over one shuffled child. */
  val dualRank = QueryDef.sqlSame(
    "q_ds_dual_rank",
    s"""SELECT * FROM (
         SELECT n_name,
                CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
                n_orders,
                CAST(rank() OVER (ORDER BY rev_c DESC, n_name) AS BIGINT)
                  AS rk_rev,
                CAST(rank() OVER (ORDER BY n_orders DESC, n_name) AS BIGINT)
                  AS rk_cnt
         FROM (
           SELECT n_name,
                  sum(${centsSql("o_totalprice")}) AS rev_c,
                  count(*) AS n_orders
           FROM orders JOIN customer ON o_custkey = c_custkey
                       JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name))
       WHERE rk_rev <= 5 OR rk_cnt <= 5""")

  /** ds95: correlated EXISTS over a SELF-join of the fact (orders shipped
    * by at least two distinct suppliers) — the exists-subquery itself
    * contains a join, so decorrelation must pull a joined subtree into the
    * semi join. */
  val existsSelfJoin = QueryDef.sqlSame(
    "q_ds_exists_selfjoin",
    """SELECT o_orderpriority, count(*) AS n_multi_supp
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem l1 JOIN lineitem l2
                       ON l1.l_orderkey = l2.l_orderkey
                          AND l1.l_suppkey <> l2.l_suppkey
                     WHERE l1.l_orderkey = o_orderkey)
       GROUP BY o_orderpriority""").copy(parityShape = true)

  /** ds31: one aggregated CTE self-joined THREE ways (consecutive-year
    * chain) — with no CTE materialization Spark inlines the subtree per
    * reference, so the planner must recognize the repeated agg via
    * exchange/subquery reuse; the growth chain compares in integer cents. */
  val cteTripleSelfJoin = QueryDef.sqlSame(
    "q_ds_cte_triple",
    s"""WITH ny AS (
         SELECT c_nationkey AS nk, CAST(year(o_orderdate) AS INT) AS yr,
                sum(${centsSql("o_totalprice")}) AS rev
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey, year(o_orderdate))
       SELECT a.nk AS nationkey,
              CAST(a.rev AS DOUBLE) / 100.0 AS rev_1996,
              CAST(b.rev AS DOUBLE) / 100.0 AS rev_1997,
              CAST(c.rev AS DOUBLE) / 100.0 AS rev_1998
       FROM ny a
       JOIN ny b ON a.nk = b.nk AND a.yr = 1996 AND b.yr = 1997
       JOIN ny c ON b.nk = c.nk AND c.yr = 1998
       WHERE c.rev > b.rev AND b.rev > a.rev""")

  /** [[existsSelfJoin]] rewritten for scale, against the SAME canonical
    * EXISTS-over-self-join oracle: "an order shipped by ≥2 suppliers" is a
    * per-order distinct count, so one lineitem aggregate + semi join
    * replaces the fact self-join inside the EXISTS (two fact scans → one).
    * Same rewrite discipline as q_tpch_q21_fast. */
  val existsSelfJoinFast = QueryDef.sql(
    "q_ds_exists_selfjoin_fast",
    """SELECT o_orderpriority, count(*) AS n_multi_supp
       FROM orders
       JOIN (SELECT l_orderkey FROM lineitem
             GROUP BY l_orderkey
             HAVING count(DISTINCT l_suppkey) >= 2) m
         ON o_orderkey = m.l_orderkey
       GROUP BY o_orderpriority""",
    """SELECT o_orderpriority, count(*) AS n_multi_supp
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem l1 JOIN lineitem l2
                       ON l1.l_orderkey = l2.l_orderkey
                          AND l1.l_suppkey <> l2.l_suppkey
                     WHERE l1.l_orderkey = o_orderkey)
       GROUP BY o_orderpriority""")

  /** Single-scan fast twin of [[multiScalar]] for the lineitem buckets:
    * five conditional counts as FILTER aggregates over ONE pass of the fact
    * table. The ds88 battery written as independent subqueries reads the
    * fact once per bucket (Spark dedups the scan but still runs five
    * aggregates); at 100 TB the only acceptable plan is one scan + one
    * aggregate, which is exactly what this query plans to. */
  val bucketCountsFast = QueryDef.sqlSame(
    "q_ds_bucket_fast",
    """SELECT count(*) FILTER (WHERE l_quantity < 10.0) AS b1,
              count(*) FILTER (WHERE l_quantity >= 10.0
                               AND l_quantity < 20.0) AS b2,
              count(*) FILTER (WHERE l_quantity >= 20.0
                               AND l_quantity < 30.0) AS b3,
              count(*) FILTER (WHERE l_quantity >= 30.0
                               AND l_quantity < 40.0) AS b4,
              count(*) FILTER (WHERE l_quantity >= 40.0) AS b5
       FROM lineitem""")

  /** ds97: channel-overlap census — distinct buyer sets of two periods
    * FULL OUTER joined, classifying both/left-only/right-only in one
    * aggregate. The DS original does store vs catalog; the fixture's years
    * play the channels. */
  val channelOverlap = QueryDef.sqlSame(
    "q_ds_channel_overlap",
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE year(o_orderdate) = 1994),
            b AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE year(o_orderdate) = 1995)
       SELECT count(*) FILTER (WHERE a.o_custkey IS NOT NULL
                               AND b.o_custkey IS NOT NULL) AS both_years,
              count(*) FILTER (WHERE a.o_custkey IS NOT NULL
                               AND b.o_custkey IS NULL) AS only_first,
              count(*) FILTER (WHERE a.o_custkey IS NULL
                               AND b.o_custkey IS NOT NULL) AS only_second
       FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey""")

  /** ds2/ds43: calendar-bucket PIVOT (conditional aggregation into 7
    * columns)
    * self-joined across years into per-bucket ratios — the "week-over-week
    * by weekday column" shape. `day(date) % 7` is the dialect-portable
    * stand-in for the DS weekday (Spark and DuckDB disagree on dayofweek
    * numbering); cents stay integer until the final double division. */
  val weekdayPivotRatio = QueryDef.sqlSame(
    "q_ds_weekday_pivot_ratio",
    s"""WITH wk AS (
         SELECT CAST(year(o_orderdate) AS INT) AS yr,
                ${(0 to 6).map(d =>
                   s"sum(${centsSql("o_totalprice")}) FILTER " +
                   s"(WHERE day(o_orderdate) % 7 = $d) AS d$d")
                  .mkString(", ")}
         FROM orders GROUP BY year(o_orderdate))
       SELECT ${(0 to 6).map(d =>
                  s"CAST(a.d$d AS DOUBLE) / CAST(b.d$d AS DOUBLE) " +
                  s"AS r$d").mkString(", ")}
       FROM wk a JOIN wk b ON a.yr = 1997 AND b.yr = 1996""")

  /** ds39: statistical-volatility filter — per (supplier, month) quantity
    * mean/variance, keep groups with coefficient of variation > 0.2, then
    * self-join CONSECUTIVE months. The CoV predicate is kept in EXACT
    * integer arithmetic (cov² > 1/25 ⇔ 25·n·(n·Σx²−(Σx)²) > (n−1)·(Σx)²),
    * so no engine-specific stddev accumulation order can flip a boundary
    * group (at 100 TB swap the BIGINT products for decimal — Σx² grows with
    * n²). */
  val covSelfJoin = QueryDef.sqlSame(
    "q_ds_cov_selfjoin",
    """WITH m AS (
         SELECT l_suppkey, CAST(month(l_shipdate) AS INT) AS mo,
                count(*) AS n,
                sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS s,
                sum(CAST(round(l_quantity * 100, 0) AS BIGINT)
                    * CAST(round(l_quantity * 100, 0) AS BIGINT)) AS ss
         FROM lineitem WHERE year(l_shipdate) = 1997
         GROUP BY l_suppkey, month(l_shipdate)),
       f AS (
         SELECT l_suppkey, mo FROM m
         WHERE n > 1 AND 25 * n * (n * ss - s * s) > (n - 1) * s * s)
       SELECT a.mo AS mo1, count(*) AS n_volatile_pairs
       FROM f a JOIN f b
         ON a.l_suppkey = b.l_suppkey AND b.mo = a.mo + 1
       GROUP BY a.mo""")

  /** ds72: equi-join with a RESIDUAL range predicate — follow-up orders of
    * the same customer within 30 days. The planner must keep custkey as the
    * shuffle key and evaluate the interval bound as a post-join filter (a
    * pure theta formulation would plan a nested loop). */
  val followupWindow = QueryDef.sqlSame(
    "q_ds_followup_window",
    """SELECT o1.o_orderpriority, count(*) AS n_followups
       FROM orders o1 JOIN orders o2
         ON o1.o_custkey = o2.o_custkey
        AND o2.o_orderdate > o1.o_orderdate
        AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
       GROUP BY o1.o_orderpriority""")

  /** ds93/ds94: returns NETTING — revenue with returned lines subtracted
    * inside ONE conditional aggregate (no separate returns-table join pass),
    * rolled up to nations. The sign flip rides the same scan/shuffle the
    * plain sum would use. */
  val returnsNet = QueryDef.sqlSame(
    "q_ds_returns_net",
    """SELECT c_nationkey, count(*) AS n_customers,
              CAST(sum(net) AS DOUBLE) / 100.0 AS net_revenue
       FROM (
         SELECT o_custkey,
                CAST(sum(CASE WHEN l_returnflag = 'R'
                     THEN -CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     ELSE CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     END) AS BIGINT) AS net
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_custkey) x
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey""")

  /** ds90: time-bucket ratio (the am/pm query) — two FILTER counts over one
    * scan, ratio as exact-int counts divided once. */
  val timeRatio = QueryDef.sqlSame(
    "q_ds_time_ratio",
    """SELECT event_type,
              count(*) FILTER (WHERE hour(ts) BETWEEN 8 AND 10) AS am,
              count(*) FILTER (WHERE hour(ts) BETWEEN 19 AND 21) AS pm,
              CAST(count(*) FILTER (WHERE hour(ts) BETWEEN 8 AND 10)
                   AS DOUBLE) /
              CAST(count(*) FILTER (WHERE hour(ts) BETWEEN 19 AND 21)
                   AS DOUBLE) AS am_pm_ratio
       FROM events GROUP BY event_type""")

  /** ds21/ds40: before/after-threshold balance — per-key conditional sums
    * around a date cut, HAVING a bounded ratio expressed as INTEGER
    * cross-multiplication (2·after ≤ 3·before ∧ 2·before ≤ 3·after ⇔
    * ratio ∈ [⅔, 3/2]) so no double division can flip a boundary group. */
  val beforeAfter = QueryDef.sqlSame(
    "q_ds_before_after",
    """SELECT l_suppkey,
              CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                   FILTER (WHERE l_shipdate < TIMESTAMP '1998-01-01')
                   AS BIGINT) AS before_q,
              CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                   FILTER (WHERE l_shipdate >= TIMESTAMP '1998-01-01')
                   AS BIGINT) AS after_q
       FROM lineitem GROUP BY l_suppkey
       HAVING 2 * after_q <= 3 * before_q
          AND 2 * before_q <= 3 * after_q""")

  /** ds76: per-channel census of facts with a NULL dimension key (the
    * "rows that would drop out of an inner join" report) — UNION ALL of
    * channel branches, count vs count(nullable). */
  val nullChannel = QueryDef.sqlSame(
    "q_ds_null_channel",
    """SELECT 'low' AS channel, count(*) AS n,
              count(nullif(l_suppkey % 7, 0)) AS with_key
       FROM lineitem WHERE l_quantity < 25.0
       UNION ALL
       SELECT 'high', count(*), count(nullif(l_suppkey % 7, 0))
       FROM lineitem WHERE l_quantity >= 25.0""")

  /** ds47/ds57: the full multi-window chain — ONE aggregated monthly series
    * feeding THREE window functions with THREE different specs (a
    * yearly-partition total, a lag/lead pair over the month ordering, and a
    * rank over revenue), then the deviation-from-year-average filter. The
    * planner must stack Window operators with distinct partitioning/sort
    * requirements over one shuffled child (two sorts, one exchange). The
    * deviation predicate stays in integer cents (rev·n·10 > sum·11 ⇔ month
    * >10% above its year's average). */
  val lagRankDev = QueryDef.sqlSame(
    "q_ds_lag_rank_dev",
    s"""SELECT flag, yr, mo,
              CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
              CAST(yr_sum_c AS DOUBLE) / CAST(yr_n AS DOUBLE) / 100.0
                AS avg_monthly,
              CAST(prev_c AS DOUBLE) / 100.0 AS prev_rev,
              CAST(next_c AS DOUBLE) / 100.0 AS next_rev,
              rk
       FROM (
         SELECT flag, yr, mo, rev_c,
                sum(rev_c) OVER (PARTITION BY flag, yr) AS yr_sum_c,
                CAST(count(*) OVER (PARTITION BY flag, yr) AS BIGINT)
                  AS yr_n,
                lag(rev_c) OVER (PARTITION BY flag ORDER BY yr, mo)
                  AS prev_c,
                lead(rev_c) OVER (PARTITION BY flag ORDER BY yr, mo)
                  AS next_c,
                CAST(rank() OVER (PARTITION BY flag
                                  ORDER BY rev_c DESC, yr, mo) AS BIGINT)
                  AS rk
         FROM (
           SELECT l_returnflag AS flag,
                  CAST(year(l_shipdate) AS INT) AS yr,
                  CAST(month(l_shipdate) AS INT) AS mo,
                  sum(${centsSql("l_extendedprice")}) AS rev_c
           FROM lineitem
           GROUP BY l_returnflag, year(l_shipdate), month(l_shipdate)))
       WHERE yr_n = 12 AND rev_c * yr_n * 10 > yr_sum_c * 11""")

  /** ds86: the window PARTITION itself contains a CASE over grouping() —
    * detail rows rank within their parent subtotal (partition = hierarchy
    * level + the CASE-nulled parent key), the distinctive ds86/ds36 spec
    * the plain grouping-rank shape doesn't reach. */
  val groupingCasePartition = QueryDef.sqlSame(
    "q_ds_grouping_case_partition",
    s"""SELECT lochierarchy, l_returnflag, l_linestatus,
              CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
              CAST(rank() OVER (
                     PARTITION BY lochierarchy,
                       CASE WHEN g_ls = 0 THEN l_returnflag END
                     ORDER BY rev_c DESC, l_linestatus NULLS FIRST)
                   AS BIGINT) AS rank_within_parent
       FROM (
         SELECT l_returnflag, l_linestatus,
                sum(${centsSql("l_extendedprice")}) AS rev_c,
                CAST(grouping(l_returnflag) + grouping(l_linestatus)
                     AS INT) AS lochierarchy,
                CAST(grouping(l_linestatus) AS INT) AS g_ls
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus))""")

  /** ds27/ds22: a THREE-level rollup battery with per-row grouping()
    * selectors and a HAVING over the grouping flags (keep subtotal levels
    * only, drop the detail grain) — Expand output filtered by the grouping
    * bitmask rather than windowed. */
  val groupingBattery = QueryDef.sqlSame(
    "q_ds_grouping_battery",
    s"""SELECT flag, status, yr,
              CAST(grouping(flag) AS INT) AS g_f,
              CAST(grouping(status) AS INT) AS g_s,
              CAST(grouping(yr) AS INT) AS g_y,
              count(*) AS n_lines,
              CAST(sum(qty_c) AS DOUBLE) / 100.0 AS sum_qty
       FROM (SELECT l_returnflag AS flag, l_linestatus AS status,
                    CAST(year(l_shipdate) AS INT) AS yr,
                    ${centsSql("l_quantity")} AS qty_c
             FROM lineitem)
       GROUP BY ROLLUP (flag, status, yr)
       HAVING grouping(yr) = 1""")

  /** ds8/ds87-flavor: EXCEPT-driven cohort difference — buyers active in
    * 1997 minus 1998 actives minus urgent-ever buyers (a two-step EXCEPT
    * chain on the key), counted per nation after joining the survivor set
    * back to the dimension. */
  val exceptCohort = QueryDef.sqlSame(
    "q_ds_except_cohort",
    """SELECT c_nationkey, count(*) AS n_lost
       FROM (
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') x
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey""")

  /** ds97-extended: FULL OUTER join of two per-customer yearly aggregates
    * re-keyed by COALESCE of the two join keys — the grouped key must
    * survive the outer join's nulls (plans an extra project over the
    * outer join before the final aggregate). */
  val fullOuterCoalesce = QueryDef.sqlSame(
    "q_ds_fullouter_coalesce",
    s"""WITH a AS (
         SELECT o_custkey AS k, sum(${centsSql("o_totalprice")}) AS s97,
                count(*) AS n97
         FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey),
       b AS (
         SELECT o_custkey AS k, sum(${centsSql("o_totalprice")}) AS s98,
                count(*) AS n98
         FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey)
       SELECT coalesce(a.k, b.k) % 10 AS cust_bucket,
              count(*) AS n_cust,
              CAST(sum(coalesce(a.s97, 0)) AS DOUBLE) / 100.0 AS spend_97,
              CAST(sum(coalesce(b.s98, 0)) AS DOUBLE) / 100.0 AS spend_98,
              CAST(sum(coalesce(a.n97, 0)) AS BIGINT) AS orders_97,
              CAST(sum(coalesce(b.n98, 0)) AS BIGINT) AS orders_98
       FROM a FULL OUTER JOIN b ON a.k = b.k
       GROUP BY coalesce(a.k, b.k) % 10""")

  /** ds14: cross-channel key set (brands sold in BOTH status channels, via
    * INTERSECT), an uncorrelated scalar average as the qualifying gate, a
    * UNION ALL of the per-channel aggregates restricted to that key set,
    * and a final ROLLUP over (channel, brand) — the deepest composite in
    * the DS corpus: set-op + scalar subquery + union + Expand in one plan. */
  val crossChannelRollup = QueryDef(
    "q_ds_cross_channel_rollup",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      // Scan reuse (round 7, VERDICT r6 #4): the oracle keeps the ds14
      // shape verbatim (INTERSECT of two channel join trees + a third for
      // channel_sales = three lineitem⋈orders⋈part scans); the engine
      // makes ONE pass over the join tree, aggregating straight to the
      // (channel, brand) grain with the quantity gate applied as a
      // conditional sum — and persists only THAT dim-bounded grain table
      // (|brands|×2 rows), never row-level fact data (the round-7 gate
      // caught the fact-sized-persist variant OOMing at 100×). The
      // cross-channel brand set (brands with BOTH statuses ≡ the
      // INTERSECT) and the rollup input both read the cached grain; only
      // the uncorrelated scalar average rescans the fact.
      val li = graft.Tables(spark, dir, "lineitem")
      val avgQ = li.agg(
        expr("CAST(round(avg(l_quantity * 100), 0) AS BIGINT)").as("avg_q100"))
      val grain = li
        .join(graft.Tables(spark, dir, "orders")
          .filter(col("o_orderstatus").isin("F", "O")),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.Tables(spark, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .crossJoin(broadcast(avgQ))
        .select(col("o_orderstatus").as("channel"), col("p_brand"),
          (col("l_quantity") * 100 > col("avg_q100")).as("qok"),
          cents(col("l_extendedprice")).as("rev_c"))
        .groupBy(col("channel"), col("p_brand"))
        .agg(sum(when(col("qok"), 1L).otherwise(0L)).as("n_lines_f"),
          sum(when(col("qok"), col("rev_c"))).as("rev_f"))
        .persist()
      val crossBrands = grain.groupBy(col("p_brand"))
        .agg(countDistinct(col("channel")).as("nch"))
        .filter(col("nch") === 2).select(col("p_brand"))
      grain.join(broadcast(crossBrands), "p_brand")
        .filter(col("n_lines_f") > 0)
        .rollup(col("channel"), col("p_brand"))
        .agg(sum(col("n_lines_f")).as("n_lines"),
          (sum(col("rev_f")).cast("double") / 100.0).as("revenue"))
        .select(col("channel"), col("p_brand"), col("n_lines"),
          col("revenue"))
    },
    Some(s"""WITH cross_brands AS (
         SELECT p_brand FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
         WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT p_brand FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
         WHERE o_orderstatus = 'O'),
       channel_sales AS (
         SELECT o_orderstatus AS channel, p_brand,
                ${centsSql("l_extendedprice")} AS rev_c
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
         WHERE o_orderstatus IN ('F', 'O')
           AND p_brand IN (SELECT p_brand FROM cross_brands)
           AND l_quantity * 100 > (SELECT CAST(round(avg(l_quantity * 100),
                                                0) AS BIGINT)
                                   FROM lineitem))
       SELECT channel, p_brand, count(*) AS n_lines,
              CAST(sum(rev_c) AS DOUBLE) / 100.0 AS revenue
       FROM channel_sales
       GROUP BY ROLLUP (channel, p_brand)"""))

  /** ds70: the dimension set is itself WINDOW-FILTERED — rank nations by
    * revenue in a subquery, keep the top 5, and roll up only over orders
    * of those nations (a rank-filtered semi join feeding an Expand). */
  val windowFilteredRollup = QueryDef.sqlSame(
    "q_ds_window_filtered_rollup",
    s"""SELECT c_nationkey, o_orderpriority,
              CAST(grouping(c_nationkey) + grouping(o_orderpriority)
                   AS INT) AS lochierarchy,
              CAST(sum(rev_c) AS DOUBLE) / 100.0 AS revenue
       FROM (SELECT c_nationkey, o_orderpriority,
                    ${centsSql("o_totalprice")} AS rev_c
             FROM orders JOIN customer ON o_custkey = c_custkey) f
       WHERE c_nationkey IN (
         SELECT nk FROM (
           SELECT c_nationkey AS nk,
                  rank() OVER (ORDER BY sum(${centsSql("o_totalprice")})
                               DESC, c_nationkey) AS rnk
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_nationkey) r
         WHERE rnk <= 5)
       GROUP BY ROLLUP (c_nationkey, o_orderpriority)""")

  /** ds98/ds12/ds20: revenue share within class — an aggregate feeding an
    * UNBOUNDED-partition-total window, the ratio emitted as one
    * int-cents→double division per row. */
  val revenueShare = QueryDef.sqlSame(
    "q_ds_revenue_share",
    s"""SELECT p_type, p_brand,
              CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
              CAST(rev_c * 100 AS DOUBLE) / CAST(type_sum_c AS DOUBLE)
                AS share_pct
       FROM (
         SELECT p_type, p_brand, rev_c,
                sum(rev_c) OVER (PARTITION BY p_type) AS type_sum_c
         FROM (
           SELECT p_type, p_brand,
                  sum(${centsSql("l_extendedprice")}) AS rev_c
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_size <= 5
           GROUP BY p_type, p_brand))""")

  /** ds44: best/worst rank tables JOINED ON THE RANK VALUE — one supplier
    * profit aggregate ranked ascending and descending, the two ranked
    * derivations joined position-to-position (two Window ops over reused
    * child, then an equi-join on the computed rank column). */
  val rankJoin = QueryDef.sqlSame(
    "q_ds_rank_join",
    s"""WITH perf AS (
         SELECT l_suppkey, sum(${centsSql("l_extendedprice")}
                              - ${centsSql("l_quantity")} * 100) AS margin_c
         FROM lineitem GROUP BY l_suppkey),
       best AS (
         SELECT l_suppkey, margin_c,
                CAST(rank() OVER (ORDER BY margin_c DESC, l_suppkey)
                     AS BIGINT) AS rk
         FROM perf),
       worst AS (
         SELECT l_suppkey, margin_c,
                CAST(rank() OVER (ORDER BY margin_c ASC, l_suppkey)
                     AS BIGINT) AS rk
         FROM perf)
       SELECT best.rk AS position,
              best.l_suppkey AS best_supp,
              CAST(best.margin_c AS DOUBLE) / 100.0 AS best_margin,
              worst.l_suppkey AS worst_supp,
              CAST(worst.margin_c AS DOUBLE) / 100.0 AS worst_margin
       FROM best JOIN worst ON best.rk = worst.rk
       WHERE best.rk <= 10""")

  /** ds66: the WIDE conditional-aggregation battery — two "channels"
    * (return-flag classes) UNION ALL'd, then re-aggregated into 12 monthly
    * cent-sum columns per nation in one pass (24 FILTER aggregates over
    * one shuffled union; no Expand, no repeated scans). */
  val wideMonthPivot = QueryDef.sqlSame(
    "q_ds_wide_month_pivot",
    s"""WITH u AS (
         SELECT 'returned' AS channel, s_nationkey,
                CAST(month(l_shipdate) AS INT) AS mo,
                ${centsSql("l_extendedprice")} AS rev_c
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE l_returnflag = 'R'
         UNION ALL
         SELECT 'kept', s_nationkey, CAST(month(l_shipdate) AS INT),
                ${centsSql("l_extendedprice")}
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE l_returnflag = 'N')
       SELECT channel, s_nationkey,
              ${(1 to 12).map(m =>
                 s"CAST(coalesce(sum(rev_c) FILTER (WHERE mo = $m), 0) " +
                 s"AS BIGINT) AS m$m").mkString(", ")}
       FROM u GROUP BY channel, s_nationkey""")

  /** ds17/ds25/ds29: THREE fact instances chained on two different keys — a
    * returned line joined to its order, to a LATER order of the same
    * customer (bounded residual range), to that order's lines; quantity
    * accounting per follow-up priority. The planner keys the first join on
    * orderkey, re-shuffles on custkey for the middle hop, and back to
    * orderkey for the last — three distinct exchange keys in one chain. */
  val returnsChain = QueryDef.sqlSame(
    "q_ds_returns_chain",
    s"""SELECT o2.o_orderpriority,
              count(*) AS n_lines,
              CAST(sum(${centsSql("l2.l_quantity")}) AS DOUBLE) / 100.0
                AS followup_qty
       FROM lineitem l1
       JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
       JOIN orders o2 ON o1.o_custkey = o2.o_custkey
        AND o2.o_orderdate > o1.o_orderdate
        AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 60 DAY
       JOIN lineitem l2 ON o2.o_orderkey = l2.l_orderkey
       WHERE l1.l_returnflag = 'R'
         AND year(o1.o_orderdate) = 1997 AND month(o1.o_orderdate) = 1
       GROUP BY o2.o_orderpriority""")

  /** ds45: DISJUNCTIVE semi-join — an IN-list OR an IN-subquery on the
    * same outer row. Neither branch can filter alone, so the planner emits
    * an ExistenceJoin (the semi join that RETURNS its match bit instead of
    * filtering) and evaluates the OR afterwards. */
  val disjunctiveSemi = QueryDef.sqlSame(
    "q_ds_disjunctive_semi",
    """SELECT c_nationkey, count(*) AS n_cust
       FROM customer
       WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
          OR c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_totalprice > 400000.0)
       GROUP BY c_nationkey""")

  /** Interval RANGE window frame (the date-grain moving total the ROWS
    * variants can't express): per-day revenue with a trailing 3-DAY RANGE
    * frame over an actual date ordering — the planner's RangeFrame with a
    * calendar offset, which skips gap days a ROWS frame would wrongly
    * count across. */
  val intervalRangeWindow = QueryDef.sqlSame(
    "q_ds_interval_range_window",
    s"""SELECT d, CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
              CAST(w_c AS DOUBLE) / 100.0 AS trailing_3d
       FROM (
         SELECT d, rev_c,
                sum(rev_c) OVER (ORDER BY d
                                 RANGE BETWEEN INTERVAL 2 DAY PRECEDING
                                 AND CURRENT ROW) AS w_c
         FROM (
           SELECT o_orderdate AS d,
                  sum(${centsSql("o_totalprice")}) AS rev_c
           FROM orders
           WHERE year(o_orderdate) = 1997 AND month(o_orderdate) <= 2
           GROUP BY o_orderdate))""")

  /** COUNT(DISTINCT) under ROLLUP — the distinct-rewrite Expand STACKED on
    * the grouping-sets Expand (two Expand operators in one aggregate
    * chain), plus a plain sum riding the same pass. */
  val distinctRollup = QueryDef.sqlSame(
    "q_ds_distinct_rollup",
    s"""SELECT l_returnflag, l_linestatus,
              CAST(grouping(l_returnflag) + grouping(l_linestatus) AS INT)
                AS lvl,
              count(DISTINCT l_suppkey) AS n_supp,
              CAST(sum(${centsSql("l_quantity")}) AS DOUBLE) / 100.0
                AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""")

  /** Top-k over a UNION ALL of channel branches — TakeOrderedAndProject
    * must sit ABOVE the union (one bounded heap per partition of either
    * branch, never a global sort of the concatenation). */
  val unionTopK = QueryDef.sqlSame(
    "q_ds_union_topk",
    s"""SELECT * FROM (
         SELECT 'F' AS channel, o_orderkey,
                CAST(${centsSql("o_totalprice")} AS DOUBLE) / 100.0 AS price
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT 'O', o_orderkey,
                CAST(${centsSql("o_totalprice")} AS DOUBLE) / 100.0
         FROM orders WHERE o_orderstatus = 'O')
       ORDER BY price DESC, o_orderkey LIMIT 25""")

  /** ds9: scalar subqueries selected by a CASE over OTHER scalar
    * subqueries — six independent single-row aggregates feed one projected
    * row, and which pair is surfaced depends on a count threshold. Spark
    * plans every scalar subquery as its own reusable stage regardless of
    * which CASE arm wins; subquery reuse dedups the three scans per
    * bucket into one. */
  val caseScalarBuckets = QueryDef.sqlSame(
    "q_ds_case_scalar_buckets",
    s"""SELECT
         CASE WHEN (SELECT count(*) FROM lineitem
                    WHERE l_quantity BETWEEN 1 AND 15) > 20000
              THEN (SELECT ${sumdSql("l_extendedprice")} FROM lineitem
                    WHERE l_quantity BETWEEN 1 AND 15)
              ELSE (SELECT ${avgdSql("l_extendedprice")} FROM lineitem
                    WHERE l_quantity BETWEEN 1 AND 15) END AS b1,
         CASE WHEN (SELECT count(*) FROM lineitem
                    WHERE l_quantity BETWEEN 16 AND 30) > 20000
              THEN (SELECT ${sumdSql("l_extendedprice")} FROM lineitem
                    WHERE l_quantity BETWEEN 16 AND 30)
              ELSE (SELECT ${avgdSql("l_extendedprice")} FROM lineitem
                    WHERE l_quantity BETWEEN 16 AND 30) END AS b2,
         CASE WHEN (SELECT count(*) FROM lineitem
                    WHERE l_quantity BETWEEN 31 AND 50) > 20000
              THEN (SELECT ${sumdSql("l_extendedprice")} FROM lineitem
                    WHERE l_quantity BETWEEN 31 AND 50)
              ELSE (SELECT ${avgdSql("l_extendedprice")} FROM lineitem
                    WHERE l_quantity BETWEEN 31 AND 50) END AS b3""")

  /** ds23/ds24: HAVING-style filter comparing each group to SCALAR
    * subqueries over the SAME CTE (total and count) — the CTE is planned
    * once and read three ways (group rows, global sum, global count).
    * All-integer cents predicate: paid > 1.5x the mean customer spend. */
  val havingScalarCte = QueryDef.sqlSame(
    "q_ds_having_scalar_cte",
    s"""WITH payments AS (
         SELECT o_custkey, sum(${centsSql("o_totalprice")}) AS paid_c
         FROM orders GROUP BY o_custkey)
       SELECT o_custkey AS custkey,
              CAST(paid_c AS DOUBLE) / 100.0 AS paid
       FROM payments
       WHERE paid_c * (SELECT count(*) FROM payments) * 2
             > 3 * (SELECT sum(paid_c) FROM payments)
       ORDER BY paid DESC, custkey LIMIT 40""")

  /** ds50/ds62/ds99: fulfilment-latency bucket matrix — two facts joined
    * on the order key, latency in calendar months bucketed into a
    * conditional-count pivot per priority class. The month arithmetic is
    * pure integers (portable across engines, unlike datediff dialects).
    * Scale: one shuffle on orderkey for the join, then a 5-group agg. */
  val latencyBuckets = QueryDef.sqlSame(
    "q_ds_latency_buckets",
    s"""SELECT o_orderpriority,
              CAST(sum(CASE WHEN lat <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS m0,
              CAST(sum(CASE WHEN lat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
              CAST(sum(CASE WHEN lat = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
              CAST(sum(CASE WHEN lat >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS m3p
       FROM (
         SELECT o.o_orderpriority,
                (CAST(year(l.l_shipdate) AS INT) * 12
                   + CAST(month(l.l_shipdate) AS INT))
              - (CAST(year(o.o_orderdate) AS INT) * 12
                   + CAST(month(o.o_orderdate) AS INT)) AS lat
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** ds32/ds92: "excess discount" — rows whose discount exceeds 1.3x the
    * average discount of the SAME part, via a correlated scalar aggregate.
    * Catalyst decorrelates to a per-part aggregate joined back on
    * partkey; the 1.3x compare is one IEEE multiply on an exactly-
    * accumulated mean, bit-identical in both engines. */
  val corrExcessDiscount = QueryDef.sqlSame(
    "q_ds_corr_excess_discount",
    s"""SELECT CAST(sum(${centsSql("l1.l_extendedprice")}) AS DOUBLE) / 100.0
                AS excess_rev,
              count(*) AS n_lines
       FROM lineitem l1
       WHERE CAST(year(l1.l_shipdate) AS INT) = 1998
         AND l1.l_discount >
             (SELECT 13e-1 * (CAST(sum(${centsSql("l2.l_discount")}) AS DOUBLE)
                              / 100.0 / CAST(count(*) AS DOUBLE))
              FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""")

  /** ds46/ds68/ds79: per-order aggregate joined back to the order header
    * with
    * an INEQUALITY between two conditionally-accumulated columns (orders
    * whose deep-discount revenue dwarfs their list-rate revenue) — the
    * filter can only run post-aggregation, post-join. Integer cents. */
  val aggJoinInequality = QueryDef.sqlSame(
    "q_ds_agg_join_inequality",
    s"""WITH po AS (
         SELECT l_orderkey,
                sum(CASE WHEN l_discount >= 5e-2
                         THEN ${centsSql("l_extendedprice")} ELSE 0 END) AS hi_c,
                sum(CASE WHEN l_discount < 5e-2
                         THEN ${centsSql("l_extendedprice")} ELSE 0 END) AS lo_c
         FROM lineitem GROUP BY l_orderkey)
       SELECT o.o_orderkey AS orderkey, o.o_orderpriority,
              CAST(hi_c AS DOUBLE) / 100.0 AS hi_rev,
              CAST(lo_c AS DOUBLE) / 100.0 AS lo_rev
       FROM po JOIN orders o ON po.l_orderkey = o.o_orderkey
       WHERE hi_c > 3 * lo_c AND lo_c > 0
       ORDER BY hi_rev DESC, orderkey LIMIT 40""")

  /** ds5/ds77/ds80: ROLLUP over a UNION ALL of SIGNED measure streams
    * (gross
    * lines positive, returned lines negative) — the sales-and-returns
    * netting plan where the set-op feeds Expand directly. */
  val signedUnionRollup = QueryDef.sqlSame(
    "q_ds_signed_union_rollup",
    s"""SELECT kind, flag,
              CAST(grouping(kind) + grouping(flag) AS INT) AS lvl,
              CAST(sum(amt_c) AS DOUBLE) / 100.0 AS net
       FROM (
         SELECT 'gross' AS kind, l_returnflag AS flag,
                ${centsSql("l_extendedprice")} AS amt_c
         FROM lineitem
         UNION ALL
         SELECT 'return', l_returnflag, -${centsSql("l_extendedprice")}
         FROM lineitem WHERE l_returnflag = 'R')
       GROUP BY ROLLUP (kind, flag)""")

  /** ds53/ds63/ds89: months deviating >10% from their (flag, year)
    * partition
    * mean — full-partition window sum + count feeding an all-integer
    * deviation predicate 10*|q*n - tot| > tot (no division anywhere). */
  val partitionDeviation = QueryDef.sqlSame(
    "q_ds_partition_deviation",
    s"""WITH m AS (
         SELECT l_returnflag AS flag,
                CAST(year(l_shipdate) AS INT) AS yr,
                CAST(month(l_shipdate) AS INT) AS mo,
                sum(${centsSql("l_quantity")}) AS qty_c
         FROM lineitem GROUP BY 1, 2, 3),
       w AS (
         SELECT flag, yr, mo, qty_c,
                sum(qty_c) OVER (PARTITION BY flag, yr) AS tot_c,
                count(*) OVER (PARTITION BY flag, yr) AS nmo
         FROM m)
       SELECT flag, yr, mo, CAST(qty_c AS DOUBLE) / 100.0 AS qty
       FROM w
       WHERE 10 * abs(qty_c * nmo - tot_c) > tot_c
       ORDER BY flag, yr, mo""")

  /** ds16/ds94: COUNT(DISTINCT) gated by an EXISTS AND a NOT EXISTS in
    * one WHERE — semi-join (another order, same customer+year) and
    * anti-join (no returned line) both feed the distinct aggregation.
    * Scale: the EXISTS correlates on (custkey, year) — both equalities,
    * so it hash-joins; orders is the lighter fact, so the self-semi here
    * is NOT the ds95 lineitem-scale trap (that one is pinned separately
    * as a parity shape). */
  val gatedCountDistinct = QueryDef.sqlSame(
    "q_ds_gated_count_distinct",
    s"""SELECT count(DISTINCT o1.o_custkey) AS n_cust,
              CAST(sum(${centsSql("o1.o_totalprice")}) AS DOUBLE) / 100.0
                AS rev
       FROM orders o1
       WHERE o1.o_orderstatus = 'F'
         AND EXISTS (SELECT 1 FROM orders o2
                     WHERE o2.o_custkey = o1.o_custkey
                       AND o2.o_orderkey <> o1.o_orderkey
                       AND year(o2.o_orderdate) = year(o1.o_orderdate))
         AND NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o1.o_orderkey
                           AND l.l_returnflag = 'R')""")

  /** ds34/ds73: frequency-histogram cohort — customers whose order COUNT
    * falls in a HAVING band, then re-joined to the dimension for display.
    * The band filter runs map-side-combinable before the dim join. */
  val orderCountHistogram = QueryDef.sqlSame(
    "q_ds_order_count_histogram",
    s"""WITH cnts AS (
         SELECT o_custkey, count(*) AS n_orders
         FROM orders GROUP BY o_custkey
         HAVING count(*) BETWEEN 8 AND 12)
       SELECT c.c_custkey AS custkey, c.c_name, n_orders
       FROM cnts JOIN customer c ON cnts.o_custkey = c.c_custkey
       ORDER BY n_orders DESC, custkey LIMIT 40""")

  /** ds41: dimension-only disjunction battery — OR-of-AND predicate
    * bands over two attributes, aggregated per brand. One scan, complex
    * boolean pushdown, no join at all (the planner must not expand the
    * disjunction into a union of scans). */
  val dimDisjunctionBattery = QueryDef.sqlSame(
    "q_ds_dim_disjunction",
    s"""SELECT p_brand, count(*) AS n
       FROM part
       WHERE (p_type = 'PROMO'   AND p_size BETWEEN 1 AND 15)
          OR (p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30)
          OR (p_type IN ('SMALL', 'MEDIUM') AND p_size BETWEEN 25 AND 50)
       GROUP BY p_brand ORDER BY p_brand""")

  /** ds6: fact rows driven by a DIMENSION-correlated average — customers
    * above 1.2x their nation's mean balance, counted by nation across the
    * order fact. The correlated avg decorrelates to a per-nation
    * aggregate (25 rows, broadcast); only the fact join shuffles. */
  val dimAboveAvgJoin = QueryDef.sqlSame(
    "q_ds_dim_above_avg_join",
    s"""SELECT n.n_name, count(*) AS n_orders
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN orders o ON o.o_custkey = c.c_custkey
       WHERE c.c_acctbal >
             (SELECT 12e-1 * (CAST(sum(${centsSql("c2.c_acctbal")}) AS DOUBLE)
                              / 100.0 / CAST(count(*) AS DOUBLE))
              FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
       GROUP BY n.n_name ORDER BY n_orders DESC, n_name LIMIT 10""")

  /** ds59: week-over-week ratio matrix — the weekday pivot built per YEAR,
    * then the pivot table self-joined on consecutive years with one ratio
    * column per weekday. Two narrow aggregates and a tiny self-join; the
    * portable weekday stand-in is day%7 (dayofweek numbering differs
    * across engines). */
  val wowPivotRatio = QueryDef.sqlSame(
    "q_ds_wow_pivot_ratio",
    s"""WITH wd AS (
         SELECT CAST(year(o_orderdate) AS INT) AS yr,
                CAST(day(o_orderdate) % 7 AS INT) AS wd,
                sum(${centsSql("o_totalprice")}) AS rev_c
         FROM orders GROUP BY 1, 2),
       p AS (
         SELECT yr,
                sum(CASE WHEN wd = 0 THEN rev_c ELSE 0 END) AS d0_c,
                sum(CASE WHEN wd = 1 THEN rev_c ELSE 0 END) AS d1_c,
                sum(CASE WHEN wd = 2 THEN rev_c ELSE 0 END) AS d2_c
         FROM wd GROUP BY yr)
       SELECT a.yr AS yr,
              CAST(a.d0_c AS DOUBLE) / CAST(b.d0_c AS DOUBLE) AS r0,
              CAST(a.d1_c AS DOUBLE) / CAST(b.d1_c AS DOUBLE) AS r1,
              CAST(a.d2_c AS DOUBLE) / CAST(b.d2_c AS DOUBLE) AS r2
       FROM p a JOIN p b ON a.yr = b.yr + 1""")

  /** ds33/ds60-flavor: THREE per-channel aggregates stitched by STACKED
    * FULL OUTER joins with a coalesced key chain — the second join's key
    * is itself coalesce(a.k, b.k), the planner shape that breaks naive
    * equi-join key extraction. */
  val tripleFullOuter = QueryDef.sqlSame(
    "q_ds_triple_fullouter",
    s"""WITH a AS (SELECT o_custkey AS k, sum(${centsSql("o_totalprice")})
                     AS f_c
               FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
       b AS (SELECT o_custkey AS k, sum(${centsSql("o_totalprice")}) AS o_c
             FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
       c AS (SELECT o_custkey AS k, sum(${centsSql("o_totalprice")}) AS p_c
             FROM orders WHERE o_orderstatus = 'P' GROUP BY 1)
       SELECT coalesce(a.k, b.k, c.k) AS custkey,
              CAST(coalesce(f_c, 0) AS DOUBLE) / 100.0 AS rev_f,
              CAST(coalesce(o_c, 0) AS DOUBLE) / 100.0 AS rev_o,
              CAST(coalesce(p_c, 0) AS DOUBLE) / 100.0 AS rev_p
       FROM a
       FULL JOIN b ON a.k = b.k
       FULL JOIN c ON coalesce(a.k, b.k) = c.k""")

  /** ds1: the correlated scalar average is taken over a CTE — customers
    * whose RETURNS total beats 1.2x their nation's mean returns, where the
    * returns table is itself a three-way-join aggregate. Catalyst must
    * decorrelate against the derived relation (plan the CTE once, aggregate
    * it per nation, join back) — a different shape from the base-table
    * correlations elsewhere in this file. */
  val corrCteAvg = QueryDef.sqlSame(
    "q_ds_corr_cte_avg",
    s"""WITH ret AS (
         SELECT o.o_custkey AS ck, c.c_nationkey AS nk,
                sum(${centsSql("l.l_extendedprice")}) AS ret_c
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         WHERE l.l_returnflag = 'R'
         GROUP BY o.o_custkey, c.c_nationkey)
       SELECT r1.ck AS custkey,
              CAST(r1.ret_c AS DOUBLE) / 100.0 AS returned
       FROM ret r1
       WHERE CAST(r1.ret_c AS DOUBLE) >
             (SELECT 12e-1 * CAST(sum(r2.ret_c) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE)
              FROM ret r2 WHERE r2.nk = r1.nk)
       ORDER BY returned DESC, custkey LIMIT 40""")

  /** ds23: the "frequent item in BOTH years" double gate — an IN over the
    * INTERSECT of two grouped-HAVING item sets, with a second scalar-
    * subquery spend threshold gating the outer aggregate. The planner
    * builds two aggregate passes, intersects (left-semi under distinct),
    * then semi-joins the fact — and the scalar threshold is a one-row
    * broadcast. */
  val doubleGatedIn = QueryDef.sqlSame(
    "q_ds_double_gated_in",
    s"""SELECT o_orderpriority, count(*) AS n_orders,
              CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS spend_c
       FROM orders
       WHERE o_custkey IN (
           SELECT o_custkey FROM orders
           WHERE year(o_orderdate) = 1996
           GROUP BY o_custkey HAVING count(*) >= 2
           INTERSECT
           SELECT o_custkey FROM orders
           WHERE year(o_orderdate) = 1997
           GROUP BY o_custkey HAVING count(*) >= 2)
         AND o_totalprice > (SELECT ${avgdSql("o_totalprice")} FROM orders)
       GROUP BY o_orderpriority""")

  /** ds49: per-channel DUAL ranking unioned and deduped — within each ship
    * mode, rank parts by return rate AND by returned value, keep anything
    * in either top-10, UNION (distinct) the channels. Two Window specs
    * over one aggregated child per channel, then a distinct union. Ranks
    * use integer cross-multiplied ratios (retq·10^4 ordering) so the sort
    * keys are exact. */
  val returnRankUnion = QueryDef.sqlSame(
    "q_ds_return_rank_union",
    s"""SELECT * FROM (
         SELECT channel, l_partkey, qty_rank, val_rank FROM (
           SELECT channel, l_partkey,
                  CAST(rank() OVER (PARTITION BY channel
                       ORDER BY ret_q * 100000 + l_partkey) AS BIGINT)
                    AS qty_rank,
                  CAST(rank() OVER (PARTITION BY channel
                       ORDER BY ret_c * 100000 + l_partkey) AS BIGINT)
                    AS val_rank
           FROM (
             SELECT l_suppkey % 3 AS channel, l_partkey,
                    CAST(sum(${centsSql("l_quantity")})
                         FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS ret_q,
                    CAST(sum(${centsSql("l_extendedprice")})
                         FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS ret_c
             FROM lineitem
             GROUP BY l_suppkey % 3, l_partkey
             HAVING sum(${centsSql("l_quantity")})
                      FILTER (WHERE l_returnflag = 'R') IS NOT NULL) base) rk
         WHERE qty_rank <= 10 OR val_rank <= 10) u
       ORDER BY channel, l_partkey""")

  /** ds39: the "iceberg streak" — per (supplier, month) demand variability
    * flagged by an ALL-INTEGER coefficient-of-variation predicate
    * (4·n·(n·Σx²−(Σx)²) > (n−1)·(Σx)² ⇔ sample CoV > 1/2), then lead()
    * over the month series to require TWO CONSECUTIVE flagged months.
    * Aggregate → window-lead → self-free consecutive pairing (the window
    * replaces ds39's month self-join). */
  val covStreak = QueryDef.sqlSame(
    "q_ds_cov_streak",
    s"""WITH m AS (
         SELECT l_suppkey, year(l_shipdate) * 12 + month(l_shipdate) AS ym,
                count(*) AS n,
                CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS s1,
                CAST(sum(${centsSql("l_quantity")} * ${centsSql("l_quantity")})
                     AS BIGINT) AS s2
         FROM lineitem GROUP BY l_suppkey, year(l_shipdate), month(l_shipdate)
         HAVING count(*) >= 2),
       f AS (
         SELECT l_suppkey, ym,
                CASE WHEN 4 * n * (n * s2 - s1 * s1) > (n - 1) * s1 * s1
                     THEN 1 ELSE 0 END AS volatile,
                lead(ym) OVER w AS next_ym,
                lead(CASE WHEN 4 * n * (n * s2 - s1 * s1)
                               > (n - 1) * s1 * s1
                          THEN 1 ELSE 0 END) OVER w AS next_volatile
         FROM m
         WINDOW w AS (PARTITION BY l_suppkey ORDER BY ym))
       SELECT l_suppkey, ym AS start_ym
       FROM f
       WHERE volatile = 1 AND next_volatile = 1 AND next_ym = ym + 1
       ORDER BY l_suppkey, start_ym""")

  /** ds72: multi-LEFT-JOIN presence matrix — the fact left-joined to TWO
    * independently derived dimension subsets, counted by the 2×2
    * presence/absence combination. The planner chains two left joins
    * (both broadcastable) and the CASE grid collapses to one aggregate —
    * the "how many rows would each inner join drop" census. */
  val presenceMatrix = QueryDef.sqlSame(
    "q_ds_presence_matrix",
    s"""SELECT CASE WHEN hp.p_partkey IS NULL THEN 0 ELSE 1 END AS has_part,
              CASE WHEN bs.s_suppkey IS NULL THEN 0 ELSE 1 END AS has_supp,
              count(*) AS n,
              CAST(sum(${centsSql("l.l_extendedprice")}) AS BIGINT) AS rev_c
       FROM lineitem l
       LEFT JOIN (SELECT p_partkey FROM part WHERE p_size >= 40) hp
         ON l.l_partkey = hp.p_partkey
       LEFT JOIN (SELECT s_suppkey FROM supplier
                  WHERE s_acctbal > 5000.0) bs
         ON l.l_suppkey = bs.s_suppkey
       GROUP BY 1, 2 ORDER BY 1, 2""")

  /** ds64-style shared-CTE THREE-instance chain: one aggregated per-
    * (customer, year) spend CTE joined to itself across three consecutive
    * years with a strictly-increasing predicate. The planner should plan
    * the CTE once and reuse the exchange three times (or inline it —
    * either way the join tree is two equi-joins on custkey with cross-year
    * filters, never a cross product). */
  val tripleCteGrowth = QueryDef.sqlSame(
    "q_ds_triple_cte_growth",
    s"""WITH spend AS (
         SELECT o_custkey AS ck, year(o_orderdate) AS yr,
                CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sp
         FROM orders WHERE year(o_orderdate) IN (1995, 1996, 1997)
         GROUP BY o_custkey, year(o_orderdate))
       SELECT a.ck AS custkey,
              CAST(a.sp AS DOUBLE) / 100.0 AS y1995,
              CAST(b.sp AS DOUBLE) / 100.0 AS y1996,
              CAST(c.sp AS DOUBLE) / 100.0 AS y1997
       FROM spend a
       JOIN spend b ON a.ck = b.ck AND a.yr = 1995 AND b.yr = 1996
       JOIN spend c ON b.ck = c.ck AND c.yr = 1997
       WHERE a.sp < b.sp AND b.sp < c.sp
       ORDER BY custkey""")

  /** ds54: revenue inside a PER-CUSTOMER derived date window — each
    * customer's orders within 3 months of their first order, bucketed
    * into a spend histogram. A min-date aggregate joined back to the
    * fact, date arithmetic forming the window, then a re-aggregate: the
    * planner sees agg → join (broadcastable at the customer grain after
    * aggregation? no — same-table join, hash on custkey) → agg → bucket
    * agg. */
  val firstWindowRevenue = QueryDef.sqlSame(
    "q_ds_first_window_revenue",
    s"""WITH firsts AS (
         SELECT o_custkey AS ck, min(o_orderdate) AS first_dt
         FROM orders GROUP BY o_custkey),
       win_spend AS (
         SELECT o.o_custkey,
                CAST(sum(${centsSql("o.o_totalprice")}) AS BIGINT) AS sp
         FROM orders o JOIN firsts f ON o.o_custkey = f.ck
         WHERE o.o_orderdate >= f.first_dt
           AND o.o_orderdate < f.first_dt + INTERVAL 90 DAY
         GROUP BY o.o_custkey)
       SELECT CAST(floor(CAST(sp AS DOUBLE) / 5e6) AS BIGINT) AS spend_bucket,
              count(*) AS n_customers,
              CAST(sum(sp) AS BIGINT) AS total_c
       FROM win_spend
       GROUP BY 1 ORDER BY 1""")

  /** ds31: SHARE-GROWTH comparison of two parallel series — per (user
    * bucket, 10-day period) spend for two event types, the SAME series
    * joined across consecutive periods for both types (4 aggregate
    * instances), keeping buckets where type-A grew strictly faster than
    * type-B. The growth comparison is integer cross-multiplied
    * (a2·b1 > b2·a1 ⇔ a2/a1 > b2/b1 for positive sums) so no division
    * can flip a boundary. (The events fixture spans one month — the
    * 10-day periods stand in for ds31's quarters.) */
  val shareGrowth = QueryDef.sqlSame(
    "q_ds_share_growth",
    """WITH q AS (
         SELECT user_id % 50 AS bucket,
                CAST(floor((day(ts) - 1) / 1e1) AS BIGINT) AS pd, event_type,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  AS v
         FROM events
         WHERE event_type IN ('purchase', 'click')
         GROUP BY user_id % 50, CAST(floor((day(ts) - 1) / 1e1) AS BIGINT),
                  event_type)
       SELECT p1.bucket,
              p1.v AS p_q1, p2.v AS p_q2, c1.v AS c_q1, c2.v AS c_q2
       FROM q p1 JOIN q p2 ON p1.bucket = p2.bucket
        AND p1.event_type = 'purchase' AND p2.event_type = 'purchase'
        AND p1.pd = 0 AND p2.pd = 1
       JOIN q c1 ON p1.bucket = c1.bucket
        AND c1.event_type = 'click' AND c1.pd = 0
       JOIN q c2 ON p1.bucket = c2.bucket
        AND c2.event_type = 'click' AND c2.pd = 1
       WHERE p1.v > 0 AND c1.v > 0 AND p2.v * c1.v > c2.v * p1.v
       ORDER BY 1""")

  /** ds16/ds94 at the order grain: a SEMI (some line over the quantity
    * cut) and an ANTI (no returned line) against the SAME fact feeding a
    * COUNT(DISTINCT) at a coarser grain — the planner stacks left-semi +
    * left-anti on one scan pair, then a distinct-aggregate. */
  val semiAntiDistinct = QueryDef.sqlSame(
    "q_ds_semi_anti_distinct",
    s"""SELECT o_orderpriority,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
              count(*) AS n_orders,
              CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS spend_c
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
         AND NOT EXISTS (SELECT 1 FROM lineitem
                         WHERE l_orderkey = o_orderkey
                           AND l_returnflag = 'R')
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** ds-cohort set algebra WITHOUT set operators: users active in the
    * first and second 10-day periods but silent in the third, computed as
    * ONE aggregate with three FILTER flags and a HAVING — the single-scan
    * alternative to the INTERSECT/EXCEPT chain (q_ds_except_cohort), and
    * a different planner shape: no joins at all, just conditional
    * aggregation. */
  val flagRetention = QueryDef.sqlSame(
    "q_ds_flag_retention",
    """SELECT user_id,
              count(*) FILTER (WHERE day(ts) <= 10) AS p1_events,
              count(*) FILTER (WHERE day(ts) BETWEEN 11 AND 20) AS p2_events
       FROM events WHERE event_type = 'purchase'
       GROUP BY user_id
       HAVING count(*) FILTER (WHERE day(ts) <= 10) > 0
          AND count(*) FILTER (WHERE day(ts) BETWEEN 11 AND 20) > 0
          AND count(*) FILTER (WHERE day(ts) > 20) = 0
       ORDER BY user_id""")

  /** Decile cohort re-join: ntile(10) over per-customer spend, the decile
    * table joined BACK to the fact and re-aggregated per decile — the
    * "window output becomes a dimension" composite (agg → window →
    * join → agg). */
  val decileSpend = QueryDef.sqlSame(
    "q_ds_decile_spend",
    s"""WITH spend AS (
         SELECT o_custkey AS ck,
                CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sp
         FROM orders GROUP BY o_custkey),
       deciles AS (
         SELECT ck, CAST(ntile(10) OVER (ORDER BY sp, ck) AS BIGINT)
                      AS decile
         FROM spend)
       SELECT d.decile, count(*) AS n_orders,
              CAST(sum(${centsSql("o.o_totalprice")}) AS BIGINT) AS spend_c,
              CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_custs
       FROM orders o JOIN deciles d ON o.o_custkey = d.ck
       GROUP BY d.decile ORDER BY d.decile""")

  /** ds44: BIDIRECTIONAL rank join — best-10 and worst-10 parts by net
    * quantity from ONE aggregate, the two opposite-direction rank chains
    * joined ON RANK POSITION (best i beside worst i). One aggregate, two
    * Window specs over the same child (asc + desc), one equi-join on the
    * rank value. */
  val bidirectionalRank = QueryDef.sqlSame(
    "q_ds_bidirectional_rank",
    s"""WITH perf AS (
         SELECT l_partkey,
                CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS q
         FROM lineitem GROUP BY l_partkey),
       ranked AS (
         SELECT l_partkey, q,
                CAST(row_number() OVER (ORDER BY q, l_partkey) AS BIGINT)
                  AS worst_rn,
                CAST(row_number() OVER (ORDER BY q DESC, l_partkey)
                     AS BIGINT) AS best_rn
         FROM perf)
       SELECT b.best_rn AS pos, b.l_partkey AS best_part, b.q AS best_q,
              w.l_partkey AS worst_part, w.q AS worst_q
       FROM ranked b JOIN ranked w ON b.best_rn = w.worst_rn
       WHERE b.best_rn <= 10 ORDER BY pos""")

  /** ds45: DISJUNCTION of a dim predicate and an IN-subquery — the OR
    * means the membership test cannot become a plain semi-join; the
    * planner turns it into an ExistenceJoin feeding the OR filter (the
    * SQL-level route to §2.3's existence-join machinery). */
  val orSubquery = QueryDef.sqlSame(
    "q_ds_or_subquery",
    s"""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS spend_c
       FROM orders
       WHERE o_custkey IN (SELECT o_custkey FROM orders
                           GROUP BY o_custkey
                           HAVING count(*) >= 25)
          OR o_orderpriority = '1-URGENT'
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** ds58: TRIPLE-BALANCE — three channel aggregates over one fact, kept
    * only where each pair agrees within 25%, spelled as integer
    * cross-multiplications (4·a ≤ 5·b ∧ 4·b ≤ 5·a for every pair) so no
    * ratio division exists to flip a boundary part. Three aggregate
    * branches, two equi-joins, six inequality filters. */
  val tripleBalance = QueryDef.sqlSame(
    "q_ds_triple_balance",
    s"""WITH a AS (SELECT l_partkey, CAST(sum(${centsSql("l_quantity")})
                       AS BIGINT) AS v
               FROM lineitem WHERE l_linenumber % 3 = 0 GROUP BY l_partkey),
       b AS (SELECT l_partkey, CAST(sum(${centsSql("l_quantity")})
                       AS BIGINT) AS v
               FROM lineitem WHERE l_linenumber % 3 = 1 GROUP BY l_partkey),
       c AS (SELECT l_partkey, CAST(sum(${centsSql("l_quantity")})
                       AS BIGINT) AS v
               FROM lineitem WHERE l_linenumber % 3 = 2 GROUP BY l_partkey)
       SELECT a.l_partkey AS partkey, a.v AS v1, b.v AS v2, c.v AS v3
       FROM a JOIN b ON a.l_partkey = b.l_partkey
              JOIN c ON a.l_partkey = c.l_partkey
       WHERE 4 * a.v <= 5 * b.v AND 4 * b.v <= 5 * a.v
         AND 4 * a.v <= 5 * c.v AND 4 * c.v <= 5 * a.v
         AND 4 * b.v <= 5 * c.v AND 4 * c.v <= 5 * b.v
       ORDER BY partkey""")

  /** EXISTS over a GROUP BY + HAVING subquery — the correlated predicate
    * is an AGGREGATE property of the inner group (some supplier ships
    * >90 units in the order), so decorrelation must pull the whole
    * aggregate through the semi-join, not just a filter. */
  val existsGroupHaving = QueryDef.sqlSame(
    "q_ds_exists_group_having",
    s"""SELECT o_orderstatus, count(*) AS n_orders
       FROM orders
       WHERE EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey
           GROUP BY l_suppkey
           HAVING sum(${centsSql("l_quantity")}) > 9000)
       GROUP BY o_orderstatus ORDER BY o_orderstatus""")

  /** Rolling 7-day DISTINCT purchasers per day — windowed COUNT(DISTINCT)
    * doesn't exist as a window function in either engine, so the portable
    * plan is the day-grain range self-join + distinct re-aggregate: the
    * days table is DIM-sized after the first aggregate (≤31 rows here —
    * at any scale, days are bounded), so the range join broadcasts. */
  val rollingDistinct = QueryDef.sqlSame(
    "q_ds_rolling_distinct",
    """WITH du AS (
         SELECT DISTINCT day(ts) AS d, user_id
         FROM events WHERE event_type = 'purchase'),
       days AS (SELECT DISTINCT d FROM du)
       SELECT days.d AS day,
              CAST(count(DISTINCT du.user_id) AS BIGINT) AS users_7d
       FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
       GROUP BY days.d ORDER BY day""")

  /** ds13/ds48/ds85: the OR-of-conjunctive-BANDS predicate — three
    * disjuncts, each a conjunction mixing columns from BOTH join sides, so
    * the planner must keep the clean equi-join and evaluate the disjunction
    * as a post-join filter (it can't be pushed to either input alone;
    * only the per-band dim/fact prefilters union-push). */
  val bandDisjunction = QueryDef.sqlSame(
    "q_ds_band_disjunction",
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS spend_c
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE (c_mktsegment = 'BUILDING'
              AND o_totalprice BETWEEN 1000 AND 60000
              AND o_orderstatus = 'F')
          OR (c_mktsegment = 'AUTOMOBILE'
              AND o_totalprice BETWEEN 60000 AND 150000
              AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
          OR (c_mktsegment = 'MACHINERY' AND o_totalprice > 150000
              AND c_acctbal > 0)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** ds84: PROJECTION-ONLY star chain — no aggregate anywhere; the whole
    * plan is a fact filter + two broadcast dim hops + a concat projection
    * (the one DS query that is pure join/project, pinning that the engine
    * doesn't insert a needless exchange when nothing reduces). */
  val starConcat = QueryDef.sqlSame(
    "q_ds_star_concat",
    """SELECT c_custkey AS custkey,
              concat(c_name, ' : ', n_name, ' / ', r_name) AS who
       FROM customer JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE c_acctbal BETWEEN 100 AND 400
       ORDER BY custkey""")

  /** ds28: the BAND BATTERY of scalar subqueries — six scalar aggregates
    * (count / count DISTINCT / exact sum) over three disjoint quantity
    * bands of ONE fact table, materialized into a single row; pins scalar
    * subquery execution + the scan-reuse opportunity across bands. */
  val bandDistinctBattery = QueryDef.sqlSame(
    "q_ds_band_distinct_battery",
    s"""SELECT
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem
          WHERE l_quantity BETWEEN 1 AND 15) AS n_low,
         (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
          WHERE l_quantity BETWEEN 1 AND 15) AS nd_low,
         (SELECT CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT)
          FROM lineitem WHERE l_quantity BETWEEN 1 AND 15) AS rev_low_c,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem
          WHERE l_quantity BETWEEN 16 AND 35) AS n_mid,
         (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
          WHERE l_quantity BETWEEN 16 AND 35) AS nd_mid,
         (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem
          WHERE l_quantity > 35) AS nd_high""")

  /** ds65: BELOW-HALF-OF-GROUP-AVERAGE join — the (supplier, part) revenue
    * grain re-aggregated to supplier grain, then joined back with the
    * threshold spelled as an integer cross-multiplication
    * (2·rev·n ≤ total ⟺ rev ≤ avg/2), so no division exists to flip a
    * boundary row. Two-level re-aggregation of one derived relation. */
  val belowAvgRevenue = QueryDef.sqlSame(
    "q_ds_below_avg_revenue",
    s"""WITH pr AS (
         SELECT l_suppkey, l_partkey,
                CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS rev_c
         FROM lineitem GROUP BY l_suppkey, l_partkey),
       sa AS (
         SELECT l_suppkey, CAST(sum(rev_c) AS BIGINT) AS tot_c,
                CAST(count(*) AS BIGINT) AS np
         FROM pr GROUP BY l_suppkey)
       SELECT pr.l_suppkey AS suppkey, pr.l_partkey AS partkey, pr.rev_c
       FROM pr JOIN sa ON pr.l_suppkey = sa.l_suppkey
       WHERE 2 * pr.rev_c * sa.np <= sa.tot_c
       ORDER BY suppkey, partkey""")

  /** ds75: three-channel counts re-aggregated to (year, part), then the
    * prior-year self-join keeping parts whose order COUNT dropped >20% —
    * the decrease filter as an integer cross-multiplication
    * (5·cur < 4·prev).
    *
    * Scan reuse (round 7, VERDICT r6 #4): the oracle keeps the ds75 shape
    * verbatim — three channel scans UNION ALL'd then re-aggregated — but
    * the engine plans ONE fact scan: the emulated channels are disjoint
    * returnflag slices of the same fact, so the union-of-channel-counts at
    * (yr, part) grain is exactly the single grouped count over the
    * combined channel filter. The (yr, part) aggregate (part-dim-bounded,
    * never fact-sized) is persisted so the prev/cur self-join reads it
    * twice without recomputing the scan — the persisted-channel-base
    * pattern real DS channels (separate fact tables) need. One lineitem
    * scan is pinned in PlanAuditSpec + the plan signature. */
  val channelCountDelta = QueryDef(
    "q_ds_channel_count_delta",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      val tot = graft.Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "N", "R"))
        .groupBy(year(col("l_shipdate")).cast("int").as("yr"),
          col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      val cur = tot.select(col("l_partkey").as("partkey"), col("yr"),
        col("cnt").as("cur_cnt"))
      val prev = tot.select(col("l_partkey").as("pk_prev"),
        col("yr").as("prev_yr"), col("cnt").as("prev_cnt"))
      cur.join(prev, col("partkey") === col("pk_prev") &&
          col("yr") === col("prev_yr") + 1)
        .filter(col("cur_cnt") * 5 < col("prev_cnt") * 4)
        .select(col("partkey"), col("prev_yr"), col("prev_cnt"),
          col("cur_cnt"))
        .orderBy(col("partkey"), col("prev_yr"))
    },
    Some("""WITH ch AS (
         SELECT CAST(year(l_shipdate) AS INT) AS yr, l_partkey,
                count(*) AS cnt
         FROM lineitem WHERE l_returnflag = 'A' GROUP BY year(l_shipdate), l_partkey
         UNION ALL
         SELECT CAST(year(l_shipdate) AS INT) AS yr, l_partkey,
                count(*) AS cnt
         FROM lineitem WHERE l_returnflag = 'N' GROUP BY year(l_shipdate), l_partkey
         UNION ALL
         SELECT CAST(year(l_shipdate) AS INT) AS yr, l_partkey,
                count(*) AS cnt
         FROM lineitem WHERE l_returnflag = 'R' GROUP BY year(l_shipdate), l_partkey),
       tot AS (
         SELECT yr, l_partkey, CAST(sum(cnt) AS BIGINT) AS cnt
         FROM ch GROUP BY yr, l_partkey)
       SELECT cur.l_partkey AS partkey, prev.yr AS prev_yr,
              prev.cnt AS prev_cnt, cur.cnt AS cur_cnt
       FROM tot cur JOIN tot prev
         ON cur.l_partkey = prev.l_partkey AND cur.yr = prev.yr + 1
       WHERE 5 * cur.cnt < 4 * prev.cnt
       ORDER BY partkey, prev_yr"""))

  /** ds61: the PROMOTION-SHARE ratio — two aggregates over the SAME
    * join tree (promo-filtered numerator, unfiltered denominator), the
    * classic exchange/scan-reuse opportunity, output as one exact-cents
    * ratio row per region. */
  val promoRatio = QueryDef(
    "q_ds_promo_ratio",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      // Scan reuse (round 7): numerator and denominator aggregate the SAME
      // join tree, so the engine computes both in ONE pass — a conditional
      // aggregate over a single scan of the star (the classic rewrite for
      // filtered-share reports). The inner-join drop of regions with zero
      // promo rows is preserved by the null-sum filter.
      val base = graft.Tables(spark, dir, "orders")
        .join(graft.Tables(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(graft.Tables(spark, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(graft.Tables(spark, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("o_orderpriority"),
          cents(col("o_totalprice")).as("price_c"))
      base.groupBy(col("r_name").as("region"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            col("price_c"))).as("promo_c"),
          sum(col("price_c")).as("total_c"))
        .filter(col("promo_c").isNotNull)
        .select(col("region"), col("promo_c"), col("total_c"),
          (col("promo_c").cast("double") / col("total_c").cast("double"))
            .as("promo_share"))
        .orderBy(col("region"))
    },
    Some(s"""WITH base AS (
         SELECT r_name, o_orderpriority,
                ${centsSql("o_totalprice")} AS price_c
         FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey),
       promo AS (SELECT r_name, CAST(sum(price_c) AS BIGINT) AS v
                 FROM base
                 WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
                 GROUP BY r_name),
       total AS (SELECT r_name, CAST(sum(price_c) AS BIGINT) AS v
                 FROM base GROUP BY r_name)
       SELECT t.r_name AS region, p.v AS promo_c, t.v AS total_c,
              CAST(p.v AS DOUBLE) / CAST(t.v AS DOUBLE) AS promo_share
       FROM total t JOIN promo p ON t.r_name = p.r_name
       ORDER BY region"""))

  /** ds35-family MULTI-DISTINCT aggregate: several COUNT(DISTINCT x) over
    * DIFFERENT columns plus a plain sum in ONE aggregate — the planner
    * must rewrite through Expand (one input replica per distinct set)
    * and keep the non-distinct aggregate consistent across replicas. */
  val multiDistinct = QueryDef.sqlSpread(
    "q_ds_multi_distinct",
    s"""SELECT l_returnflag,
              CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd_order,
              CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS qty_c
       FROM lineitem
       GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** ds3/ds42/ds52/ds55: the manager's BRAND REPORT family — one
    * date-windowed fact scan joined to the item dimension, grouped by
    * brand, ordered by revenue with the brand as tiebreak. The simplest
    * star shape in DS (four of its queries are this template verbatim);
    * the dim broadcasts, the date filter reaches the parquet scan. */
  val brandStarReport = QueryDef.sqlSame(
    "q_ds_brand_star_report",
    s"""SELECT p_brand, ${sumdSql("l_extendedprice")} AS brand_rev,
              count(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE year(l_shipdate) = 1997 AND month(l_shipdate) = 12
       GROUP BY p_brand
       ORDER BY brand_rev DESC, p_brand LIMIT 25""")

  /** ds7/ds26: the four-AVERAGE battery — avg quantity / list price /
    * discount / tax per item class under dimension filters. Partial-avg
    * decomposition (sum+count split across the exchange) on four measures
    * at once; exact cent accumulation keeps every mean bit-portable. */
  val avgBattery = QueryDef.sqlSame(
    "q_ds_avg_battery",
    s"""SELECT p_type, ${avgdSql("l_quantity")} AS avg_qty,
              ${avgdSql("l_extendedprice")} AS avg_price,
              ${avgdSql("l_discount")} AS avg_disc,
              ${avgdSql("l_tax")} AS avg_tax
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_returnflag = 'N' AND year(l_shipdate) = 1997
       GROUP BY p_type ORDER BY p_type""")

  /** ds4: the SIX-INSTANCE yearly-spend self-join — per (customer,
    * channel, year) aggregate instantiated six times (three channels ×
    * two years) and chained on the customer key; "grew faster in channel
    * F than in O and P". Spark plans ONE aggregate and reuses the
    * exchange six ways; growth compares are integer cross-multiplication
    * (sp > 0 always), so no division, no boundary flips. */
  val tripleChannelYoy = QueryDef.sqlSame(
    "q_ds_triple_channel_yoy",
    s"""WITH yt AS (
         SELECT o_custkey AS ck, o_orderstatus AS ch,
                CAST(year(o_orderdate) AS INT) AS yr,
                sum(${centsSql("o_totalprice")}) AS sp
         FROM orders GROUP BY 1, 2, 3)
       SELECT f1.ck AS custkey,
              CAST(f1.sp AS DOUBLE) / 100.0 AS f_1997,
              CAST(f2.sp AS DOUBLE) / 100.0 AS f_1998
       FROM yt f1 JOIN yt f2 ON f1.ck = f2.ck
        AND f1.ch = 'F' AND f2.ch = 'F' AND f1.yr = 1997 AND f2.yr = 1998
       JOIN yt o1 ON o1.ck = f1.ck AND o1.ch = 'O' AND o1.yr = 1997
       JOIN yt o2 ON o2.ck = f1.ck AND o2.ch = 'O' AND o2.yr = 1998
       JOIN yt p1 ON p1.ck = f1.ck AND p1.ch = 'P' AND p1.yr = 1997
       JOIN yt p2 ON p2.ck = f1.ck AND p2.ch = 'P' AND p2.yr = 1998
       WHERE f2.sp * o1.sp > o2.sp * f1.sp
         AND f2.sp * p1.sp > p2.sp * f1.sp
       ORDER BY custkey""")

  /** ds15: CROSS-ATTRIBUTE disjunction gate — an OR spanning a suffix
    * test, a balance threshold, and a segment IN-list on the customer
    * dimension, none of which filters alone; the whole predicate rides the
    * dim side of the fact join (pushed below the shuffle, not expanded
    * into a union of scans). */
  val crossAttrDisjunction = QueryDef.sqlSame(
    "q_ds_cross_attr_disjunction",
    s"""SELECT c_nationkey, count(*) AS n_orders,
              ${sumdSql("o_totalprice")} AS rev
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE substr(c_name, -2) IN ('01', '33', '60')
          OR c_acctbal > 9900.0
          OR c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
       GROUP BY c_nationkey ORDER BY c_nationkey""")

  /** ds18: AVERAGES under ROLLUP — the partial-avg sum/count split must
    * survive the Expand replication (each grouping level accumulates its
    * own exact cent sum and count); grouping() disambiguates NULL-valued
    * subtotal rows from NULL data. */
  val rollupAvg = QueryDef.sqlSpread(
    "q_ds_rollup_avg",
    s"""SELECT l_returnflag, l_linestatus,
              CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                   AS INT) AS lvl,
              ${avgdSql("l_quantity")} AS avg_qty,
              ${avgdSql("l_extendedprice")} AS avg_price,
              ${avgdSql("l_discount")} AS avg_disc
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""")

  /** ds19: the ZIP-MISMATCH brand report — revenue by brand where the
    * customer's nation differs from the supplier's, an INEQUALITY between
    * two dimension keys that only becomes evaluable after both dim joins
    * (a residual filter above a 4-way star). */
  val nationMismatch = QueryDef.sqlSame(
    "q_ds_nation_mismatch",
    s"""SELECT p_brand, ${sumdSql("l_extendedprice")} AS rev,
              count(*) AS n_lines
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN part     ON l_partkey = p_partkey
       WHERE c_nationkey <> s_nationkey AND year(o_orderdate) = 1998
       GROUP BY p_brand ORDER BY rev DESC, p_brand LIMIT 20""")

  /** ds37/ds82: items in a PRICE BAND that actually moved in a date
    * window — dim-side band filter AND a semi-join (IN-subquery) against
    * the date-restricted fact. The planner pushes the band to the part
    * scan and plans the IN as a LeftSemi with the fact aggregated to
    * distinct keys on the build side. */
  val priceBandSemi = QueryDef.sqlSame(
    "q_ds_price_band_semi",
    """SELECT p_partkey AS partkey, p_name, p_retailprice
       FROM part
       WHERE p_retailprice BETWEEN 920.0 AND 940.0
         AND p_partkey IN
             (SELECT l_partkey FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                AND l_shipdate < TIMESTAMP '1997-09-01')
       ORDER BY partkey LIMIT 50""")

  /** ds71: per-HOUR brand-style report over a UNION of three channels —
    * each channel is a filtered scan of the events stream, the union
    * feeds one time-of-day aggregation (the "which hour sells" shape).
    * events.value is 2-dp (FIXTURES.md), so cents stay exact. */
  val hourChannelUnion = QueryDef.sqlSame(
    "q_ds_hour_channel_union",
    s"""WITH u AS (
         SELECT 'web' AS channel, user_id, value, ts FROM events
         WHERE event_type = 'click'
         UNION ALL
         SELECT 'app', user_id, value, ts FROM events
         WHERE event_type = 'view'
         UNION ALL
         SELECT 'store', user_id, value, ts FROM events
         WHERE event_type = 'purchase')
       SELECT channel, CAST(hour(ts) AS INT) AS hr, count(*) AS n,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              ${sumdSql("value")} AS amount
       FROM u GROUP BY channel, hour(ts)
       ORDER BY channel, hr""")

  /** ds83: the three-branch RETURNS MATRIX — per-flag counts aggregated
    * in three CTE branches over a shared IN-subquery date set, then
    * joined pairwise on the item key into one row per part. Subquery
    * reuse dedups the date-set scan; the three branch aggregates share
    * one partkey exchange each. */
  val returnsMatrix = QueryDef.sqlSame(
    "q_ds_returns_matrix",
    """WITH ds AS (
         SELECT DISTINCT l_shipdate FROM lineitem
         WHERE year(l_shipdate) = 1997 AND month(l_shipdate) IN (1, 4, 7)),
       r1 AS (SELECT l_partkey, count(*) AS n_r FROM lineitem
              WHERE l_returnflag = 'R'
                AND l_shipdate IN (SELECT l_shipdate FROM ds)
              GROUP BY l_partkey),
       r2 AS (SELECT l_partkey, count(*) AS n_a FROM lineitem
              WHERE l_returnflag = 'A'
                AND l_shipdate IN (SELECT l_shipdate FROM ds)
              GROUP BY l_partkey),
       r3 AS (SELECT l_partkey, count(*) AS n_n FROM lineitem
              WHERE l_returnflag = 'N'
                AND l_shipdate IN (SELECT l_shipdate FROM ds)
              GROUP BY l_partkey)
       SELECT r1.l_partkey AS partkey, n_r, n_a, n_n
       FROM r1 JOIN r2 ON r1.l_partkey = r2.l_partkey
       JOIN r3 ON r1.l_partkey = r3.l_partkey
       ORDER BY partkey LIMIT 60""")

  /** ds96: the SELECTIVE COUNT — one scalar count(*) through a two-hop
    * dim chain with every filter pushed to its own scan; the whole plan
    * is broadcast joins under a single partial/final count. */
  val selectiveCount = QueryDef.sqlSame(
    "q_ds_selective_count",
    """SELECT count(*) AS n
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderpriority = '1-URGENT'
         AND c_mktsegment = 'BUILDING'
         AND n_regionkey = 2""")

  /** ds91: disjunction of attribute PAIRS straddling the join — (priority
    * AND negative balance) OR (status AND segment) mixes columns of BOTH
    * tables in each conjunct, so neither side of the join can evaluate the
    * predicate alone; it must run as a residual filter above the join
    * while each conjunct's single-table half still prunes its scan. */
  val crossTablePairDisjunction = QueryDef.sqlSame(
    "q_ds_pair_disjunction",
    s"""SELECT c_mktsegment, count(*) AS n_orders,
              ${sumdSql("o_totalprice")} AS rev
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE (o_orderpriority = '1-URGENT' AND c_acctbal < 500.0)
          OR (o_orderstatus = 'F' AND c_mktsegment = 'HOUSEHOLD')
       GROUP BY c_mktsegment ORDER BY c_mktsegment""")

  val all: Seq[QueryDef] = Seq(
    brandStarReport, avgBattery, tripleChannelYoy, crossAttrDisjunction,
    rollupAvg, nationMismatch, priceBandSemi, hourChannelUnion,
    returnsMatrix, selectiveCount, crossTablePairDisjunction,
    bandDisjunction, starConcat, bandDistinctBattery, belowAvgRevenue,
    channelCountDelta, promoRatio, multiDistinct,
    rollupRank, yoyRatio, cumulativeFullJoin, multiScalar, unionReagg,
    intersectCount, rollupGroupingRank, frequentBuyers, movingAvg,
    multiExists, dateInSubquery, lapsedCohorts, aboveGroupAvg, dualRank,
    existsSelfJoin, existsSelfJoinFast, cteTripleSelfJoin, bucketCountsFast,
    channelOverlap, weekdayPivotRatio, covSelfJoin, followupWindow,
    returnsNet, timeRatio, beforeAfter, nullChannel,
    lagRankDev, groupingCasePartition, groupingBattery, exceptCohort,
    fullOuterCoalesce, crossChannelRollup, windowFilteredRollup,
    revenueShare, rankJoin, wideMonthPivot, returnsChain, disjunctiveSemi,
    intervalRangeWindow, distinctRollup, unionTopK,
    caseScalarBuckets, havingScalarCte, latencyBuckets, corrExcessDiscount,
    aggJoinInequality, signedUnionRollup, partitionDeviation,
    gatedCountDistinct, orderCountHistogram, dimDisjunctionBattery,
    dimAboveAvgJoin, wowPivotRatio, tripleFullOuter, corrCteAvg,
    doubleGatedIn, returnRankUnion, covStreak, presenceMatrix,
    tripleCteGrowth, firstWindowRevenue,
    shareGrowth, semiAntiDistinct, flagRetention, decileSpend,
    bidirectionalRank, orSubquery, tripleBalance, existsGroupHaving,
    rollingDistinct)
}
