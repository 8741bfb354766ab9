package graft.operators

import graft.QueryDef

/** Ports of the reference's forked-Spark `window.sql` SQLQueryTestSuite
  * input (reference: native-sql-engine/core/src/test/resources/sql-tests/
  * inputs/window.sql — 264 lines: ROWS/RANGE frames, the 30-function
  * battery, nth_value frame matrix, FILTER clauses). Same porting
  * discipline as [[GoldenSqlt]]: each dialect-portable statement group is
  * ONE registry row checked against the live DuckDB oracle; window ORDER
  * BY always spells NULLS FIRST explicitly (Spark's ascending default,
  * DuckDB's is NULLS LAST).
  *
  * Documented exclusions (statements deliberately not ported):
  *  - the six "Invalid window frame" statements are ANALYSIS ERRORS, not
  *    result rows — pinned by GoldenWindowErrorsSpec instead.
  *  - `row_number() OVER (PARTITION BY cate)` with no ORDER BY:
  *    nondeterministic row assignment by definition.
  *  - `approx_count_distinct` over a window: sketch-estimate, not a
  *    cross-engine fact (the sketch family is driver-checked through its
  *    guarantee facts in Aggregates instead).
  *  - `collect_list`/`collect_set` windows: list-typed output columns are
  *    outside the driver comparator's domain (and DuckDB's list() window
  *    has no deterministic cross-engine ordering contract).
  *  - `skewness`/`kurtosis`: DuckDB computes the SAMPLE (bias-corrected)
  *    statistics, Spark the population ones — cross-engine by design.
  *    stddev/var family IS covered, through exact windowed moments (the
  *    q_agg_stddev discipline: integer sums windowed, one identical
  *    IEEE expression at the end).
  *  - the timestamp RANGE frame (`interval 23 days 4 hours FOLLOWING`):
  *    DuckDB RANGE over TIMESTAMP takes INTERVAL too but Spark orders by
  *    the TIMESTAMP as seconds-since-epoch — day-time interval frame
  *    arithmetic differs under DST-less vs calendar intervals; the DATE
  *    range frame below pins the calendar-frame behavior instead.
  */
object GoldenSqltWindow {

  /** window.sql:7-17 testData, minus the timestamp column (see
    * exclusions) — NULL rows included, types spelled portably. */
  private val testData = """
    testdata AS (SELECT * FROM (VALUES
      (CAST(NULL AS INT), CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE),
       DATE '2017-08-01', 'a'),
      (1, CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE), DATE '2017-08-01', 'a'),
      (1, CAST(2 AS BIGINT), CAST(2.5 AS DOUBLE), DATE '2017-08-02', 'a'),
      (2, CAST(2147483650 AS BIGINT), CAST(100.001 AS DOUBLE),
       DATE '2020-12-31', 'a'),
      (1, CAST(NULL AS BIGINT), CAST(1.0 AS DOUBLE),
       DATE '2017-08-01', 'b'),
      (2, CAST(3 AS BIGINT), CAST(3.3 AS DOUBLE), DATE '2017-08-03', 'b'),
      (3, CAST(2147483650 AS BIGINT), CAST(100.001 AS DOUBLE),
       DATE '2020-12-31', 'b'),
      (CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS DATE), CAST(NULL AS STRING)),
      (3, CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE), DATE '2017-08-01',
       CAST(NULL AS STRING))
    ) AS t(val, val_long, val_double, val_date, cate))"""

  /** window.sql:19-38 basic_pays — 17 (employee, department, salary)
    * rows for the nth_value frame matrix. */
  private val basicPays = """
    basic_pays AS (SELECT * FROM (VALUES
      ('Diane Murphy','Accounting',8435),
      ('Mary Patterson','Accounting',9998),
      ('Jeff Firrelli','Accounting',8992),
      ('William Patterson','Accounting',8870),
      ('Gerard Bondur','Accounting',11472),
      ('Anthony Bow','Accounting',6627),
      ('Leslie Jennings','IT',8113),
      ('Leslie Thompson','IT',5186),
      ('Julie Firrelli','Sales',9181),
      ('Steve Patterson','Sales',9441),
      ('Foon Yue Tseng','Sales',6660),
      ('George Vanauf','Sales',10563),
      ('Loui Bondur','SCM',10449),
      ('Gerard Hernandez','SCM',6949),
      ('Pamela Castillo','SCM',11303),
      ('Larry Bott','SCM',11798),
      ('Barry Jones','SCM',10586)
    ) AS t(employee_name, department, salary))"""

  /** window.sql:40-47 — the ROWS-frame block: CURRENT ROW only,
    * UNBOUNDED PRECEDING..1 FOLLOWING, and a frame bound past INT range
    * (2147483648 FOLLOWING) over the bigint column. */
  val winRows = QueryDef.sqlSame(
    "q_golden_sqlt_win_rows",
    s"""WITH $testData
       SELECT val, val_long, cate,
              count(val) OVER (PARTITION BY cate ORDER BY val NULLS FIRST
                ROWS BETWEEN CURRENT ROW AND CURRENT ROW) AS c_cur,
              CAST(sum(val) OVER (PARTITION BY cate ORDER BY val NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING)
                AS BIGINT) AS s_unb1,
              CAST(sum(val_long) OVER (PARTITION BY cate
                ORDER BY val_long NULLS FIRST
                ROWS BETWEEN CURRENT ROW AND 2147483647 FOLLOWING)
                AS BIGINT) AS s_bigframe
       FROM testdata""")
  // exclusion: the reference's `ROWS ... 2147483648 FOLLOWING` (a bound
  // past INT range) is rejected by Spark 4's analyzer (ROWS bounds must
  // be INT; SPECIFIED_WINDOW_FRAME_UNACCEPTED_TYPE) — INT_MAX pins the
  // saturating behavior, and the RANGE block keeps the >INT bound (RANGE
  // bounds follow the order-key type).

  /** window.sql:49-62 — RANGE frames: 1 PRECEDING shorthand, CURRENT..1
    * FOLLOWING, the past-INT bigint bound, the double-offset frame (sum
    * carried as exact millis-scaled integers), and the DESC reverse
    * range. */
  val winRange = QueryDef.sqlSame(
    "q_golden_sqlt_win_range",
    s"""WITH $testData
       SELECT val, val_long, cate,
              count(val) OVER (PARTITION BY cate ORDER BY val NULLS FIRST
                RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS c_r1p,
              CAST(sum(val) OVER (PARTITION BY cate ORDER BY val NULLS FIRST
                RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING)
                AS BIGINT) AS s_r1f,
              CAST(sum(val_long) OVER (PARTITION BY cate
                ORDER BY val_long NULLS FIRST
                RANGE BETWEEN CURRENT ROW AND 2147483648 FOLLOWING)
                AS BIGINT) AS s_rbig,
              CAST(sum(CAST(val_double * 1000 AS BIGINT)) OVER (
                PARTITION BY cate ORDER BY val_double NULLS FIRST
                RANGE BETWEEN CURRENT ROW AND 2.5 FOLLOWING)
                AS BIGINT) AS s_rdbl_x1000,
              CAST(sum(val) OVER (PARTITION BY cate
                ORDER BY val DESC NULLS FIRST
                RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING)
                AS BIGINT) AS s_rdesc
       FROM testdata""")

  /** window.sql:57-58 — the DATE range frame (`2 FOLLOWING` over an
    * ORDER BY date). Spark takes a bare day count; DuckDB requires an
    * INTERVAL bound — same semantics, two spellings. */
  val winRangeDate = QueryDef.sql(
    "q_golden_sqlt_win_range_date",
    s"""WITH $testData
       SELECT CAST(val_date AS STRING) AS d, cate,
              CAST(max(val_date) OVER (PARTITION BY cate
                ORDER BY val_date NULLS FIRST
                RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING)
                AS STRING) AS max_d2
       FROM testdata""",
    s"""WITH $testData
       SELECT CAST(val_date AS VARCHAR) AS d, cate,
              CAST(max(val_date) OVER (PARTITION BY cate
                ORDER BY val_date NULLS FIRST
                RANGE BETWEEN CURRENT ROW AND INTERVAL 2 DAYS FOLLOWING)
                AS VARCHAR) AS max_d2
       FROM testdata""")

  /** window.sql:81-113 — the window-function battery over one shared
    * WINDOW clause: ranking family (rank, dense_rank, percent_rank,
    * cume_dist, ntile, row_number), frame aggregates (count, sum, min,
    * max, avg from exact sums), value functions (first_value/last_value
    * with and without IGNORE NULLS), and the stddev/var family from
    * exact windowed moments (see class doc). */
  private def batterySql(fvIn: String, lvIn: String) =
    s"""WITH $testData,
       w AS (
         SELECT val, cate,
                max(val) OVER w AS mx,
                min(val) OVER w AS mn,
                count(val) OVER w AS cnt,
                CAST(sum(val) OVER w AS BIGINT) AS s,
                first_value(val) OVER w AS fv,
                $fvIn OVER w AS fv_in,
                last_value(val) OVER w AS lv,
                $lvIn OVER w AS lv_in,
                rank() OVER w AS rnk,
                dense_rank() OVER w AS drnk,
                cume_dist() OVER w AS cdist,
                percent_rank() OVER w AS prank,
                ntile(2) OVER w AS nt,
                row_number() OVER w AS rn,
                CAST(sum(val) OVER w AS DOUBLE)
                  / CAST(count(val) OVER w AS DOUBLE) AS avg_exact,
                CAST(sum(val * val) OVER w AS DOUBLE) AS s2,
                CAST(sum(val) OVER w AS DOUBLE) AS s1,
                CAST(count(val) OVER w AS DOUBLE) AS n
         FROM testdata
         WINDOW w AS (PARTITION BY cate ORDER BY val NULLS FIRST))
       SELECT val, cate, mx, mn, cnt, s, fv, fv_in, lv, lv_in, rnk, drnk,
              cdist, prank, nt, rn, avg_exact,
              CASE WHEN n > 1 THEN (s2 - s1*s1/n) / n END AS var_pop,
              CASE WHEN n > 1 THEN (s2 - s1*s1/n) / (n - 1.0)
                END AS var_samp,
              CASE WHEN n > 1 THEN sqrt((s2 - s1*s1/n) / (n - 1.0))
                END AS stddev_samp
       FROM w"""

  // IGNORE NULLS placement is the one dialect split in the battery:
  // Spark spells `first_value(x) IGNORE NULLS`, DuckDB `first_value(x
  // IGNORE NULLS)` — same ANSI semantics, two grammars
  val winBattery = QueryDef.sql(
    "q_golden_sqlt_win_battery",
    batterySql("first_value(val) IGNORE NULLS",
      "last_value(val) IGNORE NULLS"),
    batterySql("first_value(val IGNORE NULLS)",
      "last_value(val IGNORE NULLS)"))

  /** window.sql:116-124 — null aggregate input and the empty OVER ()
    * frame. Exclusion: `count(val) FILTER (WHERE ...) OVER (...)` — Spark
    * 4 rejects window aggregates with FILTER outright ("not supported
    * yet"); pinned as an error in GoldenWindowErrorsSpec. */
  val winMisc = QueryDef.sqlSame(
    "q_golden_sqlt_win_misc",
    s"""WITH $testData
       SELECT val, cate,
              CAST(avg(CAST(NULL AS INT)) OVER (PARTITION BY cate
                ORDER BY val NULLS FIRST) AS DOUBLE) AS avg_null,
              CAST(sum(val) OVER () AS BIGINT) AS s_global
       FROM testdata""")

  /** window.sql:152-254 — the nth_value/first_value frame matrix over
    * basic_pays: default frame, RANGE/ROWS UNBOUNDED..CURRENT, the
    * offset RANGE frame (2000 PRECEDING..1000 FOLLOWING), the sliding
    * ROWS frame (2 PRECEDING..2 FOLLOWING), CURRENT..UNBOUNDED, both
    * UNBOUNDED frames, and UNBOUNDED..1 FOLLOWING — eight frame shapes
    * as one wide row set (salary DESC ties broken by name where the
    * reference relies on input order). */
  val winNth = QueryDef.sqlSame(
    "q_golden_sqlt_win_nth",
    s"""WITH $basicPays
       SELECT employee_name, salary,
              first_value(employee_name) OVER w_def AS fv_def,
              nth_value(employee_name, 2) OVER w_def AS nth_def,
              nth_value(employee_name, 2) OVER w_rows_cur AS nth_rows_cur,
              nth_value(employee_name, 2) OVER w_range_off AS nth_range_off,
              nth_value(employee_name, 2) OVER w_rows_2_2 AS nth_rows_22,
              nth_value(employee_name, 2) OVER w_cur_unb AS nth_cur_unb,
              nth_value(employee_name, 2) OVER w_unb_unb AS nth_unb_unb,
              nth_value(employee_name, 2) OVER w_unb_1f AS nth_unb_1f
       FROM basic_pays
       WINDOW
         w_def AS (ORDER BY salary DESC, employee_name),
         w_rows_cur AS (ORDER BY salary DESC, employee_name
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_range_off AS (ORDER BY salary
           RANGE BETWEEN 2000 PRECEDING AND 1000 FOLLOWING),
         w_rows_2_2 AS (ORDER BY salary DESC, employee_name
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),
         w_cur_unb AS (ORDER BY salary DESC, employee_name
           RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
         w_unb_unb AS (ORDER BY salary DESC
           RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
         w_unb_1f AS (ORDER BY salary DESC, employee_name
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING)""")

  /** window.sql:256-264 (dept-partitioned nth_value) — the one frame in
    * the matrix with a PARTITION BY, plus the parenthesized window
    * reference form `OVER (w)` from line 127. */
  val winNthDept = QueryDef.sqlSame(
    "q_golden_sqlt_win_nth_dept",
    s"""WITH $basicPays,
       d AS (
         SELECT employee_name, department, salary,
                first_value(employee_name) OVER w AS highest_salary,
                nth_value(employee_name, 2) OVER w AS second_highest
         FROM basic_pays
         WINDOW w AS (PARTITION BY department ORDER BY salary DESC
           RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       SELECT d.*, CAST(sum(salary) OVER (ww) AS BIGINT) AS run_dept
       FROM d
       WINDOW ww AS (PARTITION BY department ORDER BY salary DESC,
         employee_name)""")

  val all: Seq[QueryDef] = Seq(winRows, winRange, winRangeDate, winBattery,
    winMisc, winNth, winNthDept)
}
