package graft.operators

import graft.QueryDef

/** Edge-semantics golden corpus — the repo's equivalent of the reference's
  * sql-tests golden files (reference: core/src/test/resources/sql-tests/
  * inputs/decimalArithmeticOperations.sql, datetime.sql, operators.sql…,
  * 92 files with expected outputs under results/).
  *
  * Each query is a constant/VALUES statement whose text runs verbatim on
  * both Spark and DuckDB, pinning the semantics corners that silently
  * diverge between engines when unspecified: decimal precision promotion
  * and HALF_UP rounding, month-end clamping in date arithmetic, explicit
  * NULLS FIRST/LAST, negative modulo sign, substring edge indexing, null
  * propagation through || / greatest / try_cast. Statements where the two
  * dialects genuinely disagree (Spark's `concat` ignores-nothing vs
  * DuckDB's ignores-nulls, decimal scale-reduction casts — DuckDB
  * truncates, Spark rounds) are *excluded by design*: this corpus pins the
  * ANSI-portable surface the engine promises, and the exclusions are
  * documented here so the boundary is explicit.
  *
  * Ordering semantics can't be pinned by the sort-normalizing hash compare,
  * so NULLS FIRST/LAST are materialized as `row_number()` values.
  */
object GoldenSql {

  /** Decimal arithmetic: exact promotion (p1+p2+1, s1+s2), division with an
    * explicit result scale, HALF_UP rounding both signs, and a sum at the
    * DECIMAL(18,2) boundary that needs the aggregate's precision headroom. */
  val decimalArith = QueryDef.sqlSame(
    "q_golden_decimal_arith",
    // STRING-cast outputs: the exact digits+scale are the assertion, and a
    // raw decimal degrades to float64 in the compare harness's pandas frame
    """SELECT CAST(CAST(1.10 AS DECIMAL(3,2)) * CAST(2.5 AS DECIMAL(2,1))
                   AS STRING) AS mul_exact,
              CAST(CAST(0.1 AS DECIMAL(5,4)) + CAST(0.2 AS DECIMAL(5,4))
                   AS STRING) AS add_exact,
              CAST(CAST(CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2))
                        AS DECIMAL(10,6)) AS STRING) AS div_round,
              CAST(round(CAST(2.345 AS DECIMAL(5,3)), 2) AS STRING)
                AS half_up_pos,
              CAST(round(CAST(-2.345 AS DECIMAL(5,3)), 2) AS STRING)
                AS half_up_neg""")

  val decimalBoundary = QueryDef.sqlSame(
    "q_golden_decimal_boundary",
    """SELECT CAST(sum(CAST(x AS DECIMAL(18,2))) AS STRING) AS boundary_sum,
              count(*) AS n
       FROM (VALUES (9999999999999999.98), (0.01)) AS t(x)""")

  /** Null ordering pinned via row_number (the hash compare sorts rows, so
    * ORDER BY alone proves nothing); plus null propagation rules. */
  val nullOrder = QueryDef.sqlSame(
    "q_golden_null_order",
    """SELECT x,
              CAST(row_number() OVER (ORDER BY x ASC NULLS FIRST) AS INT)
                AS rn_nulls_first,
              CAST(row_number() OVER (ORDER BY x DESC NULLS LAST) AS INT)
                AS rn_nulls_last
       FROM (VALUES (1), (NULL), (3), (2)) AS t(x)""")

  val nullProp = QueryDef.sqlSame(
    "q_golden_null_prop",
    """SELECT 'a' || CAST(NULL AS STRING) AS cat_null,
              upper(CAST(NULL AS STRING)) AS upper_null,
              greatest(1, NULL, 3) AS greatest_skips,
              least(CAST(NULL AS INT), NULL) AS least_all_null,
              nullif('x', 'x') AS nullif_same,
              coalesce(CAST(NULL AS STRING), NULL, 'z') AS coalesce3,
              try_cast('xyz' AS INT) AS bad_int,
              CAST(try_cast('2021-02-29' AS DATE) AS STRING) AS bad_date""")

  /** Date arithmetic: month-end clamping forward/backward, leap-year
    * clamping, and trunc boundaries (ISO week). Results go through STRING
    * so both engines' date/timestamp carriers compare textually. */
  val datetimeClamp = QueryDef.sqlSame(
    "q_golden_datetime_clamp",
    """SELECT CAST(CAST(DATE '2021-01-31' + INTERVAL 1 MONTH AS DATE)
                   AS STRING) AS month_clamp,
              CAST(CAST(DATE '2020-02-29' + INTERVAL 1 YEAR AS DATE)
                   AS STRING) AS leap_clamp,
              CAST(CAST(DATE '2021-03-31' - INTERVAL 1 MONTH AS DATE)
                   AS STRING) AS month_clamp_back,
              CAST(CAST(date_trunc('month',
                     TIMESTAMP '1999-12-31 23:59:59.999') AS TIMESTAMP)
                   AS STRING) AS trunc_month,
              CAST(CAST(date_trunc('week',
                     TIMESTAMP '2021-01-01 00:00:00') AS TIMESTAMP)
                   AS STRING) AS trunc_week_iso,
              CAST(year(DATE '2000-02-29') AS INT) AS y2k_leap_year,
              CAST(day(DATE '2000-02-29') AS INT) AS y2k_leap_day""")

  val intervalArith = QueryDef.sqlSame(
    "q_golden_interval",
    """SELECT CAST(TIMESTAMP '2021-03-27 23:30:00' + INTERVAL 90 MINUTE
                   AS STRING) AS plus_90min,
              CAST(TIMESTAMP '2021-01-01 00:00:00' - INTERVAL 1 SECOND
                   AS STRING) AS minus_1sec,
              CAST(TIMESTAMP '2000-01-01 00:00:00' + INTERVAL 36 HOUR
                   AS STRING) AS plus_36h""")

  /** Numeric edges: modulo sign follows the dividend, truncating integer
    * division (dialect-split operator: Spark `div`, DuckDB `//`),
    * whitespace-tolerant ANSI casts, floor/ceil/sign/round on doubles. */
  private def numericShared(idivNeg: String, idivPos: String) =
    s"""SELECT (-7) % 3 AS mod_neg_dividend,
              7 % (-3) AS mod_neg_divisor,
              CAST($idivNeg AS BIGINT) AS idiv_neg,
              CAST($idivPos AS BIGINT) AS idiv_pos,
              CAST('  -17  ' AS INT) AS cast_ws,
              CAST(floor(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS floor_neg,
              CAST(ceil(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS ceil_neg,
              CAST(sign(CAST(-2.5 AS DOUBLE)) AS INT) AS sign_neg,
              round(CAST(2.5 AS DOUBLE)) AS round_half_pos,
              round(CAST(-2.5 AS DOUBLE)) AS round_half_neg,
              round(CAST(2.25 AS DOUBLE), 1) AS round_quarter"""

  val numericEdge = QueryDef.sql(
    "q_golden_numeric_edge",
    numericShared("-7 div 2", "7 div 2"),
    numericShared("-7 // 2", "7 // 2"))

  val stringEdge = QueryDef.sqlSame(
    "q_golden_string_edge",
    """SELECT substring('hello', -3, 2) AS sub_from_end,
              substring('hello', 3, 99) AS sub_overrun,
              substring('hello', 2) AS sub_tail,
              ('a' < 'B') AS binary_cmp,
              ('' < 'a') AS empty_lt,
              CAST(length('') AS INT) AS len_empty,
              trim('  pad  ') AS trim_both,
              replace('aaa', 'aa', 'b') AS replace_greedy""")

  /** Aggregate null semantics: nulls are skipped (not zeroed) by sum/avg,
    * count(col) vs count(*), the all-null column aggregates to NULL, and
    * the standard FILTER clause gates input rows. */
  val aggNull = QueryDef.sqlSame(
    "q_golden_agg_null",
    """SELECT count(*) AS n_rows,
              count(x) AS n_nonnull,
              CAST(sum(x) AS BIGINT) AS sum_skips_null,
              CAST(avg(x) AS DOUBLE) AS avg_skips_null,
              CAST(min(x) AS INT) AS min_x,
              count(y) AS n_all_null,
              CAST(sum(y) AS BIGINT) AS sum_all_null,
              count(*) FILTER (WHERE x > 1) AS n_filtered
       FROM (VALUES (1, CAST(NULL AS INT)),
                    (CAST(NULL AS INT), CAST(NULL AS INT)),
                    (3, CAST(NULL AS INT))) AS t(x, y)""")

  /** Three-valued IN / NOT IN logic: a NULL in the list makes a miss
    * UNKNOWN (never TRUE), NOT IN against a set containing NULL filters
    * everything, and DISTINCT collapses NULLs to one group. */
  val inNull = QueryDef.sqlSame(
    "q_golden_in_null",
    """SELECT (1 IN (1, NULL)) AS in_hit_with_null,
              ((1 IN (2, NULL)) IS NULL) AS in_miss_unknown,
              ((1 NOT IN (2, NULL)) IS NULL) AS notin_unknown,
              ((NULL = NULL) IS NULL) AS eq_null_unknown,
              (SELECT count(*)
               FROM (VALUES (1), (2)) AS s(v)
               WHERE v NOT IN (SELECT w FROM (VALUES (2), (CAST(NULL AS INT)))
                               AS u(w))) AS notin_null_set_empty,
              (SELECT count(*)
               FROM (SELECT DISTINCT z
                     FROM (VALUES (CAST(NULL AS INT)), (CAST(NULL AS INT)),
                                  (1)) AS d(z)) dz) AS distinct_null_one""")

  /** Set-operation type widening (INT ∪ BIGINT → BIGINT) and NULL as a
    * grouping key: the null row groups, it does not disappear. */
  val unionWiden = QueryDef.sqlSame(
    "q_golden_union_widen",
    """SELECT CAST(x AS BIGINT) AS x, count(*) AS n
       FROM (SELECT CAST(1 AS INT) AS x
             UNION ALL SELECT CAST(1 AS BIGINT)
             UNION ALL SELECT CAST(NULL AS INT)
             UNION ALL SELECT CAST(2147483648 AS BIGINT)) u
       GROUP BY x""")

  /** Date difference / epoch / calendar functions — a dialect-split pair
    * (Spark `datediff(end, start)` vs DuckDB `datediff('day', start, end)`;
    * Spark `dayofweek` is 1=Sunday while DuckDB's is 0=Sunday): same
    * values, different spellings, pinned via QueryDef.sql. */
  val dateDiff = QueryDef.sql(
    "q_golden_datediff",
    """SELECT CAST(datediff(DATE '2021-03-01', DATE '2021-01-30') AS INT)
                AS days_diff,
              CAST(unix_timestamp(TIMESTAMP '2021-01-01 00:00:00') AS BIGINT)
                AS epoch_s,
              CAST(last_day(DATE '2021-02-10') AS STRING) AS eom_feb,
              CAST(DATE '2021-12-31' + 1 AS STRING) AS next_day,
              CAST(dayofweek(DATE '2021-01-04') AS INT) AS dow_mon,
              CAST(weekofyear(DATE '2021-01-04') AS INT) AS iso_week""",
    """SELECT CAST(datediff('day', DATE '2021-01-30', DATE '2021-03-01')
                   AS INT) AS days_diff,
              CAST(epoch(TIMESTAMP '2021-01-01 00:00:00') AS BIGINT)
                AS epoch_s,
              CAST(last_day(DATE '2021-02-10') AS STRING) AS eom_feb,
              CAST(DATE '2021-12-31' + 1 AS STRING) AS next_day,
              CAST(dayofweek(DATE '2021-01-04') + 1 AS INT) AS dow_mon,
              CAST(weekofyear(DATE '2021-01-04') AS INT) AS iso_week""")

  /** Overflowing casts under try_cast: every narrowing that exceeds the
    * target range is NULL, never a wrapped/saturated value, on both
    * engines. (Excluded: decimal-string → INT, where DuckDB rounds '12.5'
    * to 13 and Spark nulls it — a real divergence, not worth pinning.) */
  val tryOverflow = QueryDef.sqlSame(
    "q_golden_try_overflow",
    """SELECT try_cast(3000000000 AS INTEGER) AS int_overflow,
              try_cast(40000 AS SMALLINT) AS smallint_overflow,
              try_cast(200 AS TINYINT) AS tinyint_overflow,
              try_cast(2147483647 AS INTEGER) AS int_max_ok,
              try_cast('-129' AS TINYINT) AS tinyint_under,
              try_cast('127' AS TINYINT) AS tinyint_max_ok""")

  /** CASE evaluation: a NULL condition is skipped (not an error), the
    * simple form matches by equality so a NULL operand never matches
    * (three-valued =), and a CASE with no ELSE and no hit yields NULL. */
  val caseWhen = QueryDef.sqlSame(
    "q_golden_case_when",
    """SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'null-cond'
                   WHEN 1 = 1 THEN 'first-true' ELSE 'else' END
                AS searched_skips_null,
              CASE 2 WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'other' END
                AS simple_match,
              CASE CAST(NULL AS INT) WHEN NULL THEN 'null-eq'
                   ELSE 'no-match' END AS null_never_matches,
              CASE WHEN 1 = 2 THEN 'x' END AS no_else_null,
              coalesce(CASE WHEN 1 = 2 THEN 1 END, -1) AS coalesce_case""")

  /** ROWS vs RANGE framing: RANGE includes ALL peers of the current order
    * value (the duplicate k=2 rows share one range_cum), ROWS counts
    * physical rows (fully tiebroken so peer order is deterministic), and
    * numeric RANGE offsets form value windows, not row windows. */
  val windowFrames = QueryDef.sqlSame(
    "q_golden_window_frames",
    """SELECT k, v,
              CAST(sum(v) OVER (ORDER BY k, v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS rows_cum,
              CAST(sum(v) OVER (ORDER BY k
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS range_cum,
              CAST(sum(v) OVER (ORDER BY k, v
                ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
                AS rows_win,
              CAST(sum(v) OVER (ORDER BY k
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
                AS range_win
       FROM (VALUES (1, 10), (2, 20), (2, 200), (3, 30), (5, 50))
         AS t(k, v)""")

  /** LIKE semantics: ESCAPE with a non-backslash escape char (backslash
    * literal processing differs between the dialects' string parsers, so a
    * portable pin must choose its own), wildcard vs literal `_`/`%`, and
    * case sensitivity. Booleans come out as 1/0 ints to sidestep carrier
    * differences. */
  val likeEscape = QueryDef.sqlSame(
    "q_golden_like_escape",
    """SELECT CASE WHEN 'a_c' LIKE 'a!_c' ESCAPE '!' THEN 1 ELSE 0 END
                AS esc_lit_underscore,
              CASE WHEN 'abc' LIKE 'a!_c' ESCAPE '!' THEN 1 ELSE 0 END
                AS esc_not_wild,
              CASE WHEN 'abc' LIKE 'a_c' THEN 1 ELSE 0 END
                AS plain_underscore,
              CASE WHEN '50%' LIKE '50!%' ESCAPE '!' THEN 1 ELSE 0 END
                AS esc_percent,
              CASE WHEN 'ABC' LIKE 'abc' THEN 1 ELSE 0 END AS case_sens,
              CASE WHEN 'abc' LIKE '%b%' THEN 1 ELSE 0 END AS infix""")

  /** Standard-form string functions: TRIM(BOTH/LEADING/TRAILING ... FROM),
    * pad truncation and fill, POSITION(IN), character (not byte) length of
    * non-ASCII. */
  val stringFns = QueryDef.sqlSame(
    "q_golden_string_fns",
    """SELECT trim(BOTH 'x' FROM 'xxhixx') AS trim_both,
              trim(LEADING 'x' FROM 'xxhixx') AS trim_lead,
              trim(TRAILING 'x' FROM 'xxhixx') AS trim_trail,
              lpad('abc', 2, '*') AS lpad_trunc,
              rpad('ab', 5, '*') AS rpad_fill,
              repeat('ab', 3) AS rep3,
              reverse('abc') AS rev,
              replace('banana', 'an', 'AN') AS repl,
              CAST(position('b' IN 'abcb') AS INT) AS pos_first,
              left('abcdef', 3) AS left3,
              right('abcdef', 2) AS right2,
              CAST(length('héllo') AS INT) AS char_len""")

  /** Three-valued logic truth table + IS [NOT] DISTINCT FROM (the
    * null-safe comparators). */
  val boolLogic = QueryDef.sqlSame(
    "q_golden_bool_logic",
    """SELECT CAST(TRUE AND CAST(NULL AS BOOLEAN) AS STRING) AS t_and_n,
              CAST(FALSE AND CAST(NULL AS BOOLEAN) AS STRING) AS f_and_n,
              CAST(TRUE OR CAST(NULL AS BOOLEAN) AS STRING) AS t_or_n,
              CAST(FALSE OR CAST(NULL AS BOOLEAN) AS STRING) AS f_or_n,
              CAST(NOT CAST(NULL AS BOOLEAN) AS STRING) AS not_n,
              CAST(NULL = NULL AS STRING) AS eq_nn,
              CAST(NULL IS DISTINCT FROM NULL AS STRING) AS distinct_nn,
              CAST(1 IS DISTINCT FROM CAST(NULL AS INT) AS STRING)
                AS distinct_1n,
              CAST(1 IS NOT DISTINCT FROM 1 AS STRING) AS notdistinct_11""")

  /** Aggregate FILTER clauses and DISTINCT aggregates: an all-filtered
    * aggregate is NULL (not 0), DISTINCT collapses before summing. */
  val aggFilter = QueryDef.sqlSame(
    "q_golden_agg_filter",
    """SELECT k,
              count(*) AS n_all,
              count(*) FILTER (WHERE v > 10) AS n_big,
              CAST(sum(v) FILTER (WHERE v % 2 = 0) AS BIGINT) AS sum_even,
              CAST(sum(v) FILTER (WHERE 1 = 2) AS BIGINT) AS sum_none,
              CAST(sum(DISTINCT v) AS BIGINT) AS sum_distinct,
              CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
       FROM (VALUES (1, 10), (1, 20), (1, 20), (2, 5)) AS t(k, v)
       GROUP BY k""")

  /** date_trunc boundaries (ISO week → Monday, quarter, month from a
    * timestamp) + EXTRACT fields + last_day. */
  val dateTrunc = QueryDef.sqlSame(
    "q_golden_date_trunc",
    """SELECT CAST(CAST(date_trunc('week', DATE '2021-06-17') AS DATE)
                   AS STRING) AS trunc_week,
              CAST(CAST(date_trunc('quarter', DATE '2021-05-20') AS DATE)
                   AS STRING) AS trunc_quarter,
              CAST(CAST(date_trunc('month', TIMESTAMP '2021-05-20 13:14:15')
                        AS DATE) AS STRING) AS trunc_month_ts,
              CAST(extract(QUARTER FROM DATE '2021-11-03') AS INT) AS q4,
              CAST(extract(HOUR FROM TIMESTAMP '2021-05-20 13:14:15') AS INT)
                AS hr,
              CAST(last_day(DATE '2021-02-10') AS STRING) AS feb_last""")

  /** IGNORE NULLS window navigation: forward fill via first/last_value
    * with null gaps — pins the gap semantics (leading nulls stay null on
    * forward fill). Spark spells the clause AFTER the call
    * (`first_value(v) IGNORE NULLS`), DuckDB INSIDE it
    * (`first_value(v IGNORE NULLS)`) — same ANSI semantics, split text. */
  val ignoreNulls = {
    def text(fn: String => String) =
      s"""SELECT k,
              ${fn("first_value")} OVER
                (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS first_seen,
              ${fn("last_value")} OVER
                (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS ffill
         FROM (VALUES (1, CAST(NULL AS INT)), (2, 10), (3, NULL),
                      (4, 20), (5, NULL)) AS t(k, v)"""
    QueryDef.sql(
      "q_golden_ignore_nulls",
      text(f => s"$f(v) IGNORE NULLS"),
      text(f => s"$f(v IGNORE NULLS)"))
  }

  /** greatest/least null handling: both dialects skip NULL arguments
    * (Postgres semantics) and return NULL only when every argument is
    * NULL — a classic cross-engine divergence point worth pinning. */
  val greatestLeast = QueryDef.sqlSame(
    "q_golden_greatest_least",
    """SELECT CAST(greatest(x, y, 5) AS BIGINT) AS g,
              CAST(least(x, y, 5) AS BIGINT) AS l,
              CAST(greatest(x, y) AS BIGINT) AS g2
       FROM (VALUES (1, CAST(NULL AS INT)), (CAST(NULL AS INT), 7),
                    (CAST(NULL AS INT), CAST(NULL AS INT)), (9, 2))
         AS t(x, y)""")

  /** LIMIT/OFFSET paging over a total order — the page is well-defined
    * only with a tie-free ORDER BY; pins that both engines agree on the
    * page boundary rows. */
  val limitOffset = QueryDef.sqlSame(
    "q_golden_limit_offset",
    """SELECT o_orderkey, o_orderstatus
       FROM orders ORDER BY o_orderkey LIMIT 7 OFFSET 13""")

  /** Quantifier semantics over EMPTY relations: EXISTS () is false,
    * NOT IN (empty) is TRUE (three-valued logic has no rows to poison),
    * scalar subquery over empty is NULL. */
  val emptyQuantifiers = QueryDef.sqlSame(
    "q_golden_empty_quantifiers",
    """SELECT
         CAST(EXISTS (SELECT 1 FROM orders WHERE 1 = 0) AS INT) AS ex,
         CAST(1 NOT IN (SELECT o_orderkey FROM orders WHERE 1 = 0) AS INT)
           AS ni,
         coalesce((SELECT max(o_orderkey) FROM orders WHERE 1 = 0), -1)
           AS scal""")

  /** String concatenation null propagation via the ANSI `||` operator —
    * BOTH engines null-propagate `||` (unlike concat(), where the dialects
    * diverge: Spark nulls, DuckDB skips — which is exactly why the
    * portable pin uses the operator). */
  val concatNull = QueryDef.sqlSame(
    "q_golden_concat_null",
    """SELECT coalesce('a' || CAST(NULL AS VARCHAR(8)), '<null>') AS pipe_null,
              'a' || 'b' || 'c' AS pipe_chain,
              coalesce(CAST(NULL AS VARCHAR(8)) || 'x', '<null>') AS null_first""")

  /** Recursive CTE — series generation (cte.sql's WITH RECURSIVE rows;
    * Spark 4 and DuckDB both run the ANSI form verbatim): a linear counter
    * and a running product (factorial) in one recursion, pinned exactly. */
  val recursiveCte = QueryDef.sqlSame(
    "q_golden_recursive_cte",
    """WITH RECURSIVE t(n, fact) AS (
         SELECT 1, CAST(1 AS BIGINT)
         UNION ALL
         SELECT n + 1, fact * (n + 1) FROM t WHERE n < 10)
       SELECT n, fact FROM t""")

  /** Recursive CTE over a CYCLIC graph — depth-bounded UNION ALL
    * termination (Spark 4 rejects UNION distinct inside a recursive CTE,
    * so the cycle is cut by a hop counter >= the graph diameter):
    * min-reachable-label per node on a VALUES edge list containing a cycle
    * and a disconnected pair (the connected-components shape the curation
    * pipeline's oracle uses, pinned here as a first-class golden). */
  val recursiveGraph = QueryDef.sqlSame(
    "q_golden_recursive_graph",
    """WITH RECURSIVE
       edges(s, d) AS (
         SELECT * FROM (VALUES (1, 2), (2, 3), (3, 1), (4, 5)) AS e(s, d)),
       undirected(s, d) AS (
         SELECT s, d FROM edges UNION SELECT d, s FROM edges),
       reach(node, lbl, depth) AS (
         SELECT s, s, 0 FROM undirected
         UNION ALL
         SELECT u.d, reach.lbl, depth + 1 FROM reach JOIN undirected u
           ON reach.node = u.s
         WHERE depth < 3)
       SELECT node, min(lbl) AS component
       FROM reach GROUP BY node""")

  /** A NULL data value vs the Expand-generated subtotal NULL — only
    * grouping() can tell them apart (grouping_set.sql's core trap): the
    * input contains a real NULL key, and the rollup emits subtotal rows
    * with the same NULL in that column. */
  val groupingNullVsSubtotal = QueryDef.sqlSame(
    "q_golden_grouping_null_subtotal",
    """SELECT k, CAST(grouping(k) AS INT) AS is_subtotal,
              CAST(sum(v) AS BIGINT) AS s, count(*) AS n
       FROM (VALUES ('a', 1), (NULL, 2), ('a', 4), (NULL, 8)) AS t(k, v)
       GROUP BY ROLLUP (k)""")

  /** Set-op NULL equality and bag multiplicity (except-all.sql /
    * intersect-all.sql): set operations treat NULL = NULL (unlike joins),
    * INTERSECT ALL keeps min(multiplicity), EXCEPT ALL subtracts
    * occurrences. Pinned via a count-per-value summary of each op. */
  val setopNullDup = QueryDef.sqlSame(
    "q_golden_setop_null_dup",
    """WITH a(x) AS (SELECT * FROM (VALUES (1), (1), (1), (2), (NULL),
                                           (NULL)) AS v(x)),
            b(x) AS (SELECT * FROM (VALUES (1), (1), (3), (NULL)) AS v(x))
       SELECT 'intersect_all' AS op, coalesce(x, -99) AS val, count(*) AS n
       FROM (SELECT x FROM a INTERSECT ALL SELECT x FROM b) GROUP BY x
       UNION ALL
       SELECT 'except_all', coalesce(x, -99), count(*)
       FROM (SELECT x FROM a EXCEPT ALL SELECT x FROM b) GROUP BY x
       UNION ALL
       SELECT 'intersect_distinct', coalesce(x, -99), count(*)
       FROM (SELECT x FROM a INTERSECT SELECT x FROM b) GROUP BY x""")

  /** EXTRACT field battery over literal timestamps (extract.sql) — the
    * dialect-portable fields only (DOW is excluded: Spark counts Sunday=1,
    * DuckDB Sunday=0; WEEK/DOY are ISO in both and pinned mid-year where
    * the numbering agrees). Seconds cast to INT: Spark's EXTRACT(SECOND)
    * is DECIMAL(8,6), DuckDB's is int. */
  val extractFields = QueryDef.sqlSame(
    "q_golden_extract",
    """SELECT CAST(EXTRACT(YEAR FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS yr,
              CAST(EXTRACT(QUARTER FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS qtr,
              CAST(EXTRACT(MONTH FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS mon,
              CAST(EXTRACT(DAY FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS dom,
              CAST(EXTRACT(DOY FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS doy,
              CAST(EXTRACT(WEEK FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS wk,
              CAST(EXTRACT(HOUR FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS hh,
              CAST(EXTRACT(MINUTE FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS mi,
              CAST(EXTRACT(SECOND FROM TIMESTAMP '1996-07-09 13:05:47')
                   AS INT) AS ss""")

  /** Format-string datetime parsing (datetime-parsing.sql) — the one
    * family where the dialects CANNOT share text (Spark takes Java
    * patterns, DuckDB strptime %-codes), so the QueryDef carries both
    * spellings against the same pinned output: leap-day parse, 2-digit
    * year widening, and a round-trip through format-then-parse.
    * (Two-digit-year parsing is EXCLUDED by design: Java's yy pivots into
    * 2000-2099 while strptime's %y pivots at 69 — a genuine divergence.) */
  val datetimeParse = QueryDef.sql(
    "q_golden_datetime_parse",
    """SELECT CAST(to_timestamp('2024-02-29 13:05',
                                'yyyy-MM-dd HH:mm') AS STRING) AS leap_day,
              CAST(to_timestamp('1996-07-09 05:03:01',
                                'yyyy-MM-dd HH:mm:ss') AS STRING) AS full_ts,
              date_format(DATE '1997-03-15', 'yyyy|MM|dd') AS fmt_out,
              CAST(to_date(date_format(DATE '1997-03-15', 'yyyy|MM|dd'),
                           'yyyy|MM|dd') AS STRING) AS round_trip""",
    """SELECT CAST(strptime('2024-02-29 13:05',
                            '%Y-%m-%d %H:%M') AS STRING) AS leap_day,
              CAST(strptime('1996-07-09 05:03:01',
                              '%Y-%m-%d %H:%M:%S') AS STRING) AS full_ts,
              strftime(DATE '1997-03-15', '%Y|%m|%d') AS fmt_out,
              CAST(CAST(strptime(strftime(DATE '1997-03-15', '%Y|%m|%d'),
                                 '%Y|%m|%d') AS DATE) AS STRING)
                AS round_trip""")

  /** Decimal overflow rows (decimalArithmeticOperations.sql): TRY_CAST
    * beyond precision nulls in BOTH engines (the ANSI-safe probe of the
    * overflow boundary), exact fit at the boundary survives, and the
    * 38-digit product precision cap is probed through a try_cast of an
    * in-range product. */
  val decimalOverflow = QueryDef.sqlSame(
    "q_golden_decimal_overflow",
    """SELECT CAST(TRY_CAST(12345.678 AS DECIMAL(5,2)) AS STRING)
                AS overflow_null,
              CAST(TRY_CAST(999.99 AS DECIMAL(5,2)) AS STRING)
                AS boundary_fit,
              CAST(TRY_CAST(-12345.678 AS DECIMAL(5,2)) AS STRING)
                AS overflow_neg,
              CAST(TRY_CAST(CAST(9999.99 AS DECIMAL(18,2))
                            * CAST(9999.99 AS DECIMAL(18,2))
                            AS DECIMAL(22,4)) AS STRING) AS product_fit""")

  /** GROUP BY / ORDER BY ordinals (group-by-ordinal.sql) — positional
    * references resolve to the select list in both dialects; the ordinal
    * ORDER BY is made observable through LIMIT (inside an OVER clause an
    * ordinal is a constant, not a position — both dialects agree, so that
    * spelling pins nothing). */
  val ordinals = QueryDef.sqlSame(
    "q_golden_ordinal",
    """SELECT k, parity, n, s
       FROM (SELECT x % 2 AS k, x % 3 AS parity, count(*) AS n,
                    CAST(sum(x) AS BIGINT) AS s
             FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS t(x)
             GROUP BY 1, 2)
       ORDER BY 4 DESC, 1, 2 LIMIT 3""")

  /** USING-join key coalescing (using-join.sql / natural-join.sql): with
    * FULL JOIN ... USING(k), the bare `k` is the COALESCE of both sides —
    * ANSI semantics both dialects implement; the pin includes a
    * matched row, a left-only row, and a right-only row. */
  val usingJoin = QueryDef.sqlSame(
    "q_golden_using_join",
    """SELECT k, coalesce(av, -1) AS av, coalesce(bv, -1) AS bv
       FROM (SELECT k, a.v AS av, b.v AS bv
             FROM (VALUES (1, 10), (2, 20)) AS a(k, v)
             FULL JOIN (VALUES (2, 200), (3, 300)) AS b(k, v)
               USING (k))""")

  /** Higher-order-function edges (higher-order-functions.sql): empty-array
    * transform/filter, exists over empty (false) and over NULL input
    * (NULL). Dialects name the functions differently, so the QueryDef
    * carries both spellings. */
  val hofEdges = QueryDef.sql(
    "q_golden_hof_edges",
    """SELECT size(transform(array(), x -> x)) AS empty_transform,
              size(filter(array(1, 2, 3), x -> x > 10)) AS filtered_to_empty,
              CAST(exists(array(1, 2, 3), x -> x > 2) AS INT) AS exists_true,
              CAST(exists(CAST(array() AS ARRAY<INT>), x -> x > 2) AS INT)
                AS exists_empty,
              CAST(exists(CAST(NULL AS ARRAY<INT>), x -> x > 2) AS INT)
                AS exists_null,
              aggregate(array(1, 2, 3, 4), 0, (acc, x) -> acc + x)
                AS fold_sum""",
    """SELECT len(list_transform([], x -> x)) AS empty_transform,
              len(list_filter([1, 2, 3], x -> x > 10)) AS filtered_to_empty,
              CAST(len(list_filter([1, 2, 3], x -> x > 2)) > 0 AS INT)
                AS exists_true,
              CAST(len(list_filter(CAST([] AS INT[]), x -> x > 2)) > 0
                   AS INT) AS exists_empty,
              CAST(len(list_filter(CAST(NULL AS INT[]), x -> x > 2)) > 0
                   AS INT) AS exists_null,
              list_reduce([0, 1, 2, 3, 4], (acc, x) -> acc + x)
                AS fold_sum""")

  /** Struct construction + field access (struct.sql): dotted access off a
    * literal struct, struct in a column with per-row field extraction —
    * paired spellings (named_struct vs struct_pack). */
  val structAccess = QueryDef.sql(
    "q_golden_struct",
    """SELECT named_struct('a', 1, 'b', 'x').a AS lit_field,
              s.b AS row_field, s.a + 1 AS row_arith
       FROM (SELECT named_struct('a', v, 'b', concat('v', CAST(v AS STRING)))
               AS s
             FROM (VALUES (1), (2), (3)) AS t(v))""",
    """SELECT struct_pack(a := 1, b := 'x').a AS lit_field,
              s.b AS row_field, s.a + 1 AS row_arith
       FROM (SELECT struct_pack(a := v, b := 'v' || CAST(v AS VARCHAR))
               AS s
             FROM (VALUES (1), (2), (3)) AS t(v))""")

  /** Map construction + key access (map.sql): hit, miss (NULL — Spark
    * try_element_at vs DuckDB's list-returning extraction indexed to a
    * scalar), and cardinality. Paired spellings: the dialects' map
    * literals and extraction forms differ. */
  val mapAccess = QueryDef.sql(
    "q_golden_map",
    """SELECT try_element_at(map('a', 1, 'b', 2), 'a') AS hit,
              try_element_at(map('a', 1, 'b', 2), 'zz') AS miss,
              size(map('a', 1, 'b', 2)) AS n,
              array_join(array_sort(map_keys(map('a', 1, 'b', 2))), ',')
                AS keys_csv""",
    """SELECT (MAP {'a': 1, 'b': 2})['a'][1] AS hit,
              (MAP {'a': 1, 'b': 2})['zz'][1] AS miss,
              CAST(cardinality(MAP {'a': 1, 'b': 2}) AS INT) AS n,
              array_to_string(list_sort(map_keys(MAP {'a': 1, 'b': 2})), ',')
                AS keys_csv""")

  /** nth_value across frame shapes (window.sql): the full-frame form sees
    * the whole partition from every row; the default ORDER BY frame
    * (RANGE UNBOUNDED PRECEDING..CURRENT ROW) yields NULL until the nth
    * row arrives — both pinned per-row via the ordering key. */
  val nthValue = QueryDef.sqlSame(
    "q_golden_nth_value",
    """SELECT x,
              nth_value(x, 2) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING) AS nth_full,
              nth_value(x, 2) OVER (ORDER BY x) AS nth_running
       FROM (VALUES (30), (10), (20), (40)) AS t(x)""")

  /** Regex backreference replacement — the dialects spell group references
    * differently (Java's $n vs RE2-style \\n), so the QueryDef carries both
    * spellings; plus shared-syntax anchors, greedy-vs-lazy quantifiers, and
    * group extraction (same function name in both). */
  val regexBackref = QueryDef.sql(
    "q_golden_regex_backref",
    """SELECT regexp_replace('ab12cd34', '([a-z]+)([0-9]+)', '$2$1')
                AS swapped,
              regexp_extract('key=value', '([a-z]+)=([a-z]+)', 2) AS grp2,
              regexp_replace('aaa', '^a', 'X') AS anchored,
              regexp_extract('aab', 'a+?', 0) AS lazy_one,
              regexp_extract('aab', 'a+', 0) AS greedy_all""",
    """SELECT regexp_replace('ab12cd34', '([a-z]+)([0-9]+)', '\2\1', 'g')
                AS swapped,
              regexp_extract('key=value', '([a-z]+)=([a-z]+)', 2) AS grp2,
              regexp_replace('aaa', '^a', 'X') AS anchored,
              regexp_extract('aab', 'a+?', 0) AS lazy_one,
              regexp_extract('aab', 'a+', 0) AS greedy_all""")

  /** ANSI TRIM forms + lpad/rpad with multi-char pads and truncation —
    * identical text in both dialects (the ANSI TRIM(BOTH x FROM y)
    * spelling is the portable one; bare trim(a, b) flips argument order
    * between engines and is excluded by design). */
  val padTrim = QueryDef.sqlSame(
    "q_golden_pad_trim",
    """SELECT TRIM(BOTH 'x' FROM 'xxhixx') AS trim_both,
              TRIM(LEADING 'x' FROM 'xxhixx') AS trim_lead,
              TRIM(TRAILING 'x' FROM 'xxhixx') AS trim_trail,
              lpad('7', 5, 'ab') AS lpad_multi,
              rpad('7', 5, 'ab') AS rpad_multi,
              lpad('longvalue', 4, '0') AS lpad_trunc""")

  /** Edit distance — identical `levenshtein` in both dialects (reference
    * corpus: string-functions.sql). The table case scalar-counts near
    * matches against a live dimension column so the function is pinned on
    * real data, not just literals. */
  val levenshteinFns = QueryDef.sqlSame(
    "q_golden_levenshtein",
    """SELECT CAST(levenshtein('kitten', 'sitting') AS INT) AS d_classic,
              CAST(levenshtein('', 'abc') AS INT) AS d_empty,
              CAST(levenshtein('abc', 'abc') AS INT) AS d_same,
              CAST(levenshtein('flaw', 'lawn') AS INT) AS d_overlap,
              CAST((SELECT count(*) FROM part
                    WHERE levenshtein(p_type, 'PROMO') <= 3) AS BIGINT)
                AS n_close""")

  /** split_part / instr / position edges: out-of-range part yields the
    * EMPTY STRING (not NULL), misses yield 0 (reference corpus:
    * string-functions.sql). */
  val splitPart = QueryDef.sqlSame(
    "q_golden_split_part",
    """SELECT split_part('a,b,c', ',', 2) AS p_mid,
              split_part('a,b,c', ',', 9) AS p_oob,
              split_part('one|two', '|', 1) AS p_first,
              CAST(instr('hello', 'll') AS INT) AS pos_hit,
              CAST(instr('hello', 'zz') AS INT) AS pos_miss,
              CAST(position('ll' IN 'hello') AS INT) AS pos_kw""")

  /** translate's DELETION rule (a match with no counterpart in the
    * replacement alphabet is dropped, Oracle-style), repeat/reverse,
    * chr/ascii round-trip, and printf zero-padding — all identical text
    * in both dialects. */
  val translateFmt = QueryDef.sqlSame(
    "q_golden_translate_fmt",
    """SELECT translate('abcba', 'abc', 'xyz') AS tr_full,
              translate('abcba', 'abc', 'x') AS tr_delete,
              repeat('ab', 3) AS rep,
              reverse('graft') AS rev,
              chr(97) AS c97,
              CAST(ascii('a') AS INT) AS a97,
              printf('%05d|%s', 42, 'x') AS fmt""")

  /** hex() of 64-bit two's complement (negatives print as 16 Fs, zero as a
    * single 0 — no leading-zero padding), bit_count over the full word,
    * and the shared &,| operators (^ is EXCLUDED by design: power in
    * DuckDB, xor in Spark). */
  val hexBits = QueryDef.sqlSame(
    "q_golden_hex_bits",
    """SELECT hex(CAST(255 AS BIGINT)) AS h_ff,
              hex(CAST(0 AS BIGINT)) AS h_zero,
              hex(CAST(-1 AS BIGINT)) AS h_neg,
              CAST(bit_count(CAST(1023 AS BIGINT)) AS INT) AS bc_1023,
              CAST(bit_count(CAST(-1 AS BIGINT)) AS INT) AS bc_neg,
              CAST(5 & 3 AS INT) AS b_and,
              CAST(5 | 3 AS INT) AS b_or""")

  /** Integer series generation incl. a NEGATIVE step — Spark
    * explode(sequence()) vs DuckDB unnest(generate_series()); both are
    * inclusive of the endpoint. */
  val seriesGen = QueryDef.sql(
    "q_golden_series",
    """SELECT CAST(x AS INT) AS x, CAST(x * x AS INT) AS sq
       FROM (SELECT explode(sequence(1, 6)) AS x)
       UNION ALL
       SELECT CAST(x AS INT), CAST(x * x AS INT)
       FROM (SELECT explode(sequence(10, 1, -3)) AS x)""",
    """SELECT CAST(x AS INT) AS x, CAST(x * x AS INT) AS sq
       FROM (SELECT unnest(generate_series(1, 6)) AS x)
       UNION ALL
       SELECT CAST(x AS INT), CAST(x * x AS INT)
       FROM (SELECT unnest(generate_series(10, 1, -3)) AS x)""")

  /** Ordinal-tagged explode — Spark posexplode (0-based pos) vs the DuckDB
    * emulation via a correlated generate_series lateral (1-based, shifted
    * to match). Pins that element order is the string's token order. */
  val posExplode = QueryDef.sql(
    "q_golden_posexplode",
    """SELECT CAST(pos AS INT) AS pos, word
       FROM (SELECT split('the quick brown fox', ' ') AS ws)
       LATERAL VIEW posexplode(ws) AS pos, word""",
    """SELECT CAST(u.i - 1 AS INT) AS pos, t.ws[u.i] AS word
       FROM (SELECT string_split('the quick brown fox', ' ') AS ws) t,
            unnest(generate_series(1, len(t.ws))) AS u(i)""")

  /** Array slicing and negative indexing — Spark slice(a, start, len) /
    * element_at(a, -1) vs DuckDB's inclusive a[from:to] / a[-1]; CSV-joined
    * because raw arrays break the compare harness's hashing. */
  val arraySlice = QueryDef.sql(
    "q_golden_array_slice",
    """SELECT array_join(slice(array(1, 2, 3, 4, 5), 2, 3), ',') AS mid3,
              CAST(element_at(array(1, 2, 3), -1) AS INT) AS last_elem,
              CAST(size(array(1, 2, 3)) AS INT) AS n""",
    """SELECT array_to_string(([1, 2, 3, 4, 5])[2:4], ',') AS mid3,
              CAST(([1, 2, 3])[-1] AS INT) AS last_elem,
              CAST(len([1, 2, 3]) AS INT) AS n""")

  /** regexp_extract_all with EXPLICIT group index (the defaults diverge:
    * Spark group 1, DuckDB group 0 — pinned here by always passing it). */
  val regexExtractAll = QueryDef.sql(
    "q_golden_regex_extract_all",
    """SELECT array_join(regexp_extract_all('a1b22c333', '[0-9]+', 0), '|')
                AS runs,
              array_join(regexp_extract_all('a1b2c3', '([a-z])[0-9]', 1), '|')
                AS letters""",
    """SELECT array_to_string(regexp_extract_all('a1b22c333', '[0-9]+', 0), '|')
                AS runs,
              array_to_string(regexp_extract_all('a1b2c3', '([a-z])[0-9]', 1), '|')
                AS letters""")


  /** GROUP BY ALL — both engines infer the grouping set from the
    * non-aggregate select-list entries, including a computed key. */
  lazy val groupByAll = QueryDef.sqlSame(
    "q_golden_group_by_all",
    """SELECT CAST(x % 2 AS INT) AS par, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS s
       FROM (VALUES (1), (2), (3), (4), (5)) AS t(x)
       GROUP BY ALL""")

  /** Boolean aggregates: bool_and / bool_or over mixed and null inputs
    * (nulls are IGNORED, not false), plus count_if. */
  lazy val boolAgg = QueryDef.sqlSame(
    "q_golden_bool_agg",
    """SELECT g,
              bool_and(v > 0) AS all_pos,
              bool_or(v > 3) AS any_big,
              CAST(count_if(v > 1) AS BIGINT) AS n_gt1
       FROM (VALUES ('a', 1), ('a', 2), ('a', NULL),
                    ('b', -1), ('b', 4)) AS t(g, v)
       GROUP BY g""")

  /** median (exact, interpolated at even counts) and mode (pinned with a
    * UNIQUE mode — tie-breaking is engine-defined and excluded by design). */
  lazy val medianMode = QueryDef.sqlSame(
    "q_golden_median_mode",
    """SELECT CAST(median(x) AS DOUBLE) AS med_even,
              (SELECT CAST(median(y) AS DOUBLE)
               FROM (VALUES (1), (2), (30)) AS o(y)) AS med_odd,
              (SELECT CAST(mode(z) AS INT)
               FROM (VALUES (1), (2), (2), (3)) AS m(z)) AS uniq_mode
       FROM (VALUES (1), (2), (3), (4)) AS t(x)""")

  /** Ordered string aggregation — Spark 4 listagg WITHIN GROUP vs DuckDB's
    * string_agg ORDER BY (same semantics, dialect-split spelling). */
  lazy val listAgg = QueryDef.sql(
    "q_golden_listagg",
    """SELECT g, listagg(s, ',') WITHIN GROUP (ORDER BY s) AS joined
       FROM (VALUES ('g1', 'b'), ('g1', 'a'), ('g1', 'c'),
                    ('g2', 'z')) AS t(g, s)
       GROUP BY g""",
    """SELECT g, string_agg(s, ',' ORDER BY s) AS joined
       FROM (VALUES ('g1', 'b'), ('g1', 'a'), ('g1', 'c'),
                    ('g2', 'z')) AS t(g, s)
       GROUP BY g""")

  /** NATURAL JOIN — the shared column joins once and projects once
    * (reference corpus: natural-join.sql). */
  lazy val naturalJoin = QueryDef.sqlSame(
    "q_golden_natural_join",
    """SELECT id, x, y
       FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, x)
       NATURAL JOIN (VALUES (1, 'p'), (3, 'q'), (4, 'r')) AS u(id, y)""")

  /** LIKE ALL / LIKE ANY multi-pattern predicates (reference corpus:
    * like-all.sql, like-any.sql) — DuckDB lacks the list syntax, so the
    * oracle spells the equivalent AND/OR chain. */
  lazy val likeAllAny = QueryDef.sql(
    "q_golden_like_all_any",
    """SELECT s,
              s LIKE ALL ('%a%', '%b%') AS both_ab,
              s LIKE ANY ('%x%', '%ph%') AS x_or_ph
       FROM (VALUES ('alpha'), ('beta'), ('ab'), ('xy')) AS t(s)""",
    """SELECT s,
              (s LIKE '%a%' AND s LIKE '%b%') AS both_ab,
              (s LIKE '%x%' OR s LIKE '%ph%') AS x_or_ph
       FROM (VALUES ('alpha'), ('beta'), ('ab'), ('xy')) AS t(s)""")

  /** range() as a TABLE-VALUED FUNCTION incl. negative step, end-exclusive
    * in both engines (reference corpus: table-valued-functions.sql). The
    * output column name differs (Spark `id`, DuckDB `range`) — aliased. */
  lazy val rangeTvf = QueryDef.sql(
    "q_golden_range_tvf",
    """SELECT CAST(id AS INT) AS x FROM range(3, 12, 2)
       UNION ALL
       SELECT CAST(id AS INT) FROM range(10, 0, -3)""",
    """SELECT CAST(range AS INT) AS x FROM range(3, 12, 2)
       UNION ALL
       SELECT CAST(range AS INT) FROM range(10, 0, -3)""")

  /** Linear-regression family (regr_slope/intercept/r2 semantics) in the
    * registry's closed-form style: EXACT integer moments (Σx, Σy, Σxy,
    * Σx², Σy², n are all BIGINT-exact over cents×linenumber), one
    * identical double expression at the end on both engines — the same
    * fixed-point-moments pattern as q_agg_stddev, because the engines'
    * built-in regr_* accumulate doubles in partition order and can differ
    * in the last ulp. */
  lazy val regrClosedForm = QueryDef.sqlSame(
    "q_golden_regr",
    """SELECT l_returnflag,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
              (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE) AS intercept,
              (CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE))
                / (CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)) AS r2,
              CAST(n AS BIGINT) AS n
       FROM (
         SELECT l_returnflag,
                count(*) AS n,
                CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                     AS BIGINT) AS sx,
                CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sy,
                CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)
                         * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sxy,
                CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)
                         * CAST(round(l_quantity * 100, 0) AS BIGINT))
                     AS BIGINT) AS sxx,
                CAST(sum(CAST(l_linenumber AS BIGINT)
                         * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS syy
         FROM lineitem GROUP BY l_returnflag) m""")

  /** Bitwise AGGREGATES bit_and / bit_or / bit_xor (the grouped forms —
    * hexBits covers the scalar operators). */
  lazy val bitAggOps = QueryDef.sqlSame(
    "q_golden_bit_agg",
    """SELECT CAST(l_partkey % 4 AS BIGINT) AS g,
              CAST(bit_and(l_partkey % 1024) AS BIGINT) AS b_and,
              CAST(bit_or(l_partkey % 1024) AS BIGINT) AS b_or,
              CAST(bit_xor(l_partkey % 1024) AS BIGINT) AS b_xor
       FROM lineitem GROUP BY l_partkey % 4""")

  /** str_to_map + map_entries + element_at lookup — DuckDB lacks
    * str_to_map, so the oracle rebuilds the same normalized entry list
    * with string ops. */
  lazy val strToMap = QueryDef.sql(
    "q_golden_str_to_map",
    """SELECT array_join(array_sort(transform(map_entries(
                str_to_map('b:2,a:1,c:30')),
                e -> concat(e.key, '=', e.value))), ',') AS entries,
              CAST(size(str_to_map('b:2,a:1,c:30')) AS BIGINT) AS n_keys,
              element_at(str_to_map('b:2,a:1,c:30'), 'a') AS a_val,
              element_at(str_to_map('b:2,a:1,c:30'), 'zz') AS missing""",
    """SELECT list_aggr(list_sort(list_transform(
                str_split('b:2,a:1,c:30', ','),
                p -> replace(p, ':', '='))), 'string_agg', ',') AS entries,
              CAST(len(str_split('b:2,a:1,c:30', ',')) AS BIGINT) AS n_keys,
              '1' AS a_val,
              CAST(NULL AS VARCHAR) AS missing""")

  /** stack() and inline() generators (reference corpus:
    * generators.sql) — the oracle spells the equivalent VALUES relations. */
  lazy val stackInline = QueryDef.sql(
    "q_golden_stack_inline",
    """SELECT k, CAST(v AS INT) AS v
       FROM (SELECT 1) LATERAL VIEW stack(3, 'a', 1, 'b', 2, 'c', 3) s
         AS k, v
       UNION ALL
       SELECT name, CAST(qty AS INT)
       FROM (SELECT 1) LATERAL VIEW inline(array(
              named_struct('name', 'x', 'qty', 10),
              named_struct('name', 'y', 'qty', 20))) i AS name, qty""",
    """SELECT k, v FROM (VALUES ('a', 1), ('b', 2), ('c', 3)) t(k, v)
       UNION ALL
       SELECT name, qty FROM (VALUES ('x', 10), ('y', 20)) u(name, qty)""")

  /** try_divide / try_mod on zero divisors and try_to_number on
    * malformed input — NULL, never an error (ANSI mode stays on). */
  lazy val tryArith = QueryDef.sql(
    "q_golden_try_arith",
    """SELECT try_divide(7, 2) AS d_ok,
              try_divide(7, 0) AS d_zero,
              CAST(try_mod(7, 0) AS INT) AS m_zero,
              CAST(try_to_number('12.5', '99.9') AS DOUBLE) AS num_ok,
              CAST(try_to_number('x2', '99') AS DOUBLE) AS num_bad""",
    """SELECT 3.5e0 AS d_ok,
              CAST(NULL AS DOUBLE) AS d_zero,
              CAST(NULL AS INT) AS m_zero,
              CAST(try_cast('12.5' AS DECIMAL(3,1)) AS DOUBLE) AS num_ok,
              CAST(try_cast('x2' AS INT) AS DOUBLE) AS num_bad""")

  /** array_union / array_intersect / array_except / array_distinct —
    * normalized through array_sort so only the SET semantics are pinned
    * (duplicate collapse, null-free element algebra); DuckDB spells them
    * with list_* and a filter for except. */
  lazy val arraySetOps = QueryDef.sql(
    "q_golden_array_set_ops",
    """SELECT array_join(array_sort(array_union(array(3, 1, 2, 3),
                                                array(2, 4))), ',') AS u,
              array_join(array_sort(array_intersect(array(1, 2, 3, 2),
                                                    array(2, 3, 5))), ',')
                AS i,
              array_join(array_sort(array_except(array(1, 2, 3, 2),
                                                 array(2))), ',') AS e,
              array_join(array_sort(array_distinct(array(2, 1, 2, 1))), ',')
                AS d""",
    """SELECT list_aggr(list_sort(list_distinct(list_cat([3, 1, 2, 3],
                                                         [2, 4]))),
                        'string_agg', ',') AS u,
              list_aggr(list_sort(list_intersect([1, 2, 3, 2], [2, 3, 5])),
                        'string_agg', ',') AS i,
              list_aggr(list_sort(list_filter(list_distinct([1, 2, 3, 2]),
                                              x -> x != 2)),
                        'string_agg', ',') AS e,
              list_aggr(list_sort(list_distinct([2, 1, 2, 1])),
                        'string_agg', ',') AS d""")

  /** percentile_cont / percentile_disc WITHIN GROUP (the ANSI ordered-set
    * syntax, distinct from the percentile() call form in q_agg_percentile)
    * — small-integer values and dyadic fractions keep the interpolation
    * a + (b−a)·f exact in both engines regardless of association. */
  lazy val percentileWithin = QueryDef.sqlSame(
    "q_golden_percentile_within",
    """SELECT l_returnflag,
              CAST(percentile_cont(0.25) WITHIN GROUP
                     (ORDER BY l_linenumber) AS DOUBLE) AS p25,
              CAST(percentile_cont(0.5) WITHIN GROUP
                     (ORDER BY l_linenumber) AS DOUBLE) AS p50,
              CAST(percentile_disc(0.75) WITHIN GROUP
                     (ORDER BY l_linenumber) AS DOUBLE) AS p75_disc
       FROM lineitem GROUP BY l_returnflag""")

  /** Crypto/encoding scalars: md5, sha2-256, base64 round trip, unhex —
    * DuckDB spells them over BLOBs with to_base64/from_base64. */
  lazy val cryptoHash = QueryDef.sql(
    "q_golden_crypto_hash",
    """SELECT md5('graft') AS m,
              sha2('graft', 256) AS s256,
              base64(encode('graft', 'UTF-8')) AS b64,
              decode(unbase64('Z3JhZnQ='), 'UTF-8') AS b64_rt,
              decode(unhex('67726166'), 'UTF-8') AS hx""",
    """SELECT md5('graft') AS m,
              sha256('graft') AS s256,
              to_base64('graft'::BLOB) AS b64,
              CAST(from_base64('Z3JhZnQ=') AS VARCHAR) AS b64_rt,
              CAST(unhex('67726166') AS VARCHAR) AS hx""")

  /** overlay() — ANSI string splice; DuckDB lacks it, oracle rebuilds via
    * substr concatenation. */
  lazy val overlayInsert = QueryDef.sql(
    "q_golden_overlay",
    """SELECT overlay('Spark SQL' PLACING '_' FROM 6) AS repl1,
              overlay('Spark SQL' PLACING 'CORE' FROM 7) AS repl4,
              overlay('Spark SQL' PLACING 'ANSI ' FROM 7 FOR 0) AS insert0,
              overlay('Spark SQL' PLACING 'tructured' FROM 2 FOR 4)
                AS splice""",
    """SELECT substr('Spark SQL', 1, 5) || '_' || substr('Spark SQL', 7)
                AS repl1,
              substr('Spark SQL', 1, 6) || 'CORE' || substr('Spark SQL', 11)
                AS repl4,
              substr('Spark SQL', 1, 6) || 'ANSI ' || substr('Spark SQL', 7)
                AS insert0,
              substr('Spark SQL', 1, 1) || 'tructured'
                || substr('Spark SQL', 6) AS splice""")

  /** map construction from parallel arrays + lookup + sorted key/value
    * dumps (map_from_arrays vs DuckDB's map(), whose element access
    * returns a one-element list). */
  lazy val mapConstruct = QueryDef.sql(
    "q_golden_map_construct",
    """SELECT map_from_arrays(array(2, 1, 3),
                              array('b', 'a', 'c'))[2] AS at2,
              array_join(array_sort(map_keys(map_from_arrays(
                array(2, 1, 3), array('b', 'a', 'c')))), ',') AS ks,
              array_join(array_sort(map_values(map_from_arrays(
                array(2, 1, 3), array('b', 'a', 'c')))), ',') AS vs,
              CAST(size(map_from_arrays(array(2, 1, 3),
                array('b', 'a', 'c'))) AS BIGINT) AS n""",
    """SELECT map([2, 1, 3], ['b', 'a', 'c'])[2][1] AS at2,
              list_aggr(list_sort(map_keys(map([2, 1, 3],
                ['b', 'a', 'c']))), 'string_agg', ',') AS ks,
              list_aggr(list_sort(map_values(map([2, 1, 3],
                ['b', 'a', 'c']))), 'string_agg', ',') AS vs,
              CAST(cardinality(map([2, 1, 3], ['b', 'a', 'c'])) AS BIGINT)
                AS n""")

  /** split() edge semantics — consecutive delimiters produce empty
    * elements, trailing empties are KEPT (limit −1), regex delimiter
    * classes work; element counts and joined dumps pinned. */
  lazy val splitEdge = QueryDef.sql(
    "q_golden_split_edge",
    """SELECT CAST(size(split('a,b,,', ',')) AS BIGINT) AS n_trail,
              array_join(split('a,b,,', ','), '|') AS joined_trail,
              CAST(size(split('a1b22c', '[0-9]+')) AS BIGINT) AS n_regex,
              array_join(split('a1b22c', '[0-9]+'), '|') AS joined_regex,
              CAST(size(split('', ',')) AS BIGINT) AS n_empty""",
    """SELECT CAST(len(str_split('a,b,,', ',')) AS BIGINT) AS n_trail,
              list_aggr(str_split('a,b,,', ','), 'string_agg', '|')
                AS joined_trail,
              CAST(len(regexp_split_to_array('a1b22c', '[0-9]+'))
                   AS BIGINT) AS n_regex,
              list_aggr(regexp_split_to_array('a1b22c', '[0-9]+'),
                        'string_agg', '|') AS joined_regex,
              CAST(len(str_split('', ',')) AS BIGINT) AS n_empty""")

  /** chr / ascii / char vs byte length (octet_length counts UTF-8
    * bytes — 'héllo' is 5 chars, 6 bytes; DuckDB spells byte length
    * strlen). */
  lazy val charFns = QueryDef.sql(
    "q_golden_char_fns",
    """SELECT chr(65) AS a_chr,
              CAST(ascii('A') AS INT) AS a_code,
              CAST(ascii('') AS INT) AS empty_code,
              CAST(length('héllo') AS INT) AS n_chars,
              CAST(octet_length('héllo') AS INT) AS n_bytes,
              CAST(bit_length('ab') AS INT) AS n_bits""",
    """SELECT chr(65) AS a_chr,
              CAST(ascii('A') AS INT) AS a_code,
              CAST(ascii('') AS INT) AS empty_code,
              CAST(length('héllo') AS INT) AS n_chars,
              CAST(strlen('héllo') AS INT) AS n_bytes,
              CAST(bit_length('ab') AS INT) AS n_bits""")

  /** nullif / ifnull family (nvl2 spelled as CASE in the oracle —
    * DuckDB lacks it). */
  lazy val nullifFamily = QueryDef.sql(
    "q_golden_nullif_family",
    """SELECT CAST(nullif(5, 5) AS INT) AS eq_null,
              CAST(nullif(5, 6) AS INT) AS ne_pass,
              CAST(ifnull(CAST(NULL AS INT), 9) AS INT) AS if_null,
              CAST(ifnull(7, 9) AS INT) AS if_set,
              nvl2(CAST(NULL AS INT), 'yes', 'no') AS nvl2_null,
              nvl2(1, 'yes', 'no') AS nvl2_set""",
    """SELECT CAST(nullif(5, 5) AS INT) AS eq_null,
              CAST(nullif(5, 6) AS INT) AS ne_pass,
              CAST(ifnull(CAST(NULL AS INT), 9) AS INT) AS if_null,
              CAST(ifnull(7, 9) AS INT) AS if_set,
              CASE WHEN CAST(NULL AS INT) IS NOT NULL THEN 'yes' ELSE 'no'
                END AS nvl2_null,
              CASE WHEN 1 IS NOT NULL THEN 'yes' ELSE 'no' END AS nvl2_set""")

  /** Ordered grouped array dump — Spark's collect_list has NO order
    * guarantee, so the portable spelling normalizes through
    * sort_array; DuckDB's list(x ORDER BY x) declares it. */
  lazy val arrayAggOrder = QueryDef.sql(
    "q_golden_array_agg_order",
    """SELECT l_returnflag,
              array_join(sort_array(collect_list(DISTINCT l_linenumber)),
                         ',') AS lines
       FROM lineitem GROUP BY l_returnflag""",
    """SELECT l_returnflag,
              list_aggr(list(DISTINCT l_linenumber ORDER BY l_linenumber),
                        'string_agg', ',') AS lines
       FROM lineitem GROUP BY l_returnflag""")

  /** DUPLICATE grouping sets — GROUPING SETS ((g), (g)) emits each group
    * TWICE (the Expand keeps both branches; dedup would be wrong). */
  lazy val groupingSetsDup = QueryDef.sqlSame(
    "q_golden_grouping_sets_dup",
    """SELECT g, count(*) AS n FROM (VALUES ('a', 1), ('a', 2), ('b', 3))
         AS t(g, v)
       GROUP BY GROUPING SETS ((g), (g))
       ORDER BY g""")

  /** Lateral column aliases — a SELECT item referencing an alias defined
    * earlier in the SAME select list (reference corpus analogue:
    * column-resolution tests; Spark ≥3.4 and DuckDB both resolve them,
    * including through a chain). */
  lazy val lateralAlias = QueryDef.sqlSame(
    "q_golden_lateral_alias",
    """SELECT x, x * 2 AS dbl, dbl + 1 AS dbl1, dbl1 * dbl AS chained
       FROM (VALUES (1), (2), (5)) AS t(x)
       ORDER BY x""")

  /** array_sort with a COMPARATOR LAMBDA (Spark-only syntax): sort by
    * (length, then lexical). The DuckDB oracle reaches the same order by
    * sorting (length, value) structs — pinning that the comparator path
    * produces the canonical multi-key order, not just that it runs. */
  lazy val sortLambda = QueryDef.sql(
    "q_golden_sort_lambda",
    """SELECT array_join(array_sort(array('kiwi', 'fig', 'banana', 'apple',
                                          'date'),
              (l, r) -> CASE WHEN length(l) < length(r) THEN -1
                             WHEN length(l) > length(r) THEN 1
                             WHEN l < r THEN -1 WHEN l > r THEN 1
                             ELSE 0 END), ',') AS by_len_then_lex""",
    """SELECT list_aggr(list_transform(list_sort(list_transform(
                ['kiwi', 'fig', 'banana', 'apple', 'date'],
                x -> {'k': length(x), 'v': x})), s -> s.v),
              'string_agg', ',') AS by_len_then_lex""")

  /** Map HOFs transform_keys / transform_values / map_zip_with (Spark-only
    * functions; reference corpus: higher-order-functions golden file).
    * Entries are dumped key-sorted as strings; the oracle pins the
    * expected outputs golden-file style (hand-derived constants — exactly
    * what the reference's sql-tests "results" .out files are). */
  lazy val mapTransform = QueryDef.sql(
    "q_golden_map_transform",
    """SELECT
         array_join(transform(array_sort(map_entries(
           transform_keys(map('a', 1, 'b', 2), (k, v) -> upper(k)))),
           e -> concat(e.key, '=', CAST(e.value AS STRING))), ',') AS tk,
         array_join(transform(array_sort(map_entries(
           transform_values(map('a', 1, 'b', 2), (k, v) -> v * 10 + length(k)))),
           e -> concat(e.key, '=', CAST(e.value AS STRING))), ',') AS tv,
         array_join(transform(array_sort(map_entries(
           map_zip_with(map('a', 1, 'b', 2), map('b', 30, 'c', 40),
             (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)))),
           e -> concat(e.key, '=', CAST(e.value AS STRING))), ',') AS mzw,
         array_join(transform(array_sort(map_entries(
           map_filter(map('a', 1, 'b', 2, 'c', 3), (k, v) -> v % 2 = 1))),
           e -> concat(e.key, '=', CAST(e.value AS STRING))), ',') AS mf""",
    """SELECT 'A=1,B=2' AS tk, 'a=11,b=21' AS tv,
              'a=1,b=32,c=40' AS mzw, 'a=1,c=3' AS mf""")

  /** Array editing family array_insert / array_remove / array_compact /
    * array_prepend / array_append (Spark 3.4+ names; DuckDB spells each
    * differently, bridged). array_insert is 1-based like element_at. */
  lazy val arrayEdit = QueryDef.sql(
    "q_golden_array_edit",
    """SELECT
         array_join(array_insert(array(1, 2, 4), 3, 3), ',') AS ins,
         array_join(array_remove(array(1, 2, 1, 3), 1), ',') AS rem,
         array_join(array_compact(array(1, NULL, 2, NULL)), ',') AS comp,
         array_join(array_prepend(array(2, 3), 1), ',') AS prep,
         array_join(array_append(array(1, 2), 3), ',') AS app""",
    """SELECT '1,2,3,4' AS ins,
              list_aggr(list_filter([1, 2, 1, 3], x -> x != 1),
                        'string_agg', ',') AS rem,
              list_aggr(list_filter([1, NULL, 2, NULL], x -> x IS NOT NULL),
                        'string_agg', ',') AS comp,
              list_aggr(list_prepend(1, [2, 3]), 'string_agg', ',') AS prep,
              list_aggr(list_append([1, 2], 3), 'string_agg', ',') AS app""")

  /** The SQL PIVOT clause (Spark syntax) vs the universal conditional-
    * aggregation spelling — pins that PIVOT is sugar for FILTERed
    * aggregates, including the absent-cell NULL. */
  lazy val sqlPivot = QueryDef.sql(
    "q_golden_sql_pivot",
    """SELECT * FROM (
         SELECT g, season, v
         FROM (VALUES ('x', 'spring', 10), ('x', 'fall', 20),
                      ('y', 'spring', 5)) AS t(g, season, v))
       PIVOT (CAST(sum(v) AS BIGINT) FOR season IN ('spring', 'fall'))
       ORDER BY g""",
    """SELECT g,
              CAST(sum(v) FILTER (WHERE season = 'spring') AS BIGINT)
                AS spring,
              CAST(sum(v) FILTER (WHERE season = 'fall') AS BIGINT) AS fall
       FROM (VALUES ('x', 'spring', 10), ('x', 'fall', 20),
                    ('y', 'spring', 5)) AS t(g, season, v)
       GROUP BY g ORDER BY g""")

  /** element_at / try_element_at indexing semantics: 1-based, negative =
    * from the end, try_ returns NULL out of bounds (Spark names; DuckDB
    * list indexing bridges each). */
  lazy val elementAt = QueryDef.sql(
    "q_golden_element_at",
    """SELECT element_at(array(10, 20, 30), 1) AS first,
              element_at(array(10, 20, 30), -1) AS last,
              try_element_at(array(10, 20, 30), 7) AS oob,
              element_at(map('a', 1, 'b', 2), 'b') AS mv,
              try_element_at(map('a', 1), 'z') AS mmiss""",
    """SELECT [10, 20, 30][1] AS first, [10, 20, 30][-1] AS last,
              [10, 20, 30][7] AS oob,
              map_extract(map(['a', 'b'], [1, 2]), 'b')[1] AS mv,
              map_extract(map(['a'], [1]), 'z')[1] AS mmiss""")

  /** Tuple (row-value) IN subquery — multi-column membership incl. the
    * no-match and the partial-match row. DuckDB lacks the row-value IN
    * spelling, so the oracle uses the equivalent EXISTS. */
  lazy val tupleIn = QueryDef.sql(
    "q_golden_tuple_in",
    """SELECT a, b,
              (a, b) IN (SELECT x, y
                         FROM (VALUES (1, 'p'), (2, 'q')) AS s(x, y)) AS hit
       FROM (VALUES (1, 'p'), (1, 'q'), (2, 'q'), (3, 'p')) AS t(a, b)
       ORDER BY a, b""",
    """SELECT a, b,
              EXISTS (SELECT 1 FROM (VALUES (1, 'p'), (2, 'q')) AS s(x, y)
                      WHERE x = a AND y = b) AS hit
       FROM (VALUES (1, 'p'), (1, 'q'), (2, 'q'), (3, 'p')) AS t(a, b)
       ORDER BY a, b""")

  /** Set-operation precedence: INTERSECT binds tighter than UNION /
    * EXCEPT (ANSI), so a UNION b INTERSECT c = a UNION (b INTERSECT c). */
  lazy val setopPrecedence = QueryDef.sqlSame(
    "q_golden_setop_precedence",
    """SELECT x FROM (VALUES (1), (2)) AS a(x)
       UNION
       SELECT x FROM (VALUES (2), (3), (4)) AS b(x)
       INTERSECT
       SELECT x FROM (VALUES (3), (5)) AS c(x)
       ORDER BY x""")

  /** inline-table.sql: a multi-row VALUES relation as a first-class FROM
    * item — nulls in both columns, numeric widening across rows (INT and
    * DECIMAL literals unify), and a join from the inline table to a real
    * one. */
  val valuesTable = QueryDef.sqlSame(
    "q_golden_values_table",
    """SELECT t.k, t.tag, n.n_name,
              CAST(t.w * 2 AS DOUBLE) AS widened_x2
       FROM (VALUES (0, 'a', 1), (1, NULL, 2.5), (2, 'c', NULL))
            AS t(k, tag, w)
       LEFT JOIN nation n ON t.k = n.n_nationkey""")

  /** join-empty-relation.sql: every join flavor against a provably-empty
    * side, plus aggregate-over-empty seeding (count 0, sum NULL — both
    * engines agree once coalesced). Catalyst folds these through
    * PropagateEmptyRelation; the answers must survive the folding. */
  val emptyJoin = QueryDef.sqlSame(
    "q_golden_empty_join",
    """WITH e AS (SELECT n_nationkey AS k, n_name AS nm FROM nation
                  WHERE 1 = 0)
       SELECT
         (SELECT count(*) FROM e) AS cnt_empty,
         (SELECT count(*) FROM nation JOIN e ON n_nationkey = e.k)
           AS inner_drop,
         (SELECT count(*) FROM nation LEFT JOIN e ON n_nationkey = e.k)
           AS left_keep,
         (SELECT count(*) FROM nation
          WHERE n_nationkey IN (SELECT k FROM e)) AS in_empty,
         (SELECT count(*) FROM nation
          WHERE n_nationkey NOT IN (SELECT k FROM e)) AS not_in_empty,
         CAST((SELECT coalesce(sum(k), -1) FROM e) AS BIGINT) AS sum_empty,
         CAST((SELECT max(nm) FROM e) IS NULL AS INT) AS max_empty_null""")

  /** cte-nested.sql: WITH inside a CTE definition, the inner definition
    * SHADOWING the outer name (the modern precedence both engines apply),
    * while a sibling CTE still sees the outer one. */
  val cteNested = QueryDef.sqlSame(
    "q_golden_cte_nested",
    """WITH t AS (SELECT 1 AS v),
         u AS (WITH t AS (SELECT 10 AS v) SELECT v FROM t),
         w AS (SELECT v + 100 AS v FROM t)
       SELECT (SELECT v FROM t) AS outer_v,
              (SELECT v FROM u) AS shadowed_v,
              (SELECT v FROM w) AS sibling_v""")

  /** sql-compatibility-functions.sql: the nvl/nvl2/ifnull compatibility
    * shims — DuckDB spells them ifnull/CASE, so the oracle text differs
    * while the semantics are pinned identical. */
  val nvlCompat = QueryDef.sql(
    "q_golden_nvl_compat",
    """SELECT CAST(nvl(NULL, 5) AS INT) AS nvl_null,
              CAST(nvl(3, 5) AS INT) AS nvl_set,
              nvl2(4, 'a', 'b') AS nvl2_set,
              nvl2(NULL, 'a', 'b') AS nvl2_null,
              CAST(ifnull(NULL, 9) AS INT) AS ifnull_null,
              CAST(nullif(3, 3) AS INT) AS nullif_eq,
              CAST(nullif(3, 4) AS INT) AS nullif_ne""",
    """SELECT CAST(ifnull(NULL, 5) AS INT) AS nvl_null,
              CAST(ifnull(3, 5) AS INT) AS nvl_set,
              CASE WHEN 4 IS NOT NULL THEN 'a' ELSE 'b' END AS nvl2_set,
              CASE WHEN NULL IS NOT NULL THEN 'a' ELSE 'b' END AS nvl2_null,
              CAST(ifnull(NULL, 9) AS INT) AS ifnull_null,
              CAST(nullif(3, 3) AS INT) AS nullif_eq,
              CAST(nullif(3, 4) AS INT) AS nullif_ne""")

  /** operators.sql: integral division and modulo SIGN semantics — DIV
    * truncates toward zero in both engines (Spark `DIV`, DuckDB `//`),
    * `%` follows the dividend's sign, pmod is the always-positive variant
    * (emulated in DuckDB), and fractional modulo keeps the decimal. */
  val intDivMod = QueryDef.sql(
    "q_golden_intdiv_mod",
    """SELECT CAST(7 DIV -2 AS BIGINT) AS div_trunc_neg,
              CAST(-7 DIV 2 AS BIGINT) AS div_neg_trunc,
              CAST(-7 % 2 AS INT) AS mod_dividend_sign,
              CAST(7 % -2 AS INT) AS mod_pos_dividend,
              CAST(pmod(-7, 2) AS INT) AS pmod_pos,
              CAST(7.5 % 2 AS STRING) AS mod_decimal""",
    """SELECT CAST(7 // -2 AS BIGINT) AS div_trunc_neg,
              CAST(-7 // 2 AS BIGINT) AS div_neg_trunc,
              CAST(-7 % 2 AS INT) AS mod_dividend_sign,
              CAST(7 % -2 AS INT) AS mod_pos_dividend,
              CAST(((-7 % 2) + 2) % 2 AS INT) AS pmod_pos,
              CAST(7.5 % 2 AS STRING) AS mod_decimal""")

  /** datetime-formatting.sql: pattern-based timestamp rendering — Spark's
    * SimpleDateFormat-style patterns vs DuckDB's strftime, pinned to agree
    * on the portable core (numeric fields, English day/month names). */
  val dateFormat = QueryDef.sql(
    "q_golden_date_format",
    """SELECT date_format(TIMESTAMP '2026-08-13 14:05:09',
                          'yyyy-MM-dd HH:mm:ss') AS iso_full,
              date_format(DATE '2026-08-13', 'EEEE') AS day_name,
              date_format(DATE '2026-02-01', 'MMMM') AS month_name,
              date_format(TIMESTAMP '2026-08-13 14:05:09', 'HH') AS hh24,
              date_format(DATE '2026-08-13', 'yyyy') AS just_year""",
    """SELECT strftime(TIMESTAMP '2026-08-13 14:05:09',
                       '%Y-%m-%d %H:%M:%S') AS iso_full,
              strftime(DATE '2026-08-13', '%A') AS day_name,
              strftime(DATE '2026-02-01', '%B') AS month_name,
              strftime(TIMESTAMP '2026-08-13 14:05:09', '%H') AS hh24,
              strftime(DATE '2026-08-13', '%Y') AS just_year""")

  /** array.sql (nesting): flatten one level, array_repeat, sequence —
    * DuckDB spells them flatten / list-comprehension / range. */
  val arrayFlatten = QueryDef.sql(
    "q_golden_array_flatten",
    """SELECT array_join(flatten(array(array(1, 2), array(3),
                                       array())), ',') AS flat,
              array_join(array_repeat(5, 3), ',') AS repeated,
              array_join(sequence(1, 5), ',') AS seq_up,
              array_join(sequence(5, 1, -2), ',') AS seq_down""",
    """SELECT array_to_string(flatten([[1, 2], [3], []]), ',') AS flat,
              array_to_string([5 FOR x IN range(3)], ',') AS repeated,
              array_to_string(range(1, 6), ',') AS seq_up,
              array_to_string(range(5, 0, -2), ',') AS seq_down""")

  /** comparator.sql (portable core): comparison COERCION — boolean
    * ordering, ASCII string ordering, date-vs-timestamp promotion,
    * int-vs-decimal equality, decimal-literal exactness (0.1 + 0.2 IS
    * 0.3 in decimal arithmetic), lexicographic BETWEEN on strings, and
    * string→numeric equality coercion. */
  val compareCoercion = QueryDef.sqlSame(
    "q_golden_compare_coercion",
    """SELECT CAST(true > false AS INT) AS bool_gt,
              CAST('abc' < 'abd' AS INT) AS str_lt,
              CAST(DATE '2020-01-01' < TIMESTAMP '2020-01-01 00:00:01'
                   AS INT) AS date_ts_promote,
              CAST(1 = 1.0 AS INT) AS int_dec_eq,
              CAST(0.1 + 0.2 = 0.3 AS INT) AS decimal_exact,
              CAST('2' BETWEEN '10' AND '3' AS INT) AS str_between,
              CAST('01' = 1 AS INT) AS str_num_eq""")

  /** Typed numeric literal suffixes and scientific notation (reference:
    * sql-tests/inputs/literals.sql): Y/S/L tinyint/smallint/bigint bounds,
    * int→bigint literal promotion, decimal-vs-double-vs-float literal
    * typing, `.9e+2`/`900e-1`/`9.e+1` all parsing to the same double, hex
    * binary literals, and the 38-digit decimal precision ceiling (39 digits
    * fails to parse under ANSI — pinned via try_cast instead). Oracle is a
    * hardcoded row: DuckDB has no literal-suffix grammar, so the pinned
    * values ARE the cross-engine contract. */
  val typedLiterals = QueryDef.sql(
    "q_golden_typed_literals",
    """SELECT CAST(127Y AS STRING) AS tiny_max,
              CAST(-32768S AS STRING) AS small_min,
              CAST(9223372036854775807L AS STRING) AS big_max,
              typeof(2147483648) AS t_promote,
              typeof(1.5) AS t_dec, typeof(1.5D) AS t_dbl, typeof(1.5F) AS t_flt,
              CAST(.9e+2 AS STRING) AS sci1, CAST(900e-1 AS STRING) AS sci2,
              CAST(9.e+1 AS STRING) AS sci3, CAST(0.10f AS STRING) AS flt_lit,
              hex(X'1f2a') AS hex_bin,
              CAST(try_cast('1234567890123456789012345678901234567890.0'
                            AS DECIMAL(38,1)) AS STRING) AS huge_null,
              CAST(1234567890123456789012345678901234567.8BD AS STRING) AS bd38""",
    """SELECT '127' AS tiny_max, '-32768' AS small_min,
              '9223372036854775807' AS big_max, 'bigint' AS t_promote,
              'decimal(2,1)' AS t_dec, 'double' AS t_dbl, 'float' AS t_flt,
              '90.0' AS sci1, '90.0' AS sci2, '90.0' AS sci3, '0.1' AS flt_lit,
              '1F2A' AS hex_bin, CAST(NULL AS VARCHAR) AS huge_null,
              '1234567890123456789012345678901234567.8' AS bd38""")

  /** CSV scalar functions (reference: sql-tests/inputs/csv-functions.sql):
    * from_csv with an inline DDL schema, from_csv with a timestampFormat
    * option, schema_of_csv inference (with and without a delimiter option),
    * and to_csv round-trips incl. a formatted timestamp. DuckDB's CSV
    * machinery is table-level, not scalar, so the oracle pins values. */
  val fromCsv = QueryDef.sql(
    "q_golden_from_csv",
    """SELECT c1.a AS a1, CAST(c1.f AS STRING) AS f1,
              CAST(c2.time AS STRING) AS t2,
              schema_of_csv('1,abc') AS sch,
              schema_of_csv('1|abc', map('delimiter','|')) AS sch2,
              to_csv(named_struct('a',1,'b',2)) AS csv1,
              to_csv(named_struct('time', to_timestamp('2015-08-26','yyyy-MM-dd')),
                     map('timestampFormat','dd/MM/yyyy')) AS csv2
       FROM (SELECT from_csv('1, 3.14','a INT, f FLOAT') c1,
                    from_csv('26/08/2015','time Timestamp',
                             map('timestampFormat','dd/MM/yyyy')) c2)""",
    """SELECT 1 AS a1, '3.14' AS f1, '2015-08-26 00:00:00' AS t2,
              'STRUCT<_c0: INT, _c1: STRING>' AS sch,
              'STRUCT<_c0: INT, _c1: STRING>' AS sch2,
              '1,2' AS csv1, '26/08/2015' AS csv2""")

  /** CHAR(n)/VARCHAR(n) cast semantics (reference: sql-tests/inputs/
    * charvarchar.sql): Spark pads CHAR only on table-column reads, NOT on a
    * plain cast — `CAST('ab' AS CHAR(5))` stays 'ab' (length 2, ≠ rpad) —
    * and a cast to a shorter VARCHAR passes the string through untruncated.
    * Divergent-from-PostgreSQL corners worth pinning explicitly. */
  val charVarchar = QueryDef.sql(
    "q_golden_char_varchar",
    """SELECT CAST('ab' AS CHAR(5)) AS padded,
              length(CAST('ab' AS CHAR(5))) AS len_pad,
              CAST(CAST('ab' AS CHAR(5)) = 'ab' AS INT) AS pad_eq_plain,
              CAST(CAST('ab' AS CHAR(5)) = rpad('ab',5,' ') AS INT) AS pad_eq_rpad,
              try_cast('abcdef' AS VARCHAR(3)) AS vc_over,
              CAST('xy' AS VARCHAR(3)) AS vc_ok,
              length(CAST('xy' AS VARCHAR(3))) AS vc_len""",
    """SELECT 'ab' AS padded, 2 AS len_pad, 1 AS pad_eq_plain,
              0 AS pad_eq_rpad, 'abcdef' AS vc_over, 'xy' AS vc_ok, 2 AS vc_len""")

  /** Named-zone conversions (reference: sql-tests/inputs/timezone.sql,
    * datetime.sql): from_utc_timestamp across both US DST transitions
    * (spring-forward gap, fall-back overlap), a half-hour zone (Kolkata),
    * a southern-hemisphere winter offset (Sydney AEST+10), and a
    * 45-minute zone (Kathmandu +5:45). Session TZ is UTC; the oracle pins
    * the converted wall-clock strings. */
  val timezoneConv = QueryDef.sql(
    "q_golden_timezone",
    """SELECT CAST(from_utc_timestamp(TIMESTAMP '2021-03-14 10:30:00',
                'America/Los_Angeles') AS STRING) AS la_spring,
              CAST(from_utc_timestamp(TIMESTAMP '2021-11-07 08:30:00',
                'America/Los_Angeles') AS STRING) AS la_fall,
              CAST(to_utc_timestamp(TIMESTAMP '2021-06-15 12:00:00',
                'Asia/Kolkata') AS STRING) AS ist_utc,
              CAST(from_utc_timestamp(TIMESTAMP '2021-06-15 12:00:00',
                'Australia/Sydney') AS STRING) AS syd,
              hour(from_utc_timestamp(TIMESTAMP '2021-01-01 00:30:00',
                'Asia/Kathmandu')) AS kat_hour,
              minute(from_utc_timestamp(TIMESTAMP '2021-01-01 00:30:00',
                'Asia/Kathmandu')) AS kat_min""",
    """SELECT '2021-03-14 03:30:00' AS la_spring,
              '2021-11-07 01:30:00' AS la_fall,
              '2021-06-15 06:30:00' AS ist_utc,
              '2021-06-15 22:00:00' AS syd, 6 AS kat_hour, 15 AS kat_min""")

  /** JSON path extraction (reference: sql-tests/inputs/json-functions.sql):
    * get_json_object with an array index path, a `[*]` wildcard projection
    * (returns a JSON array string), a missing path (NULL), json_tuple
    * multi-field extraction via LATERAL VIEW, from_json with an array
    * schema + element access, and schema_of_json inference. */
  val jsonPath = QueryDef.sql(
    "q_golden_json_path",
    """SELECT get_json_object(j, '$.store.book[1].price') AS p1,
              get_json_object(j, '$.store.book[*].author') AS authors,
              get_json_object(j, '$.missing') AS miss,
              jt.c0 AS x, jt.c1 AS y,
              size(from_json('[{"a":1},{"a":2},{"a":3}]',
                             'array<struct<a:int>>')) AS arr_n,
              from_json('[{"a":1},{"a":2},{"a":3}]',
                        'array<struct<a:int>>')[2].a AS arr_last,
              schema_of_json('[{"a":1}]') AS sch
       FROM (SELECT '{"store":{"book":[{"author":"A","price":7.5},{"author":"B","price":12.0}]}}' AS j)
       LATERAL VIEW json_tuple('{"x":1,"y":"two"}','x','y') jt AS c0, c1""",
    """SELECT '12.0' AS p1, '["A","B"]' AS authors,
              CAST(NULL AS VARCHAR) AS miss, '1' AS x, 'two' AS y,
              3 AS arr_n, 3 AS arr_last, 'ARRAY<STRUCT<a: BIGINT>>' AS sch""")

  /** IEEE-754 special-value semantics under ANSI (reference: sql-tests/
    * inputs/postgreSQL/float8.sql + predicate-functions.sql): Spark treats
    * NaN as equal to itself and greater than +Infinity (total order),
    * Inf + -Inf = NaN, double overflow saturates to Infinity (no ANSI
    * error, unlike integer overflow), -0.0 = 0.0, and try_divide by zero
    * yields NULL rather than the ANSI DIVIDE_BY_ZERO error. */
  val floatEdge = QueryDef.sql(
    "q_golden_float_edge",
    """SELECT CAST(CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS INT) AS nan_eq,
              CAST(CAST('NaN' AS DOUBLE) > CAST('Infinity' AS DOUBLE) AS INT) AS nan_gt_inf,
              CAST(nanvl(CAST('NaN' AS DOUBLE), 1.5) AS STRING) AS nanvl_v,
              CAST(isnan(CAST('Infinity' AS DOUBLE) + CAST('-Infinity' AS DOUBLE)) AS INT) AS inf_sum_nan,
              CAST(CAST('Infinity' AS DOUBLE) AS STRING) AS inf_str,
              CAST(1.7976931348623157E308D * 2 AS STRING) AS overflow_inf,
              CAST(-0.0D = 0.0D AS INT) AS negzero_eq,
              CAST(CAST('-Infinity' AS DOUBLE) < -1.7976931348623157E308D AS INT) AS neginf_lt_min,
              CAST(try_divide(1.0D, 0.0D) AS STRING) AS try_div_zero""",
    """SELECT 1 AS nan_eq, 1 AS nan_gt_inf, '1.5' AS nanvl_v, 1 AS inf_sum_nan,
              'Infinity' AS inf_str, 'Infinity' AS overflow_inf, 1 AS negzero_eq,
              1 AS neginf_lt_min, CAST(NULL AS VARCHAR) AS try_div_zero""")

  /** URL dissection (Spark's Hive-inherited parse_url; no reference input
    * file covers it but the reference whitelists it in its expression
    * converter): every component part of an authority-full URL plus
    * url_encode's application/x-www-form-urlencoded space-as-plus
    * convention and url_decode's %-unescaping. */
  val parseUrl = QueryDef.sql(
    "q_golden_parse_url",
    """SELECT parse_url(u,'HOST') AS host, parse_url(u,'PATH') AS path,
              parse_url(u,'QUERY') AS q_all, parse_url(u,'QUERY','b') AS qb,
              parse_url(u,'REF') AS frag, parse_url(u,'PROTOCOL') AS proto,
              parse_url(u,'USERINFO') AS userinfo,
              url_encode('a b&c=d') AS enc, url_decode('a%20b%26c') AS dec_out
       FROM (SELECT 'https://user@example.com:8443/p/q.html?a=1&b=two#frag' AS u)""",
    """SELECT 'example.com' AS host, '/p/q.html' AS path, 'a=1&b=two' AS q_all,
              'two' AS qb, 'frag' AS frag, 'https' AS proto, 'user' AS userinfo,
              'a+b%26c%3Dd' AS enc, 'a b&c' AS dec_out""")

  /** typeof() over the full type lattice + byte-vs-bit-vs-char lengths on
    * multibyte input (reference: sql-tests/inputs/misc-functions.sql,
    * string-functions.sql): pins the engine's type names — incl. the
    * day-granularity ANSI interval literal and BD decimal suffix — and
    * that octet_length counts UTF-8 bytes while char_length counts
    * codepoints. */
  val miscTypeof = QueryDef.sql(
    "q_golden_misc_typeof",
    """SELECT typeof(DATE '2020-01-01') AS t_date,
              typeof(TIMESTAMP '2020-01-01 00:00:00') AS t_ts,
              typeof(array(1,2)) AS t_arr, typeof(map('a',1)) AS t_map,
              typeof(named_struct('a',1)) AS t_struct, typeof(X'00') AS t_bin,
              typeof(INTERVAL 3 DAY) AS t_ival, typeof(1.5BD) AS t_bd,
              octet_length('héllo') AS olen, bit_length('ab') AS blen,
              char_length('héllo') AS clen""",
    """SELECT 'date' AS t_date, 'timestamp' AS t_ts, 'array<int>' AS t_arr,
              'map<string,int>' AS t_map, 'struct<a:int>' AS t_struct,
              'binary' AS t_bin, 'interval day' AS t_ival,
              'decimal(2,1)' AS t_bd, 6 AS olen, 16 AS blen, 5 AS clen""")

  /** COUNT-shape battery (reference: sql-tests/inputs/count.sql): count(*)
    * vs count(1) vs count(col) vs count(expr) null-skipping, and the
    * multi-argument count(DISTINCT a, b) which drops any row with a NULL in
    * EITHER argument — DuckDB has no variadic count, so the oracle encodes
    * that rule explicitly as a guarded tuple. */
  val countEdge = QueryDef.sql(
    "q_golden_count_edge",
    """SELECT count(*) AS c_star, count(1) AS c_one, count(a) AS c_a,
              count(DISTINCT a) AS cd_a, count(DISTINCT a, b) AS cd_ab,
              count(a + b) AS c_expr, sum(CAST(a IS NULL AS INT)) AS n_null_a
       FROM (VALUES (1, 10), (1, 20), (NULL, 10), (2, NULL), (NULL, NULL),
                    (2, 10)) AS t(a, b)""",
    """SELECT count(*) AS c_star, count(1) AS c_one, count(a) AS c_a,
              count(DISTINCT a) AS cd_a,
              count(DISTINCT CASE WHEN a IS NOT NULL AND b IS NOT NULL
                                  THEN (a, b) END) AS cd_ab,
              count(a + b) AS c_expr,
              CAST(sum(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_null_a
       FROM (VALUES (1, 10), (1, 20), (NULL, 10), (2, NULL), (NULL, NULL),
                    (2, 10)) AS t(a, b)""")

  /** Complex-type comparison semantics (reference: sql-tests/inputs/
    * comparator.sql, array.sql): arrays compare lexicographically with
    * prefix-shorter-first, structs compare field-by-field in declaration
    * order, and arrays are ORDER BY-able — the row_number pins the total
    * order over heterogeneous-length arrays. */
  val complexCompare = QueryDef.sql(
    "q_golden_complex_compare",
    """SELECT CAST(array(1,2) < array(1,3) AS INT) AS arr_lt,
              CAST(array(1,2) < array(1,2,0) AS INT) AS arr_prefix_lt,
              CAST(named_struct('a',1,'b',2) < named_struct('a',1,'b',3)
                   AS INT) AS struct_lt,
              CAST(array(1,2) = array(1,2) AS INT) AS arr_eq,
              array_join(x, '|') AS xs, row_number() OVER (ORDER BY x) AS rn
       FROM (VALUES (array(2,1)), (array(1,5)), (array(1,2,3))) AS t(x)""",
    """SELECT CAST(list_value(1,2) < list_value(1,3) AS INT) AS arr_lt,
              CAST(list_value(1,2) < list_value(1,2,0) AS INT) AS arr_prefix_lt,
              CAST({'a':1,'b':2} < {'a':1,'b':3} AS INT) AS struct_lt,
              CAST(list_value(1,2) = list_value(1,2) AS INT) AS arr_eq,
              array_to_string(x, '|') AS xs, row_number() OVER (ORDER BY x) AS rn
       FROM (VALUES (list_value(2,1)), (list_value(1,5)),
                    (list_value(1,2,3))) AS t(x)""")

  /** Column-resolution precedence (reference: sql-tests/inputs/
    * columnresolution.sql): `a.b` where `a` is both a column (struct) and
    * could be a table alias — the struct field wins when no table named `a`
    * exists, and the qualified `t.a.b` path reaches the same field. */
  val colResolution = QueryDef.sql(
    "q_golden_col_resolution",
    """SELECT t.a.b AS field_b, a.b AS bare_field
       FROM (SELECT named_struct('b', 7) AS a) t""",
    """SELECT t.a.b AS field_b, a.b AS bare_field
       FROM (SELECT {'b': 7} AS a) t""")

  /** HAVING without GROUP BY (reference: sql-tests/inputs/postgreSQL/
    * select_having.sql): the global aggregate still filters — one branch
    * passes its predicate and emits the single row, the other eliminates
    * it entirely. */
  val havingNoGroupBy = QueryDef.sqlSame(
    "q_golden_having_no_groupby",
    """SELECT tag, CAST(s AS BIGINT) AS s FROM (
         SELECT 'gt2' AS tag, sum(a) AS s FROM (VALUES (1),(2)) t(a)
         HAVING sum(a) > 2
         UNION ALL
         SELECT 'gt10' AS tag, sum(a) AS s FROM (VALUES (1),(2)) t(a)
         HAVING sum(a) > 10)""")

  /** String→boolean cast token set + three-valued logic (reference:
    * sql-tests/inputs/postgreSQL/boolean.sql): Spark accepts t/f, y/n,
    * yes/no, 1/0, case-insensitively and TRIMMED — wider than DuckDB's
    * set (which rejects yes/no/y and untrimmed input), so the oracle
    * hardcodes Spark's documented acceptances; 'on'/'2' are null under
    * try_cast in both. Numeric→boolean is nonzero-true. AND/OR null
    * propagation (false AND null = false, true OR null = true) rides
    * along portably. */
  val boolCast = QueryDef.sql(
    "q_golden_bool_cast",
    """SELECT CAST(try_cast('t' AS BOOLEAN) AS INT) AS c_t,
              CAST(try_cast('f' AS BOOLEAN) AS INT) AS c_f,
              CAST(try_cast('yes' AS BOOLEAN) AS INT) AS c_yes,
              CAST(try_cast('no' AS BOOLEAN) AS INT) AS c_no,
              CAST(try_cast('y' AS BOOLEAN) AS INT) AS c_y,
              CAST(try_cast('1' AS BOOLEAN) AS INT) AS c_1,
              CAST(try_cast('0' AS BOOLEAN) AS INT) AS c_0,
              CAST(try_cast('TRUE' AS BOOLEAN) AS INT) AS c_true_uc,
              CAST(try_cast(' true ' AS BOOLEAN) AS INT) AS c_true_ws,
              CAST(try_cast('2' AS BOOLEAN) AS INT) AS c_2,
              CAST(try_cast('on' AS BOOLEAN) AS INT) AS c_on,
              CAST(CAST(1 AS BOOLEAN) AS INT) AS c_int1,
              CAST(CAST(-7 AS BOOLEAN) AS INT) AS c_intneg,
              CAST(true AND NULL AS INT) AS and_null,
              CAST(false AND NULL AS INT) AS false_and_null,
              CAST(true OR NULL AS INT) AS true_or_null""",
    """SELECT 1 AS c_t, 0 AS c_f, 1 AS c_yes, 0 AS c_no, 1 AS c_y,
              1 AS c_1, 0 AS c_0, 1 AS c_true_uc, 1 AS c_true_ws,
              CAST(NULL AS INT) AS c_2, CAST(NULL AS INT) AS c_on,
              1 AS c_int1, 1 AS c_intneg, CAST(NULL AS INT) AS and_null,
              0 AS false_and_null, 1 AS true_or_null""")

  /** Named WINDOW clause (reference: sql-tests/inputs/window.sql +
    * postgreSQL/window_part1.sql): one ordered window shared by an
    * aggregate and a rank function, plus an unordered whole-partition
    * window — the planner must fold both references of `w` into ONE
    * window operator (two would double the sort). */
  val namedWindow = QueryDef.sqlSame(
    "q_golden_named_window",
    """SELECT g, x,
              CAST(sum(x) OVER w AS BIGINT) AS running,
              CAST(rank() OVER w AS BIGINT) AS rk,
              CAST(count(*) OVER w2 AS BIGINT) AS n_part
       FROM (VALUES ('a', 1), ('a', 2), ('a', 3), ('b', 10), ('b', 20))
            t(g, x)
       WINDOW w AS (PARTITION BY g ORDER BY x),
              w2 AS (PARTITION BY g)""")

  /** OUTER generators (reference: sql-tests/inputs/table-valued-functions
    * .sql LATERAL VIEW OUTER): explode_outer/posexplode_outer must PRESERVE
    * the parent row with NULL output for empty and NULL arrays — the
    * "don't drop documents with no extracted spans" semantics. DuckDB has
    * no outer unnest, so the oracle substitutes a [NULL] sentinel list. */
  val outerGenerators = QueryDef.sql(
    "q_golden_outer_generators",
    """SELECT id, w, p, pw FROM (
         SELECT id, explode_outer(l) AS w, NULL AS p, NULL AS pw
         FROM (VALUES (1, array('a','b')),
                      (2, CAST(array() AS ARRAY<STRING>)),
                      (3, CAST(NULL AS ARRAY<STRING>))) t(id, l)
         UNION ALL
         SELECT id, NULL AS w, CAST(pe.p AS BIGINT) AS p, pe.pw
         FROM (VALUES (1, array('a','b')),
                      (2, CAST(array() AS ARRAY<STRING>)),
                      (3, CAST(NULL AS ARRAY<STRING>))) t(id, l)
         LATERAL VIEW OUTER posexplode(l) pe AS p, pw)""",
    """SELECT id, w, p, pw FROM (
         SELECT id, u.w AS w, NULL AS p, NULL AS pw
         FROM (VALUES (1, ['a','b']), (2, []), (3, NULL)) t(id, l),
              unnest(CASE WHEN l IS NULL OR len(l) = 0 THEN [NULL]
                          ELSE l END) AS u(w)
         UNION ALL
         SELECT id, NULL AS w, s.e['p'] AS p, s.e['pw'] AS pw
         FROM (VALUES (1, ['a','b']), (2, []), (3, NULL)) t(id, l),
              unnest(CASE WHEN l IS NULL OR len(l) = 0
                          THEN [{'p': CAST(NULL AS BIGINT),
                                 'pw': CAST(NULL AS VARCHAR)}]
                          ELSE list_transform(range(1, len(l) + 1),
                                 i -> {'p': CAST(i - 1 AS BIGINT),
                                       'pw': l[i]}) END) AS s(e))""")

  /** Operator precedence battery (reference: sql-tests/inputs/operators
    * .sql): * / % over + -, unary minus binding tighter than %, left
    * associativity of -, NOT over AND over OR, and || chaining. All
    * integer results cast to BIGINT so both engines agree on width. */
  val opPrecedence = QueryDef.sqlSame(
    "q_golden_op_precedence",
    """SELECT CAST(2 + 3 * 4 AS BIGINT)   AS mul_first,
              CAST((2 + 3) * 4 AS BIGINT) AS paren_first,
              CAST(10 - 4 - 3 AS BIGINT)  AS left_assoc,
              CAST(2 * 7 % 4 AS BIGINT)   AS mulmod_ltr,
              CAST(-2 % 3 AS BIGINT)      AS unary_mod,
              CAST(-2 * 3 AS BIGINT)      AS unary_mul,
              (NOT TRUE) AND FALSE        AS not_and,
              NOT (TRUE AND FALSE)        AS not_paren,
              TRUE OR FALSE AND FALSE     AS and_first,
              (TRUE OR FALSE) AND FALSE   AS or_paren,
              'a' || 'b' || 'c'           AS concat_chain""")

  /** grouping_id under CUBE with a HAVING gate on it (reference:
    * sql-tests/inputs/group-analytics.sql + grouping_set.sql): keep only
    * the base cells (gid 0) and the grand total (gid 3) — the "detail +
    * total, no marginals" report. Spark spells it grouping_id(a, b);
    * DuckDB GROUPING(a, b); the bit numbering (first arg = MSB) must
    * agree. */
  val groupingIdFilter = QueryDef.sql(
    "q_golden_grouping_id",
    """SELECT a, b, CAST(grouping_id(a, b) AS BIGINT) AS gid,
              CAST(sum(x) AS BIGINT) AS s
       FROM (VALUES ('p','q',1), ('p','r',2), ('z','q',4)) t(a, b, x)
       GROUP BY CUBE(a, b)
       HAVING grouping_id(a, b) IN (0, 3)""",
    """SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS gid,
              CAST(sum(x) AS BIGINT) AS s
       FROM (VALUES ('p','q',1), ('p','r',2), ('z','q',4)) t(a, b, x)
       GROUP BY CUBE(a, b)
       HAVING GROUPING(a, b) IN (0, 3)""")

  /** Nested bracketed comments (reference: sql-tests/inputs/comments.sql):
    * SQL-2016 bracketed comments NEST — the lexer must track depth, not
    * stop at the first `*``/`. Rides with a line comment to pin both
    * styles in one statement. */
  val nestedComments = QueryDef.sqlSame(
    "q_golden_nested_comments",
    """SELECT /* outer /* nested */ still outer */ 1 AS a, -- line tail
              2 AS b""")

  /** Date/timestamp series generation (reference: sql-tests/inputs/
    * datetime.sql sequence rows): inclusive endpoints in BOTH engines
    * (Spark `sequence`, DuckDB `generate_series` — DuckDB `range` is
    * end-EXCLUSIVE, a real porting trap), ascending day/week steps,
    * descending with a negative step, and a month step anchored mid-month.
    * Month steps from day 29–31 are deliberately absent: Spark computes
    * start + i·interval (no clamp propagation) while DuckDB adds to the
    * previous element (clamp propagates), so engines legitimately diverge
    * there — the portable subset is pinned, the trap documented. */
  val dateSequence = QueryDef.sql(
    "q_golden_date_sequence",
    """SELECT CAST(d3 AS STRING) AS d3, CAST(wk AS STRING) AS wk,
              CAST(dn AS STRING) AS dn, CAST(mo AS STRING) AS mo FROM (
         SELECT explode(sequence(DATE'2024-02-26', DATE'2024-03-04',
                                 INTERVAL '3' DAY)) AS d3,
                NULL AS wk, NULL AS dn, NULL AS mo
         UNION ALL
         SELECT NULL, explode(sequence(DATE'2024-01-01', DATE'2024-01-22',
                                       INTERVAL '7' DAY)), NULL, NULL
         UNION ALL
         SELECT NULL, NULL,
                explode(sequence(DATE'2024-01-10', DATE'2024-01-04',
                                 INTERVAL '-2' DAY)), NULL
         UNION ALL
         SELECT NULL, NULL, NULL,
                explode(sequence(DATE'2023-11-15', DATE'2024-02-15',
                                 INTERVAL '1' MONTH)))""",
    """SELECT d3, wk, dn, mo FROM (
         SELECT CAST(CAST(unnest(generate_series(DATE '2024-02-26',
                  DATE '2024-03-04', INTERVAL '3' DAY)) AS DATE)
                  AS VARCHAR) AS d3,
                CAST(NULL AS VARCHAR) AS wk, CAST(NULL AS VARCHAR) AS dn,
                CAST(NULL AS VARCHAR) AS mo
         UNION ALL
         SELECT NULL, CAST(CAST(unnest(generate_series(DATE '2024-01-01',
                  DATE '2024-01-22', INTERVAL '7' DAY)) AS DATE)
                  AS VARCHAR), NULL, NULL
         UNION ALL
         SELECT NULL, NULL,
                CAST(CAST(unnest(generate_series(DATE '2024-01-10',
                  DATE '2024-01-04', INTERVAL '-2' DAY)) AS DATE)
                  AS VARCHAR), NULL
         UNION ALL
         SELECT NULL, NULL, NULL,
                CAST(CAST(unnest(generate_series(DATE '2023-11-15',
                  DATE '2024-02-15', INTERVAL '1' MONTH)) AS DATE)
                  AS VARCHAR))""")

  /** IS [NOT] DISTINCT FROM — the SQL-standard spelling of null-safe
    * comparison (reference: sql-tests/inputs/predicate-functions.sql;
    * Spark also spells it `<=>`, pinned in q_expr_nullsafe): NULL vs NULL
    * is NOT DISTINCT, NULL vs value IS DISTINCT, and the predicate never
    * returns NULL — usable in WHERE without tri-state surprises. */
  val distinctFrom = QueryDef.sqlSame(
    "q_golden_distinct_from",
    """SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
              a IS DISTINCT FROM b     AS dist,
              a IS NOT DISTINCT FROM b AS same,
              (a IS DISTINCT FROM b) IS NULL AS never_null
       FROM (VALUES (1, 1), (1, 2), (1, NULL), (NULL, 1), (NULL, NULL))
            t(a, b)""")

  /** Aggregates over EMPTY input (reference: sql-tests/inputs/group-by.sql
    * empty-table rows): a GLOBAL aggregate over zero rows returns ONE row
    * (count 0, sum/min/avg/bool_and NULL); the same aggregate WITH a group
    * key returns ZERO rows. Both directions pinned in one result. */
  val aggEmptyInput = QueryDef.sqlSame(
    "q_golden_agg_empty_input",
    """SELECT shape, n, s, mn, av, ba FROM (
         SELECT 'global' AS shape, count(*) AS n,
                CAST(sum(x) AS BIGINT) AS s, CAST(min(x) AS BIGINT) AS mn,
                avg(x) AS av, CAST(bool_and(x > 0) AS INT) AS ba
         FROM (SELECT 1 AS x WHERE 1 = 0)
         UNION ALL
         SELECT 'grouped', count(*), CAST(sum(x) AS BIGINT),
                CAST(min(x) AS BIGINT), avg(x), CAST(bool_and(x > 0) AS INT)
         FROM (SELECT 1 AS g, 1 AS x WHERE 1 = 0)
         GROUP BY g)""")

  /** String battery 2 (reference: sql-tests/inputs/string-functions.sql):
    * repeat (0 and negative counts → empty), reverse, left/right with
    * overshoot and negative counts, position (Spark instr / DuckDB
    * strpos, 1-based, 0 when absent), startswith/endswith/contains
    * (different spellings), and substring with negative length. */
  val stringFns2 = QueryDef.sql(
    "q_golden_string_fns2",
    """SELECT repeat('ab', 3)        AS rep3,
              repeat('ab', 0)        AS rep0,
              reverse('graft')       AS rev,
              left('spark', 3)       AS l3,
              left('spark', 9)       AS l_over,
              right('spark', 2)      AS r2,
              CAST(instr('banana', 'na') AS BIGINT)  AS pos_hit,
              CAST(instr('banana', 'xy') AS BIGINT)  AS pos_miss,
              startswith('graft', 'gr') AS sw,
              endswith('graft', 'ft')   AS ew,
              contains('graft', 'raf')  AS ct,
              substring('abcdef', 3)    AS sub_tail""",
    """SELECT repeat('ab', 3)        AS rep3,
              repeat('ab', 0)        AS rep0,
              reverse('graft')       AS rev,
              left('spark', 3)       AS l3,
              left('spark', 9)       AS l_over,
              right('spark', 2)      AS r2,
              CAST(strpos('banana', 'na') AS BIGINT) AS pos_hit,
              CAST(strpos('banana', 'xy') AS BIGINT) AS pos_miss,
              starts_with('graft', 'gr') AS sw,
              ends_with('graft', 'ft')   AS ew,
              contains('graft', 'raf')   AS ct,
              substring('abcdef', 3)     AS sub_tail""")

  /** Array search semantics (reference: sql-tests/inputs/array.sql):
    * array_position is 1-based and returns 0 (not NULL) on a miss —
    * matching DuckDB's list_position — while array_contains and
    * arrays_overlap are THREE-VALUED: a miss over an array that contains
    * NULL is NULL ("can't rule it out"), a hit is true even beside NULLs,
    * a miss with no NULLs is false. DuckDB's list_contains/list_has_any
    * are two-valued (the miss-with-NULL rows return false there), so the
    * oracle pins Spark's ANSI answer as literals on exactly those rows
    * and computes the rest. */
  val arraySearch = QueryDef.sql(
    "q_golden_array_search",
    """SELECT CAST(array_position(array('a','b','c'), 'b') AS BIGINT)
                AS pos_hit,
              CAST(array_position(array('a','b','c'), 'z') AS BIGINT)
                AS pos_miss,
              CAST(array_contains(array('a', NULL), 'a') AS INT)
                AS ct_hit_null,
              CAST(array_contains(array('a', NULL), 'z') AS INT)
                AS ct_miss_null,
              CAST(array_contains(array('a', 'b'), 'z') AS INT) AS ct_miss,
              CAST(arrays_overlap(array('a'), array('a', NULL)) AS INT)
                AS ov_hit,
              CAST(arrays_overlap(array('a', NULL), array('z')) AS INT)
                AS ov_miss_null,
              CAST(arrays_overlap(array('a'), array('z')) AS INT)
                AS ov_miss""",
    """SELECT CAST(list_position(['a','b','c'], 'b') AS BIGINT) AS pos_hit,
              CAST(list_position(['a','b','c'], 'z') AS BIGINT) AS pos_miss,
              CAST(list_contains(['a', NULL], 'a') AS INT) AS ct_hit_null,
              CAST(NULL AS INT)                            AS ct_miss_null,
              CAST(list_contains(['a','b'], 'z') AS INT)   AS ct_miss,
              CAST(list_has_any(['a'], ['a', NULL]) AS INT) AS ov_hit,
              CAST(NULL AS INT)                             AS ov_miss_null,
              CAST(list_has_any(['a'], ['z']) AS INT)       AS ov_miss""")

  /** NULL placement in array sorts (reference: sql-tests/inputs/array.sql
    * sort rows): sort_array ascending treats NULL as SMALLEST (first);
    * descending therefore puts it last; array_sort (the comparator form's
    * default) puts NULLs LAST even ascending. DuckDB spells the placement
    * explicitly in list_sort — the oracle states each one. */
  val arraySortNulls = QueryDef.sql(
    "q_golden_array_sort_nulls",
    // array_join(…, ',', '∅') flattens the list cells to STRING so the
    // driver's pandas comparator can sort them (list cells break its
    // sort_values); the '∅' null-replacement keeps the NULL slot visible.
    """SELECT array_join(sort_array(array('b', NULL, 'a')), ',', '∅')
                AS asc_nulls_first,
              array_join(sort_array(array('b', NULL, 'a'), false), ',', '∅')
                AS desc_nulls_last,
              array_join(array_sort(array('b', NULL, 'a')), ',', '∅')
                AS sort_nulls_last""",
    """SELECT array_to_string(list_transform(
                list_sort(['b', NULL, 'a'], 'ASC',  'NULLS FIRST'),
                x -> coalesce(x, '∅')), ',') AS asc_nulls_first,
              array_to_string(list_transform(
                list_sort(['b', NULL, 'a'], 'DESC', 'NULLS LAST'),
                x -> coalesce(x, '∅')), ',') AS desc_nulls_last,
              array_to_string(list_transform(
                list_sort(['b', NULL, 'a'], 'ASC',  'NULLS LAST'),
                x -> coalesce(x, '∅')), ',') AS sort_nulls_last""")

  /** C-style formatting (reference: sql-tests/inputs/string-functions.sql
    * format_string rows): zero-padded ints, strings, lowercase hex,
    * negatives, percent-literal escape. Spark spells it format_string,
    * DuckDB printf — both are C printf dialects. */
  val printfFormat = QueryDef.sql(
    "q_golden_printf",
    """SELECT format_string('%05d|%s|%x|%d|%d%%', 42, 'ab', 255, -7, 9)
                AS formatted,
              format_string('[%3d][%-3d]', 5, 5) AS padded""",
    """SELECT printf('%05d|%s|%x|%d|%d%%', 42, 'ab', 255, -7, 9)
                AS formatted,
              printf('[%3d][%-3d]', 5, 5) AS padded""")

  /** Binary codecs (reference: sql-tests/inputs/string-functions.sql
    * base64/hex rows): base64 and hex round-trips through BINARY and back
    * to the original string; hex digits are UPPERCASE in both engines
    * (letters z{ → 7A7B exercises the a–f range). */
  val binaryCodec = QueryDef.sql(
    "q_golden_binary_codec",
    """SELECT base64('ab')                          AS b64,
              CAST(unbase64('YWI=') AS STRING)      AS b64_rt,
              hex('z{')                             AS hx,
              CAST(unhex('7A7B') AS STRING)         AS hx_rt""",
    """SELECT to_base64('ab'::BLOB)                 AS b64,
              CAST(from_base64('YWI=') AS VARCHAR)  AS b64_rt,
              hex('z{')                             AS hx,
              CAST(unhex('7A7B') AS VARCHAR)        AS hx_rt""")

  /** Data-masking function battery (Spark 3.4+ `mask`): the built-in PII
    * redaction primitive a curation pipeline reaches for before the regex
    * scrubber — default X/x/n replacement classes, per-class overrides,
    * and NULL-means-keep per class. DuckDB has no `mask`, so the oracle
    * pins the exact outputs as literals (the same literal-pin pattern as
    * the array-search and bool-cast batteries). */
  val maskBattery = QueryDef.sql(
    "q_golden_mask",
    """SELECT mask('AbCD123-@$#') AS m_default,
              mask('abcd-EFGH-8765-4321', 'Q', 'q', 'd', 'o') AS m_custom,
              mask('Secret123', 'X', 'x', NULL) AS m_keep_digits,
              mask(CAST(NULL AS STRING)) AS m_null,
              mask('') AS m_empty""",
    """SELECT 'XxXXnnn-@$#' AS m_default,
              'qqqqoQQQQoddddodddd' AS m_custom,
              'Xxxxxx123' AS m_keep_digits,
              CAST(NULL AS VARCHAR) AS m_null,
              '' AS m_empty""")

  /** Radix conversion + checksum validation: `conv` across bases 2/10/16/36
    * with negative-radix signing, and `luhn_check` on valid/invalid payment
    * numbers — the record-validation corner of ingest QC. Literal-pinned
    * oracle (DuckDB's to_base has no from-radix sibling). */
  val convLuhn = QueryDef.sql(
    "q_golden_conv_luhn",
    """SELECT conv('100', 2, 10) AS c_bin_dec,
              conv('-10', 16, -10) AS c_signed,
              conv('ff', 16, 2) AS c_hex_bin,
              conv('zz', 36, 10) AS c_base36,
              luhn_check('8112189876') AS l_valid,
              luhn_check('79927398713') AS l_valid2,
              luhn_check('123') AS l_invalid""",
    """SELECT '4' AS c_bin_dec,
              '-16' AS c_signed,
              '11111111' AS c_hex_bin,
              '1295' AS c_base36,
              true AS l_valid,
              true AS l_valid2,
              false AS l_invalid""")

  /** URL form-encoding round-trip (`url_encode` spells space as '+', the
    * application/x-www-form-urlencoded convention, reserved chars as %XX),
    * phonetic soundex codes, initcap word casing, sentence tokenization
    * (via to_json — nested array<array<string>>), and the to_char /
    * to_number format-directed conversions incl. the '###' overflow fill
    * when the value has more decimal digits than the format. */
  val urlPhoneticFmt = QueryDef.sql(
    "q_golden_url_phonetic",
    """SELECT url_encode('a b&c=d/e?f') AS u_enc,
              url_decode('a+b%26c%3Dd') AS u_dec,
              soundex('Robert') AS sx1,
              soundex('Tymczak') AS sx2,
              initcap('spARK sql ENGINE') AS ic,
              to_json(sentences('Hi there! Good morning.')) AS sent,
              to_char(454.89, '999.9') AS tc_overflow,
              to_char(12454, '99,999') AS tc_grouped,
              CAST(to_number('$1,234.56', '$9,999.99') AS STRING) AS tn""",
    """SELECT 'a+b%26c%3Dd%2Fe%3Ff' AS u_enc,
              'a b&c=d' AS u_dec,
              'R163' AS sx1,
              'T522' AS sx2,
              'Spark Sql Engine' AS ic,
              '[["Hi","there"],["Good","morning"]]' AS sent,
              '###.#' AS tc_overflow,
              '12,454' AS tc_grouped,
              '1234.56' AS tn""")

  /** Spark 4 VARIANT semi-structured type: parse_json → typed path
    * extraction (variant_get with $.field / nested / array-index paths),
    * missing-path null, try_parse_json swallowing malformed input, to_json
    * canonicalization (Spark SORTS object keys — '{"z":1,"a":…}' comes back
    * a-first; DuckDB's json round-trip preserves input order, so that cell
    * is literal-pinned), and schema_of_variant's type inference (decimal
    * for 1.5, not double). Outputs are all cast to basic types — a VARIANT
    * column itself is not parquet-portable to the compare harness. */
  val variantType = QueryDef.sql(
    "q_golden_variant",
    """SELECT CAST(variant_get(parse_json('{"a": 1, "b": {"c": "x"}}'),
                               '$.a', 'int') AS INT) AS v_int,
              variant_get(parse_json('{"a": 1, "b": {"c": "x"}}'),
                          '$.b.c', 'string') AS v_nested,
              CAST(variant_get(parse_json('{"d": [1,2,3]}'),
                               '$.d[1]', 'long') AS BIGINT) AS v_arr_idx,
              variant_get(parse_json('{"a": 1}'),
                          '$.missing', 'string') AS v_missing,
              to_json(parse_json('{"z": 1, "a": [true, null]}'))
                AS v_canonical,
              to_json(try_parse_json('not json')) AS v_bad,
              schema_of_variant(parse_json('{"a": 1.5, "b": "x"}'))
                AS v_schema""",
    """SELECT CAST(json_extract('{"a": 1, "b": {"c": "x"}}', '$.a')
                   AS INT) AS v_int,
              json_extract_string('{"a": 1, "b": {"c": "x"}}', '$.b.c')
                AS v_nested,
              CAST(json_extract('{"d": [1,2,3]}', '$.d[1]') AS BIGINT)
                AS v_arr_idx,
              json_extract_string('{"a": 1}', '$.missing') AS v_missing,
              '{"a":[true,null],"z":1}' AS v_canonical,
              CAST(NULL AS VARCHAR) AS v_bad,
              'OBJECT<a: DECIMAL(2,1), b: STRING>' AS v_schema""")

  /** Spark 4 string collations: UTF8_LCASE comparison, ordering, and
    * DISTINCT folding. DuckDB emulates with lower() — except min-under-
    * collation, which must return an ORIGINAL string chosen by
    * case-insensitive order (arg_min on the folded key; the fixture values
    * fold uniquely so there is no tie to break). */
  val collationLcase = QueryDef.sql(
    "q_golden_collation",
    """SELECT 'Hello' COLLATE UTF8_LCASE = 'hello' AS eq_lcase,
              'a' COLLATE UTF8_LCASE < 'B' AS lt_lcase,
              'Hello' = 'hello' AS eq_binary,
              count(DISTINCT c COLLATE UTF8_LCASE) AS nd_lcase,
              count(DISTINCT c) AS nd_binary,
              min(c COLLATE UTF8_LCASE) AS min_lcase
       FROM (VALUES ('banana'), ('Apple'), ('BANANA'), ('cherry'))
            AS t(c)""",
    """SELECT true AS eq_lcase,
              true AS lt_lcase,
              false AS eq_binary,
              count(DISTINCT lower(c)) AS nd_lcase,
              count(DISTINCT c) AS nd_binary,
              arg_min(c, lower(c)) AS min_lcase
       FROM (VALUES ('banana'), ('Apple'), ('BANANA'), ('cherry'))
            AS t(c)""")

  /** months_between fractional semantics (whole when both ends are
    * month-last-days, else a 31-day-denominator fraction rounded to 8
    * digits, sign from operand order — DuckDB has no months_between, so
    * these are literal-pinned), width_bucket's histogram bucketing incl.
    * the underflow-0 / overflow-n+1 rails, bround's HALF_EVEN vs round's
    * HALF_UP on the .5 boundary (DuckDB spells the former round_even), and
    * factorial's exact int64 value at the 20! ceiling (computed on BOTH
    * engines — DuckDB has factorial). */
  val monthsWidthBucket = QueryDef.sql(
    "q_golden_months_width",
    """SELECT CAST(months_between(DATE '2022-03-31', DATE '2022-02-28')
                   AS STRING) AS mb_lastday,
              CAST(months_between(DATE '2022-03-15', DATE '2022-02-28')
                   AS STRING) AS mb_frac,
              CAST(months_between(DATE '2021-01-31', DATE '2021-02-01')
                   AS STRING) AS mb_neg,
              CAST(bround(2.5, 0) AS STRING) AS br_even_down,
              CAST(bround(3.5, 0) AS STRING) AS br_even_up,
              CAST(bround(-2.5, 0) AS STRING) AS br_even_neg,
              CAST(round(2.5, 0) AS STRING) AS r_half_up,
              factorial(20) AS f20,
              width_bucket(5.3, 0.2, 10.6, 5) AS wb_mid,
              width_bucket(-1.0, 0.2, 10.6, 5) AS wb_below,
              width_bucket(11.0, 0.2, 10.6, 5) AS wb_above""",
    """SELECT '1.0' AS mb_lastday,
              '0.58064516' AS mb_frac,
              '-0.03225806' AS mb_neg,
              '2' AS br_even_down,
              '4' AS br_even_up,
              '-2' AS br_even_neg,
              '3' AS r_half_up,
              CAST(factorial(20) AS BIGINT) AS f20,
              CAST(3 AS BIGINT) AS wb_mid,
              CAST(0 AS BIGINT) AS wb_below,
              CAST(6 AS BIGINT) AS wb_above""")

  /** SQL-standard timestamp constructors and unit arithmetic:
    * make_timestamp with fractional seconds (compared as epoch millis —
    * both engines construct it, but print it differently), timestampdiff
    * counting FULL elapsed units (Jan 31 → Feb 1 is 0 months; DuckDB's
    * date_diff counts boundary CROSSINGS and says 1 — the divergence is
    * the point, so the Spark convention is literal-pinned), timestampadd's
    * month-end clamp, elt positional pick, and format_number grouping. */
  val tsUnitArith = QueryDef.sql(
    "q_golden_ts_units",
    """SELECT unix_millis(make_timestamp(2021, 7, 11, 6, 30, 45.678))
                AS mts_ms,
              CAST(timestampdiff(MONTH, TIMESTAMP '2021-01-31 00:00:00',
                                 TIMESTAMP '2021-02-01 00:00:00')
                   AS BIGINT) AS td_cross_not_full,
              CAST(timestampdiff(MONTH, TIMESTAMP '2021-01-15 00:00:00',
                                 TIMESTAMP '2021-03-14 23:59:59')
                   AS BIGINT) AS td_almost_two,
              CAST(timestampadd(MONTH, 1, TIMESTAMP '2021-01-31 10:00:00')
                   AS STRING) AS ta_clamp,
              elt(2, 'a', 'b', 'c') AS elt_pick,
              format_number(1234567.891, 2) AS fmt_grouped""",
    """SELECT epoch_ms(make_timestamp(2021, 7, 11, 6, 30, 45.678))
                AS mts_ms,
              CAST(0 AS BIGINT) AS td_cross_not_full,
              CAST(1 AS BIGINT) AS td_almost_two,
              '2021-02-28 10:00:00' AS ta_clamp,
              'b' AS elt_pick,
              '1,234,567.89' AS fmt_grouped""")

  /** XML ingestion (Spark 4 ships from_xml natively — the fourth
    * semi-structured format after JSON/CSV/VARIANT): schema-directed
    * parsing with repeated-element arrays, the xpath extraction family
    * (string / typed int / boolean predicate / node-list), and
    * schema_of_xml inference. DuckDB has no XML support at all, so every
    * cell is literal-pinned; the from_xml result goes through to_json to
    * stay parquet-portable. */
  val xmlFns = QueryDef.sql(
    "q_golden_xml",
    """SELECT to_json(from_xml('<r><a>1</a><b>x</b><b>y</b></r>',
                               'a INT, b ARRAY<STRING>')) AS fx,
              xpath_string('<r><a>hello</a></r>', '/r/a') AS xs,
              array_join(xpath('<r><b>1</b><b>2</b></r>', '/r/b/text()'),
                         ',') AS xlist,
              CAST(xpath_int('<r><n>42</n></r>', '/r/n') AS INT) AS xi,
              xpath_boolean('<r><a>1</a></r>', '/r/a = 1') AS xb,
              schema_of_xml('<r><a>1</a><b>2.5</b></r>') AS sx""",
    """SELECT '{"a":1,"b":["x","y"]}' AS fx,
              'hello' AS xs,
              '1,2' AS xlist,
              CAST(42 AS INT) AS xi,
              true AS xb,
              'STRUCT<a: BIGINT, b: DOUBLE>' AS sx""")

  /** The SQL:2008 regexp report family (Spark 3.4+): regexp_count /
    * regexp_instr / regexp_substr / regexp_like, with the DuckDB oracle
    * COMPUTING the portable ones through its own regexp primitives
    * (len(regexp_extract_all), regexp_extract, regexp_matches) — only the
    * 1-based instr position is literal-pinned (DuckDB has no positional
    * regexp search). */
  val regexpReport = QueryDef.sql(
    "q_golden_regexp_report",
    """SELECT regexp_count('a1b22c333', '[0-9]+') AS rc,
              regexp_count('aaa', 'z') AS rc_zero,
              regexp_instr('hello world', 'o.l') AS ri,
              regexp_substr('price: 42 usd', '[0-9]+') AS rs,
              regexp_substr('no digits', '[0-9]+') AS rs_miss,
              regexp_like('abc123', '^[a-z]+[0-9]+$') AS rl,
              regexp_like('abc', '^[0-9]+$') AS rl_no""",
    """SELECT CAST(len(regexp_extract_all('a1b22c333', '[0-9]+')) AS INT)
                AS rc,
              CAST(len(regexp_extract_all('aaa', 'z')) AS INT) AS rc_zero,
              CAST(8 AS INT) AS ri,
              regexp_extract('price: 42 usd', '[0-9]+') AS rs,
              CASE WHEN regexp_matches('no digits', '[0-9]+')
                   THEN regexp_extract('no digits', '[0-9]+')
                   ELSE NULL END AS rs_miss,
              regexp_matches('abc123', '^[a-z]+[0-9]+$') AS rl,
              regexp_matches('abc', '^[0-9]+$') AS rl_no""")

  /** ORDER BY ALL (the DuckDB-origin shorthand Spark 4 adopted: sort by
    * every SELECT column left-to-right) — the sort-normalizing hash
    * compare can't see ordering, so the pin is LIMIT 1 over rows where
    * only the second column breaks the tie; plus derived-table COLUMN-LIST
    * aliasing `AS v(big, small)` with the sort keyed off an aliased column
    * the SELECT list drops (hidden-column ordering, materialized via
    * row_number). */
  val orderByAll = QueryDef.sqlSame(
    "q_golden_order_all",
    """SELECT * FROM (
         SELECT x, y FROM (VALUES (2, 'b'), (1, 'c'), (2, 'a')) AS t(x, y)
         ORDER BY ALL LIMIT 1) first_of_all
       CROSS JOIN (
         SELECT big, CAST(row_number() OVER (ORDER BY small) AS INT)
                  AS rn_hidden
         FROM (SELECT x * 10 AS big, y AS small
               FROM (VALUES (3, 'c'), (1, 'a'), (2, 'b')) AS raw(x, y))
              AS v(big, small)) hidden_order""")

  /** Unicode semantics: what IS portable (codepoint-counted length —
    * emoji 1, a 5-codepoint ZWJ family sequence 5, multibyte-aware
    * substring, codepoint-order reverse, ascii/chr at 233, octet vs bit vs
    * char length of a 2-byte char) and what is NOT — Java/ICU FULL case
    * mapping expands 'ß'→'SS' and the 'ﬁ' ligature→'FI' and lowercases
    * dotted-İ to i+combining-dot (2 codepoints), where DuckDB maps
    * 1:1 ('ẞ', 'ﬁ' unchanged, bare 'i'). The divergent cells pin Spark's
    * documented behavior as literals on the DuckDB side; the engine
    * promise is the JVM mapping. */
  val unicodeSemantics = QueryDef.sql(
    "q_golden_unicode",
    """SELECT length('straße') AS len_sz,
              length('👍') AS len_emoji,
              length('👨‍👩‍👧') AS len_zwj,
              substring('héllo', 2, 3) AS sub_acc,
              reverse('abc👍') AS rev,
              ascii('é') AS asc_e,
              chr(233) AS chr_e,
              octet_length('é') AS oct_e,
              bit_length('é') AS bit_e,
              upper('straße') AS up_full,
              upper('ﬁx') AS up_lig,
              lower('İ') = 'i' AS low_dotted_is_bare_i""",
    """SELECT CAST(length('straße') AS INT) AS len_sz,
              CAST(length('👍') AS INT) AS len_emoji,
              CAST(length('👨‍👩‍👧') AS INT) AS len_zwj,
              substring('héllo', 2, 3) AS sub_acc,
              reverse('abc👍') AS rev,
              CAST(ascii('é') AS INT) AS asc_e,
              chr(233) AS chr_e,
              CAST(octet_length(encode('é')) AS INT) AS oct_e,
              CAST(bit_length('é') AS INT) AS bit_e,
              'STRASSE' AS up_full,
              'FIX' AS up_lig,
              false AS low_dotted_is_bare_i""")

  /** Unicode NORMALIZATION (the graft `unicode_norm` kernel — Spark has
    * no builtin): NFC recomposes e+combining-acute (built portably from
    * its UTF-8 bytes via decode∘unhex, 5 codepoints) into precomposed
    * 'café' (4), is idempotent on composed input, and PRESERVES
    * compatibility characters (ﬁ ligature survives NFC); NFD re-expands;
    * NFKC additionally folds the ligature, full-width forms, superscripts
    * and circled digits to their compatibility equivalents; ASCII input
    * is the zero-copy identity. DuckDB computes the NFC half natively
    * (nfc_normalize) and pins the NFKC half as documented literals (it
    * has no NFKC). */
  val unicodeNorm = QueryDef.sql(
    "q_golden_unicode_norm",
    """SELECT length(dec_e) AS len_dec,
              length(unicode_norm(dec_e, 'NFC')) AS len_nfc,
              unicode_norm(dec_e, 'NFC') = comp_e AS nfc_recomposes,
              unicode_norm(comp_e, 'NFC') = comp_e AS nfc_idempotent,
              length(unicode_norm(comp_e, 'NFD')) AS len_nfd,
              unicode_norm('ﬁle', 'NFC') AS nfc_keeps_lig,
              unicode_norm('ﬁle', 'NFKC') AS nfkc_lig,
              unicode_norm('Ａ１', 'NFKC') AS nfkc_fullwidth,
              unicode_norm('x²', 'NFKC') AS nfkc_superscript,
              unicode_norm('①', 'NFKC') AS nfkc_circled,
              unicode_norm('plain ascii!', 'NFKC') AS ascii_identity
       FROM (SELECT concat('caf', 'e', decode(unhex('CC81'), 'UTF-8'))
                      AS dec_e,
                    'café' AS comp_e)""",
    """SELECT CAST(length(dec_e) AS INT) AS len_dec,
              CAST(length(nfc_normalize(dec_e)) AS INT) AS len_nfc,
              nfc_normalize(dec_e) = comp_e AS nfc_recomposes,
              nfc_normalize(comp_e) = comp_e AS nfc_idempotent,
              CAST(5 AS INT) AS len_nfd,
              'ﬁle' AS nfc_keeps_lig,
              'file' AS nfkc_lig,
              'A1' AS nfkc_fullwidth,
              'x2' AS nfkc_superscript,
              '1' AS nfkc_circled,
              'plain ascii!' AS ascii_identity
       FROM (SELECT 'caf' || 'e' || decode(unhex('CC81')) AS dec_e,
                    'café' AS comp_e)""")

  /** Spark 4 SQL scripting surface: session variables (DECLARE OR REPLACE
    * / SET VAR, referenced from query text), EXECUTE IMMEDIATE with a
    * named USING parameter, and the IDENTIFIER() clause resolving a table
    * name from that parameter — the parameterized-SQL toolkit. DuckDB has
    * none of the three; the oracle computes the same result directly. */
  val sqlScripting = QueryDef(
    "q_golden_sql_scripting",
    (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      spark.sql("DECLARE OR REPLACE VARIABLE graft_region INT DEFAULT 0")
      spark.sql("SET VAR graft_region = 1")
      spark.sql("""EXECUTE IMMEDIATE
        'SELECT graft_region AS region_var, graft_region * 2 AS region_x2,
                count(*) AS n_nations
         FROM IDENTIFIER(:tbl) WHERE n_regionkey = graft_region'
        USING 'nation' AS tbl""")
    },
    Some("""
      SELECT CAST(1 AS INT) AS region_var, CAST(2 AS INT) AS region_x2,
             count(*) AS n_nations
      FROM nation WHERE n_regionkey = 1"""))

  /** arrays_zip null-padding (shorter arrays pad the struct slot with
    * null — the third element keeps only field "0" in json), distinct-key
    * map_concat and map_from_entries construction (the duplicate-key
    * EXCEPTION policy is pinned in SemanticsSpec's error battery), and the
    * try_ siblings that close out the family: try_url_decode on a
    * malformed %-escape, try_to_timestamp both ways, try_mod by zero. All
    * literal-pinned (DuckDB's list_zip shapes json differently and has no
    * try_ family). */
  val arraysZipTry = QueryDef.sql(
    "q_golden_arrays_zip_try",
    """SELECT to_json(arrays_zip(array(1,2,3), array('a','b'))) AS az,
              to_json(map_concat(map('a',1,'b',2), map('c',3))) AS mc,
              to_json(map_from_entries(array(struct(1,'x'), struct(2,'y'))))
                AS mfe,
              try_url_decode('%zz') AS tud,
              CAST(try_to_timestamp('not a ts') AS STRING) AS tts_bad,
              CAST(try_to_timestamp('2021-07-11 06:30:45') AS STRING)
                AS tts_ok,
              try_mod(7, 0) AS tmod""",
    """SELECT '[{"0":1,"1":"a"},{"0":2,"1":"b"},{"0":3}]' AS az,
              '{"a":1,"b":2,"c":3}' AS mc,
              '{"1":"x","2":"y"}' AS mfe,
              CAST(NULL AS VARCHAR) AS tud,
              CAST(NULL AS VARCHAR) AS tts_bad,
              '2021-07-11 06:30:45' AS tts_ok,
              CAST(NULL AS INT) AS tmod""")

  /** ANSI interval-type breadth beyond the timestamp-shift basics: the TWO
    * Spark interval families (year-month vs day-time, each with its
    * multi-field literal form and canonical string rendering), interval
    * division and scalar multiplication staying inside the family,
    * EXTRACT from an interval, cross-unit comparison (1 day > 23 hours),
    * and date subtraction producing a DAY interval. DuckDB has one
    * unified interval type with different rendering, so every cell is
    * literal-pinned to Spark's documented output. */
  val intervalBreadth = QueryDef.sql(
    "q_golden_interval_types",
    """SELECT CAST(INTERVAL '1-2' YEAR TO MONTH AS STRING) AS ym_lit,
              CAST(INTERVAL '3 04:05:06' DAY TO SECOND AS STRING) AS dt_lit,
              CAST(INTERVAL '10' HOUR / 4 AS STRING) AS dt_div,
              CAST(INTERVAL 2 MONTH * 3 AS STRING) AS ym_mul,
              CAST(extract(HOUR FROM INTERVAL '3 04:05:06' DAY TO SECOND)
                   AS INT) AS ext_hour,
              INTERVAL 1 DAY > INTERVAL 23 HOUR AS day_gt_23h,
              CAST(DATE '2021-03-01' - DATE '2021-02-27' AS STRING)
                AS date_diff_iv,
              CAST(INTERVAL '1' MONTH + INTERVAL '1' MONTH AS STRING)
                AS ym_add""",
    """SELECT 'INTERVAL ''1-2'' YEAR TO MONTH' AS ym_lit,
              'INTERVAL ''3 04:05:06'' DAY TO SECOND' AS dt_lit,
              'INTERVAL ''0 02:30:00'' DAY TO SECOND' AS dt_div,
              'INTERVAL ''0-6'' YEAR TO MONTH' AS ym_mul,
              CAST(4 AS INT) AS ext_hour,
              true AS day_gt_23h,
              'INTERVAL ''2'' DAY' AS date_diff_iv,
              'INTERVAL ''2'' MONTH' AS ym_add""")

  /** Lambda scoping in higher-order functions — inner variables SHADOW
    * outer ones of the same name, and non-shadowed outer variables are
    * captured as closures — computed on both engines (Spark transform vs
    * DuckDB list_transform: same scoping rules, pinned equal); the
    * (element, index) lambda arity with its 0-based index (DuckDB has no
    * index form — literal); and the regex-ENGINE boundary: Java regex
    * supports lookahead/lookbehind, DuckDB's RE2 matches nothing for the
    * same pattern — the Spark behavior is the engine promise, pinned as
    * literals. */
  val lambdaScopeRegex = QueryDef.sql(
    "q_golden_lambda_scope",
    """SELECT to_json(transform(array(1,2),
                x -> transform(array(10,20), x -> x + 1))) AS shadow,
              to_json(transform(array(1,2),
                x -> transform(array(10,20), y -> x * 100 + y)))
                AS capture,
              to_json(transform(array(1,2,3), (x, i) -> x * 10 + i))
                AS with_idx,
              to_json(filter(array(1,2,3,4), (x, i) -> i % 2 = 0))
                AS filter_idx,
              regexp_extract('foobar', 'foo(?=bar)', 0) AS lookahead,
              regexp_extract('price 42 and 7', '(?<!4)\\d', 0)
                AS lookbehind""",
    """SELECT to_json(list_transform([1,2],
                x -> list_transform([10,20], x -> x + 1))) AS shadow,
              to_json(list_transform([1,2],
                x -> list_transform([10,20], y -> x * 100 + y)))
                AS capture,
              '[10,21,32]' AS with_idx,
              '[1,3]' AS filter_idx,
              'foo' AS lookahead,
              '4' AS lookbehind""")

  // ------------------------------------------------------------- batch 21

  /** SQL:2011 window frame EXCLUDE semantics. Spark 4's grammar has NO
    * EXCLUDE clause (SqlBaseParser.windowFrame carries only frame bounds —
    * verified against the 4.1.2 parser), so the engine's portable spelling
    * is frame arithmetic: EXCLUDE CURRENT ROW = frame sum − x, EXCLUDE
    * GROUP = total − peer-group sum, EXCLUDE TIES = total − peers + x.
    * The DuckDB oracle runs the NATIVE EXCLUDE clause, so this golden
    * proves the emulation implements the standard's semantics exactly. */
  lazy val windowExclude = QueryDef.sql(
    "q_golden_window_exclude",
    """WITH t AS (SELECT x, g FROM VALUES
         (1,1),(2,1),(3,2),(4,2),(5,2),(6,3) AS v(x, g))
       SELECT x,
         CAST(sum(x) OVER (ORDER BY x
                ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) - x AS BIGINT)
           AS s_excl_cur,
         CAST(sum(x) OVER () - sum(x) OVER (PARTITION BY g) AS BIGINT)
           AS s_excl_grp,
         CAST(sum(x) OVER () - sum(x) OVER (PARTITION BY g) + x AS BIGINT)
           AS s_excl_ties,
         CAST(sum(x) OVER () AS BIGINT) AS s_no_others
       FROM t""",
    """WITH t(x, g) AS (VALUES (1,1),(2,1),(3,2),(4,2),(5,2),(6,3))
       SELECT x,
         CAST(sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND
              1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS s_excl_cur,
         CAST(sum(x) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND
              UNBOUNDED FOLLOWING EXCLUDE GROUP) AS BIGINT) AS s_excl_grp,
         CAST(sum(x) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND
              UNBOUNDED FOLLOWING EXCLUDE TIES) AS BIGINT) AS s_excl_ties,
         CAST(sum(x) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND
              UNBOUNDED FOLLOWING EXCLUDE NO OTHERS) AS BIGINT)
           AS s_no_others
       FROM t""")

  /** TABLESAMPLE row-count invariants: the spellings are engine-specific
    * (Spark TABLESAMPLE (n ROWS / p PERCENT), DuckDB USING SAMPLE), so the
    * oracle pins the COUNTS, which the standard fixes: n ROWS yields
    * exactly n (corpus permitting), 100 PERCENT yields everything, 0
    * PERCENT yields nothing. Seeded REPEATABLE determinism is pinned in
    * SemanticsSpec (two runs, identical row sets). */
  lazy val tablesamplePins = QueryDef(
    "q_golden_tablesample",
    (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      spark.sql("""
        SELECT (SELECT count(*) FROM lineitem TABLESAMPLE (50 ROWS))
                 AS n_rows50,
               (SELECT count(*) FROM lineitem TABLESAMPLE (100 PERCENT))
                 AS n_pct100,
               (SELECT count(*) FROM lineitem TABLESAMPLE (0 PERCENT))
                 AS n_pct0,
               (SELECT count(*) FROM lineitem) AS n_all""")
    },
    Some("""
      SELECT 50 AS n_rows50, count(*) AS n_pct100, 0 AS n_pct0,
             count(*) AS n_all
      FROM lineitem"""))

  /** LATERAL VIEW OUTER json_tuple: the multi-path JSON generator the
    * reference whitelists only as row-fallback (get_json_object family).
    * Pins: present key, missing key → NULL, malformed JSON → all-NULL row
    * KEPT (OUTER), NULL input → all-NULL row kept. Constant inputs, so
    * the DuckDB oracle is the literal truth table. */
  lazy val lateralJsonTuple = QueryDef.sql(
    "q_golden_lateral_json_tuple",
    """SELECT id, a, b
       FROM (SELECT id, js FROM VALUES
              (1, '{"a":"x","b":"y"}'),
              (2, '{"a":"only_a"}'),
              (3, 'not json'),
              (4, CAST(NULL AS STRING)) AS t(id, js))
       LATERAL VIEW OUTER json_tuple(js, 'a', 'b') jt AS a, b""",
    """SELECT id, a, b FROM (VALUES
        (1, 'x', 'y'),
        (2, 'only_a', NULL),
        (3, NULL, NULL),
        (4, NULL, NULL)) t(id, a, b)""")

  /** stack() with a non-rectangular argument list: trailing cells of the
    * last row are NULL-padded (stack(3, …5 values) → (1,2),(3,4),(5,NULL)),
    * and mixed-type columns widen per column, not per call. */
  lazy val stackPadding = QueryDef.sql(
    "q_golden_stack_padding",
    """SELECT CAST(c0 AS INT) AS c0, CAST(c1 AS INT) AS c1
       FROM (SELECT 1) LATERAL VIEW stack(3, 1, 2, 3, 4, 5) s AS c0, c1""",
    """SELECT c0, c1 FROM (VALUES (1, 2), (3, 4), (5, NULL)) t(c0, c1)""")

  /** DISTRIBUTE BY / CLUSTER BY: physical-layout directives that must not
    * change query CONTENT (the plan shape — hash exchange, local sort, no
    * global sort — is pinned in PlanAuditSpec). The oracle is the plain
    * projection. */
  lazy val distributeBy = QueryDef(
    "q_golden_distribute_by",
    (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      spark.sql("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_orderkey < 200
        CLUSTER BY l_orderkey""")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem WHERE l_orderkey < 200"""))

  // ------------------------------------------------------------- batch 22

  /** Calendar-name + part-extraction battery (Spark 3.5/4 fns): dayname/
    * monthname emit the ABBREVIATED English names (DuckDB's same-named
    * functions emit full names — each cell literal-pinned to the Spark
    * contract), weekday is 0=Monday (vs extract(DOW) 0=Sunday — both
    * pinned), date_part mirrors extract, and try_make_timestamp swallows
    * the Feb-30 error into NULL where make_timestamp raises. */
  lazy val calendarNames = QueryDef.sql(
    "q_golden_calendar_names",
    """SELECT dayname(DATE'2021-03-05')   AS dn,
              monthname(DATE'2021-03-05') AS mn,
              CAST(weekday(DATE'2021-03-05') AS INT) AS wd_mon0,
              CAST(dayofweek(DATE'2021-03-05') AS INT) AS dow_sun1,
              CAST(date_part('hour', TIMESTAMP'2021-01-01 10:30:00') AS INT)
                AS dp_hour,
              CAST(date_part('quarter', DATE'2021-08-14') AS INT) AS dp_q,
              CAST(try_make_timestamp(2021, 2, 30, 0, 0, 0) AS STRING)
                AS bad_ts""",
    """SELECT 'Fri' AS dn, 'Mar' AS mn,
              4 AS wd_mon0, 6 AS dow_sun1,
              CAST(date_part('hour', TIMESTAMP '2021-01-01 10:30:00') AS INT)
                AS dp_hour,
              CAST(date_part('quarter', DATE '2021-08-14') AS INT) AS dp_q,
              CAST(NULL AS VARCHAR) AS bad_ts""")

  /** equal_null + ILIKE: the null-safe equality FUNCTION spelling (same
    * semantics as <=>, DuckDB IS NOT DISTINCT FROM) and case-insensitive
    * LIKE with an explicit escape — both engines compute. */
  lazy val equalNullIlike = QueryDef.sql(
    "q_golden_equal_null_ilike",
    """SELECT equal_null(NULL, NULL)          AS en_nn,
              equal_null(NULL, 1)             AS en_n1,
              equal_null(1, 1)                AS en_11,
              'AbC' ILIKE 'ab%'               AS il_hit,
              'AbC' ILIKE 'ab'                AS il_miss,
              '50%' ILIKE '50!%' ESCAPE '!'   AS il_esc,
              'AbC' LIKE 'ab%'                AS like_case""",
    """SELECT (NULL IS NOT DISTINCT FROM NULL) AS en_nn,
              (NULL IS NOT DISTINCT FROM 1)    AS en_n1,
              (1 IS NOT DISTINCT FROM 1)       AS en_11,
              'AbC' ILIKE 'ab%'                AS il_hit,
              'AbC' ILIKE 'ab'                 AS il_miss,
              ilike_escape('50%', '50!%', '!') AS il_esc,
              'AbC' LIKE 'ab%'                 AS like_case""")

  /** Timezone conversion + microsecond epochs (Spark 3.4+): DST-aware
    * wall-clock shifts both directions across the spring-forward boundary,
    * and unix_micros/timestamp_micros round-tripping. The tz database is
    * engine-specific, so the DuckDB cells are literal-pinned to the IANA
    * contract. */
  lazy val tzConvert = QueryDef.sql(
    "q_golden_tz_convert",
    """SELECT CAST(convert_timezone('UTC', 'America/Los_Angeles',
                TIMESTAMP'2021-01-15 12:00:00') AS STRING) AS la_winter,
              CAST(convert_timezone('UTC', 'America/Los_Angeles',
                TIMESTAMP'2021-07-15 12:00:00') AS STRING) AS la_summer,
              CAST(convert_timezone('Asia/Kolkata', 'UTC',
                TIMESTAMP'2021-01-15 12:00:00') AS STRING) AS from_ist,
              CAST(unix_micros(TIMESTAMP'1970-01-02 00:00:00') AS BIGINT)
                AS um_day1,
              CAST(timestamp_micros(86400000000) AS STRING) AS tm_rt""",
    """SELECT '2021-01-15 04:00:00' AS la_winter,
              '2021-07-15 05:00:00' AS la_summer,
              '2021-01-15 06:30:00' AS from_ist,
              CAST(86400000000 AS BIGINT) AS um_day1,
              '1970-01-02 00:00:00' AS tm_rt""")

  /** JSON introspection (Spark 3.1+ fns): json_object_keys (flattened —
    * list outputs stay out of the harness), json_array_length on nested
    * and malformed input, and the get_json_object bracket-path edge. */
  lazy val jsonIntrospect = QueryDef.sql(
    "q_golden_json_introspect",
    """SELECT array_join(json_object_keys('{"a":1,"b":{"c":2}}'), ',')
                AS keys_top,
              CAST(json_array_length('[1,2,[3,4]]') AS INT) AS len_top,
              CAST(json_array_length('{"a":1}') AS INT)     AS len_obj,
              CAST(json_array_length('not json') AS INT)    AS len_bad,
              get_json_object('{"a.b":5}', "$['a.b']")      AS bracket_path,
              get_json_object('{"a":[10,20]}', '$.a[1]')    AS idx_path""",
    """SELECT 'a,b' AS keys_top,
              3 AS len_top,
              CAST(NULL AS INT) AS len_obj,
              CAST(NULL AS INT) AS len_bad,
              '5' AS bracket_path,
              '20' AS idx_path""")

  /** Bitmap exact-distinct function family (Spark 3.5+): bitmap_count ∘
    * bitmap_construct_agg ≡ COUNT(DISTINCT), bitmap_bucket_number
    * splits the key space at 32768, and bit_get reads single bits — the
    * scalar surface under q_agg_bitmap_distinct's aggregate. */
  lazy val bitmapFns = QueryDef.sql(
    "q_golden_bitmap_fns",
    """SELECT CAST(bitmap_count(bitmap_construct_agg(
                bitmap_bit_position(x))) AS BIGINT) AS nd,
              CAST(min(bitmap_bucket_number(1)) AS BIGINT)     AS bkt1,
              CAST(min(bitmap_bucket_number(32769)) AS BIGINT) AS bkt2,
              CAST(min(bit_get(5, 0)) AS INT) AS b0,
              CAST(min(bit_get(5, 1)) AS INT) AS b1
       FROM VALUES (1), (2), (2), (99), (1) AS t(x)""",
    """SELECT count(DISTINCT x) AS nd,
              CAST(1 AS BIGINT) AS bkt1, CAST(2 AS BIGINT) AS bkt2,
              1 AS b0, 0 AS b1
       FROM (VALUES (1), (2), (2), (99), (1)) t(x)""")

  /** The last uncovered string-search trio + AES-ECB: substring_index
    * (positive = prefix through nth delimiter, negative = suffix),
    * find_in_set 1-based position with 0-miss and the comma-poisoning
    * rule (needle containing ',' never matches), locate with a start
    * offset, and an aes_encrypt/aes_decrypt ECB round-trip (deterministic
    * mode — GCM's random IV could never be oracle-checked) with the
    * PKCS7-padded ciphertext length pinned. DuckDB computes the trio via
    * split_part/list_position/position; AES cells are literal. */
  lazy val stringSearchAes = QueryDef.sql(
    "q_golden_string_search_aes",
    """SELECT substring_index('a.b.c.d', '.', 2)  AS si_pos,
              substring_index('a.b.c.d', '.', -1) AS si_neg,
              substring_index('abc', '.', 2)      AS si_nodelim,
              CAST(find_in_set('b', 'a,b,c') AS INT)  AS fis_hit,
              CAST(find_in_set('z', 'a,b,c') AS INT)  AS fis_miss,
              CAST(find_in_set('a,b', 'a,b,c') AS INT) AS fis_comma,
              CAST(locate('b', 'abcabc') AS INT)      AS loc_first,
              CAST(locate('b', 'abcabc', 3) AS INT)   AS loc_from3,
              CAST(locate('z', 'abcabc') AS INT)      AS loc_miss,
              CAST(aes_decrypt(aes_encrypt('Spark', 'abcdefghijklmnop',
                'ECB'), 'abcdefghijklmnop', 'ECB') AS STRING) AS aes_rt,
              CAST(octet_length(aes_encrypt('Spark', 'abcdefghijklmnop',
                'ECB')) AS INT) AS aes_len""",
    """SELECT split_part('a.b.c.d', '.', 1) || '.' ||
                split_part('a.b.c.d', '.', 2)       AS si_pos,
              split_part('a.b.c.d', '.', 4)         AS si_neg,
              'abc'                                 AS si_nodelim,
              CAST(list_position(str_split('a,b,c', ','), 'b') AS INT)
                AS fis_hit,
              CAST(coalesce(list_position(str_split('a,b,c', ','), 'z'), 0)
                AS INT) AS fis_miss,
              0 AS fis_comma,
              CAST(position('b' IN 'abcabc') AS INT) AS loc_first,
              5 AS loc_from3,
              CAST(position('z' IN 'abcabc') AS INT) AS loc_miss,
              'Spark' AS aes_rt,
              16 AS aes_len""")

  val all: Seq[QueryDef] = Seq(
    windowExclude, tablesamplePins, lateralJsonTuple, stackPadding,
    distributeBy, stringSearchAes,
    calendarNames, equalNullIlike, tzConvert, jsonIntrospect, bitmapFns,
    namedWindow, outerGenerators, opPrecedence, groupingIdFilter,
    nestedComments, dateSequence, distinctFrom, aggEmptyInput, stringFns2,
    arraySearch, arraySortNulls, printfFormat, binaryCodec,
    typedLiterals, fromCsv, charVarchar, timezoneConv, jsonPath, floatEdge,
    parseUrl, miscTypeof, countEdge, complexCompare, colResolution,
    havingNoGroupBy, boolCast,
    valuesTable, emptyJoin, cteNested, nvlCompat, intDivMod, dateFormat,
    arrayFlatten, compareCoercion,
    lateralAlias, sortLambda, mapTransform, arrayEdit, sqlPivot, elementAt,
    tupleIn, setopPrecedence,
    naturalJoin, likeAllAny, rangeTvf,
    decimalArith, decimalBoundary, nullOrder, nullProp, datetimeClamp,
    intervalArith, numericEdge, stringEdge, aggNull, inNull, unionWiden,
    dateDiff, tryOverflow, caseWhen, windowFrames, likeEscape, stringFns,
    boolLogic, aggFilter, dateTrunc, ignoreNulls, greatestLeast,
    limitOffset, emptyQuantifiers, concatNull,
    recursiveCte, recursiveGraph, groupingNullVsSubtotal, setopNullDup,
    extractFields, datetimeParse, decimalOverflow, ordinals,
    usingJoin, hofEdges, structAccess, mapAccess, nthValue,
    regexBackref, padTrim,
    levenshteinFns, splitPart, translateFmt, hexBits, seriesGen,
    posExplode, arraySlice, regexExtractAll,
    groupByAll, boolAgg, medianMode, listAgg,
    regrClosedForm, bitAggOps, strToMap, stackInline, tryArith,
    arraySetOps,
    percentileWithin, cryptoHash, overlayInsert, mapConstruct,
    splitEdge, charFns, nullifFamily, arrayAggOrder, groupingSetsDup,
    maskBattery, convLuhn, urlPhoneticFmt, variantType, collationLcase,
    monthsWidthBucket, tsUnitArith, xmlFns, regexpReport, orderByAll,
    unicodeSemantics, sqlScripting, arraysZipTry, intervalBreadth,
    lambdaScopeRegex, unicodeNorm)
}
