package graft.operators

import graft.QueryDef

/** Direct ports of the reference's forked Spark SQLQueryTestSuite inputs
  * (reference: native-sql-engine/core/src/test/resources/sql-tests/inputs/
  * cast.sql, datetime.sql, decimalArithmeticOperations.sql — the layer-1
  * safety net the reference runs as golden files with expected outputs).
  * Here each dialect-portable statement group becomes ONE registry row
  * checked against the live DuckDB oracle instead of a frozen .out file,
  * so the pin is cross-engine semantics, not a snapshot.
  *
  * Documented exclusions (statements in the source files that are NOT
  * dialect-portable and are deliberately left out):
  *  - `CAST('1.23' AS int)` truncation (Spark truncates fractional
  *    strings; DuckDB try_cast returns NULL) — Spark-only semantics.
  *  - `5e36BD` decimal literals and overflow-to-NULL (Spark non-ANSI
  *    CheckOverflow nulls; DuckDB raises) — pinned Spark-side by
  *    q_golden_decimal_overflow instead.
  *  - `a / 0`, `a % 0` NULL results (DuckDB raises).
  *  - `date_add(d, n)` (DuckDB's date_add takes an interval), date − date
  *    (Spark: day-time interval; DuckDB: BIGINT days), TIMESTAMP_SECONDS /
  *    UNIX_SECONDS family, `weekday`/`dayofweek` (different day-0
  *    conventions), to_date/to_timestamp with format strings (strptime in
  *    DuckDB).
  *  - escape-sequence trimming (`'\t' `): Spark interprets backslash
  *    escapes inside single-quoted literals, DuckDB does not; boolean
  *    casts trim whitespace in Spark but not DuckDB (`' true '`), so the
  *    boolean pins use unpadded literals.
  */
object GoldenSqlt {

  /** cast.sql:1-40 — integral extremes and invalid strings: the four
    * INT/BIGINT boundary values cast exactly; one-past-the-boundary,
    * non-numeric, '123.a', and empty strings all come back NULL through
    * try_cast on both engines. */
  val castIntLimits = QueryDef.sqlSame(
    "q_golden_sqlt_cast_limits",
    """SELECT CAST('-2147483648' AS INT) AS int_min,
              CAST('2147483647' AS INT) AS int_max,
              try_cast('-2147483649' AS INT) AS int_under,
              try_cast('2147483648' AS INT) AS int_over,
              CAST('-9223372036854775808' AS BIGINT) AS long_min,
              CAST('9223372036854775807' AS BIGINT) AS long_max,
              try_cast('-9223372036854775809' AS BIGINT) AS long_under,
              try_cast('9223372036854775808' AS BIGINT) AS long_over,
              try_cast('abc' AS INT) AS not_num,
              try_cast('1234567890123' AS INT) AS too_wide,
              try_cast('123.a' AS INT) AS bad_decimal,
              try_cast('' AS INT) AS empty_str,
              CAST(NULL AS INT) AS null_int""")

  /** cast.sql:41-82 — string→binary hex image, whitespace-trimmed numeric
    * and boolean casts, and non-numeric garbage after digits. */
  val castTrim = QueryDef.sqlSame(
    "q_golden_sqlt_cast_trim",
    """SELECT hex(CAST('abc' AS BINARY)) AS bin_hex,
              CAST(' 1' AS INT) AS sp_int,
              CAST(' 1' AS BIGINT) AS sp_long,
              CAST(' 1 ' AS DOUBLE) AS sp_double,
              try_cast('1xyz' AS INT) AS trailing_junk,
              try_cast('xyz1' AS BIGINT) AS leading_junk,
              CAST('true' AS BOOLEAN) AS bool_t,
              CAST('false' AS BOOLEAN) AS bool_f,
              CAST(try_cast('xyz' AS BOOLEAN) AS INT) AS bool_junk""")

  /** datetime.sql:58-66 — timestamp/date ± interval arithmetic (a DATE
    * plus a sub-day interval promotes to TIMESTAMP on both engines). */
  val datetimeArith = QueryDef.sqlSame(
    "q_golden_sqlt_dt_arith",
    """SELECT CAST(TIMESTAMP '2011-11-11 11:11:11' + INTERVAL 2 DAY
                   AS STRING) AS ts_plus_d,
              CAST(TIMESTAMP '2011-11-11 11:11:11' - INTERVAL 2 DAY
                   AS STRING) AS ts_minus_d,
              CAST(DATE '2011-11-11' + INTERVAL 2 SECOND AS STRING)
                AS d_plus_s,
              CAST(DATE '2011-11-11' - INTERVAL 2 SECOND AS STRING)
                AS d_minus_s,
              CAST(TIMESTAMP '2019-10-06 10:11:12.345678'
                   + INTERVAL 90 MINUTE AS STRING) AS ts_frac_plus,
              CAST(CAST(DATE '2001-09-28' + INTERVAL 7 DAY AS DATE)
                   AS STRING) AS d_plus_7""")

  /** datetime.sql:29,50-52 — field extraction deep in the proleptic
    * Gregorian calendar: year 1500 and the 1582-10-15 cutover date (a
    * hybrid Julian/Gregorian engine — Spark 2.x, Hive — disagrees here;
    * Spark 3+ and DuckDB are both proleptic and must agree). */
  val datetimeProleptic = QueryDef.sqlSame(
    "q_golden_sqlt_dt_proleptic",
    """SELECT year(DATE '1500-01-01') AS y1500,
              month(DATE '1500-01-01') AS m1500,
              CAST(dayofyear(DATE '1500-01-01') AS INT) AS doy1500,
              year(DATE '1582-10-15') AS y_cutover,
              CAST(dayofyear(DATE '1582-10-15') AS INT) AS doy_cutover,
              CAST(dayofyear(DATE '2020-12-31') AS INT) AS doy_leap,
              CAST(CAST(DATE '1582-10-15' + INTERVAL 1 DAY AS DATE)
                   AS STRING) AS cutover_next""")

  /** decimalArithmeticOperations.sql:36-41 — the constants battery:
    * literal-decimal multiplication keeps exact precision/scale promotion
    * (p1+p2+1, s1+s2) on both engines; the E-notation double goes through
    * BIGINT so the carriers compare exactly. */
  val decimalConst = QueryDef.sqlSame(
    "q_golden_sqlt_dec_const",
    """SELECT CAST(10.3 * 3.0 AS STRING) AS m1,
              CAST(10.3000 * 3.0 AS STRING) AS m2,
              CAST(10.30000 * 30.0 AS STRING) AS m3,
              CAST(CAST(2.35E10 * 1.0 AS BIGINT) AS STRING) AS m_dbl""")

  /** decimalArithmeticOperations.sql:23-34 — the decimals_test table
    * rebuilt as VALUES at DECIMAL(21,13) (wide enough for every fixture
    * row, narrow enough that +/− and ×10 stay under both engines' 38-digit
    * ceiling; the original's (38,18) ×/÷ promotions overflow 38 and are
    * engine-specific — excluded above). Division pins an explicit result
    * scale, the portable discipline the decimalArith golden established. */
  val decimalRows = QueryDef.sqlSame(
    "q_golden_sqlt_dec_rows",
    """SELECT id,
              CAST(a + b AS STRING) AS add_exact,
              CAST(a - b AS STRING) AS sub_exact,
              CAST(a * 10 AS STRING) AS mul10,
              CAST(CAST(b / 10 AS DECIMAL(25,10)) AS STRING) AS div10
       FROM (VALUES
              (1, CAST(100.0 AS DECIMAL(21,13)),
                  CAST(999.0 AS DECIMAL(21,13))),
              (2, CAST(12345.123 AS DECIMAL(21,13)),
                  CAST(12345.123 AS DECIMAL(21,13))),
              (3, CAST(0.1234567891011 AS DECIMAL(21,13)),
                  CAST(1234.1 AS DECIMAL(21,13))),
              (4, CAST(12345678.0 AS DECIMAL(21,13)),
                  CAST(1.1234567891234 AS DECIMAL(21,13))))
            AS t(id, a, b)""")

  /** operators.sql:1-80 — unary sign chains, fractional division, mod
    * null propagation, length family, ceil/
    * floor on decimals and at the 2^50 integer range, and cot.
    * Excluded: `5 div 2` (DuckDB spells it `//`), pmod (absent in
    * DuckDB), width_bucket (absent), abs('-2.19') (DuckDB does not
    * coerce strings in abs), and mod(7, 0) (NULL in DuckDB and legacy
    * Spark, but this engine runs ANSI mode where it raises — the ANSI
    * divide-by-zero battery is q_golden_try_arith's ground). */
  val operators = QueryDef.sqlSame(
    "q_golden_sqlt_operators",
    """SELECT - - 3 AS neg_neg, - + 20 AS neg_pos, + + 100 AS pos_pos,
              -(-10) AS paren_neg,
              5 / 2 AS div_frac,
              5 / NULL AS div_null, NULL / 5 AS null_div,
              mod(7, 2) AS mod_a, mod(0, 2) AS mod_b,
              mod(7, NULL) AS mod_null,
              (-7) % 3 AS neg_mod,
              bit_length('abc') AS bitlen,
              octet_length(CAST('abc' AS BINARY)) AS octlen,
              length('abc') AS charlen,
              CAST(abs(-3.13) AS STRING) AS abs_dec,
              1 > 0.00001 AS cmp_small,
              CAST(ceiling(-0.10) AS BIGINT) AS ceil_neg,
              CAST(ceil(0.01) AS BIGINT) AS ceil_small,
              CAST(floor(0.01) AS BIGINT) AS floor_small,
              CAST(ceil(1234567890123456) AS BIGINT) AS ceil_big,
              round(cot(1), 10) AS cot_one,
              cot(NULL) AS cot_null""")

  /** null-handling.sql:1-35 — the t1 battery: null arithmetic, CASE
    * three-valued logic (`not (null AND false)` is true, `null OR true`
    * is true), simple-CASE null-never-matches. */
  val nullHandling = QueryDef.sqlSame(
    "q_golden_sqlt_null_rows",
    """SELECT a, b + c AS add_bc, b * 0 AS mul_zero,
              CASE b WHEN c THEN 1 ELSE 0 END AS case_b_c,
              CASE WHEN b <> 0 THEN 1 ELSE 0 END AS b_ne0,
              CASE WHEN b <> 0 AND c <> 0 THEN 1 ELSE 0 END AS b_and_c,
              CASE WHEN NOT (b <> 0 AND c <> 0) THEN 1 ELSE 0 END
                AS not_and,
              CASE WHEN b <> 0 OR c <> 0 THEN 1 ELSE 0 END AS b_or_c,
              CASE WHEN NOT (b <> 0 OR c <> 0) THEN 1 ELSE 0 END
                AS not_or
       FROM (VALUES (1,0,0),(2,0,1),(3,1,0),(4,1,1),
                    (5,NULL,0),(6,NULL,1),(7,NULL,NULL)) AS t1(a,b,c)""")

  /** null-handling.sql:37-47 — null aggregation + WHERE-clause
    * three-valued logic: count(col) skips nulls, DISTINCT keeps one
    * null, and a NULL predicate excludes the row from every branch of
    * `b<10` / `not b>10` / AND / OR (spelled as conditional sums, the
    * WHERE-equivalent the hash compare can see). */
  val nullAgg = QueryDef.sqlSame(
    "q_golden_sqlt_null_agg",
    """WITH t1 AS (SELECT * FROM (VALUES (1,0,0),(2,0,1),(3,1,0),(4,1,1),
                     (5,NULL,0),(6,NULL,1),(7,NULL,NULL)) AS v(a,b,c))
       SELECT count(*) AS n_rows, count(b) AS n_b,
              CAST(sum(b) AS BIGINT) AS sum_b, avg(b) AS avg_b,
              min(b) AS min_b, max(b) AS max_b,
              (SELECT count(*) FROM (SELECT DISTINCT b FROM t1) d)
                AS n_distinct_rows,
              count(DISTINCT b) AS n_distinct_vals,
              CAST(sum(CASE WHEN b < 10 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_lt,
              CAST(sum(CASE WHEN NOT b > 10 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_not_gt,
              CAST(sum(CASE WHEN b < 10 OR c = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_or,
              CAST(sum(CASE WHEN b < 10 AND c = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_and,
              CAST(sum(CASE WHEN NOT (b < 10 AND c = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_not_and
       FROM t1""")

  /** group-by.sql:6-70 — the testData battery: grouping with null keys
    * (one group per null key value), complex group expressions, literal/
    * global aggregates, and the empty-input row. Null group keys are
    * surfaced via coalesce(-999) so the compare sees a concrete value. */
  val groupBy = QueryDef.sqlSame(
    "q_golden_sqlt_group_by",
    """WITH testData AS (SELECT * FROM (VALUES
         (1,1),(1,2),(2,1),(2,2),(3,1),(3,2),
         (CAST(NULL AS INT),1),(3,CAST(NULL AS INT)),
         (CAST(NULL AS INT),CAST(NULL AS INT))) AS v(a,b))
       SELECT 'by_a' AS tag, CAST(coalesce(a, -999) AS BIGINT) AS k,
              count(b) AS cnt
       FROM testData GROUP BY a
       UNION ALL
       SELECT 'by_a_plus_b', CAST(coalesce(a + b, -999) AS BIGINT),
              count(b)
       FROM testData GROUP BY a + b
       UNION ALL
       SELECT 'global', CAST(42 AS BIGINT), count(a) FROM testData
       UNION ALL
       SELECT 'empty', CAST(0 AS BIGINT), count(1)
       FROM testData WHERE 1 = 0""")

  /** predicate-functions.sql:1-40 — numeric↔string comparison coercion
    * (the string side coerces to the numeric type on both engines; the
    * numeric sides are spelled fractional because under ANSI Spark a
    * string compared to an INT must parse as an integer — '1.0' raises —
    * while against a fractional type both engines parse it as DOUBLE).
    * Excluded: `1.5 = '1.51'` (Spark coerces the string to DOUBLE →
    * false; DuckDB compares equal → true) and the to_date forms
    * (function absent in DuckDB). */
  val predicates = QueryDef.sqlSame(
    "q_golden_sqlt_predicates",
    """SELECT 1.0 = '1' AS eq_num_str,
              2.0 > '1.0' AS gt_str, 2.0 > '2.2' AS gt_str_false,
              '1.5' > 0.5 AS str_gt,
              1.0 >= '1' AS ge_eq, 2.0 >= '2.0' AS ge_str,
              2.0 < '2.2' AS lt_str, 2.0 < '1.0' AS lt_false,
              0.5 <= '1.5' AS le_str, 2.0 <= '2.0' AS le_eq""")

  /** having.sql:1-31 — the hav battery: HAVING over an aggregate, over a
    * grouping EXPRESSION (`GROUP BY v + 1 HAVING v + 1 = 2`), global-
    * aggregate HAVING with no GROUP BY, and the SPARK-31663 family where
    * HAVING references a grouping COLUMN that a SELECT alias shadows —
    * under GROUPING SETS, CUBE and ROLLUP (where the null subtotal rows
    * must NOT pass `b > 10`). Both engines resolve the HAVING reference
    * to the grouping column, not the alias. */
  val having = QueryDef.sqlSame(
    "q_golden_sqlt_having",
    """WITH hav AS (SELECT * FROM (VALUES
         ('one', 1), ('two', 2), ('three', 3), ('one', 5)) AS v(k, v))
       SELECT 'agg' AS tag, k, CAST(sum(v) AS BIGINT) AS s
       FROM hav GROUP BY k HAVING sum(v) > 2
       UNION ALL
       SELECT 'group_expr', CAST(v + 1 AS STRING), count(k)
       FROM hav GROUP BY v + 1 HAVING v + 1 = 2
       UNION ALL
       SELECT 'global', 'min', CAST(min(v) AS BIGINT)
       FROM hav HAVING count(1) > 0
       UNION ALL
       SELECT 'shadowed_gsets', 'b', CAST(sum(a) AS BIGINT)
       FROM (VALUES (1, 10), (2, 20)) AS t(a, b)
       GROUP BY GROUPING SETS ((b), (a, b)) HAVING b > 10
       UNION ALL
       SELECT 'shadowed_cube', 'b', CAST(sum(a) AS BIGINT)
       FROM (VALUES (1, 10), (2, 20)) AS t(a, b)
       GROUP BY CUBE(a, b) HAVING b > 10
       UNION ALL
       SELECT 'shadowed_rollup', 'b', CAST(sum(a) AS BIGINT)
       FROM (VALUES (1, 10), (2, 20)) AS t(a, b)
       GROUP BY ROLLUP(a, b) HAVING b > 10""")

  /** union.sql:1-23 — UNION ALL with type coercion across branches
    * (INT ∪ DECIMAL widens to the decimal) and the SPARK-18622 shape
    * where one branch is a GLOBAL AGGREGATE (`SELECT SUM(1), ...`) — the
    * union must not push the other branches' projection into the
    * aggregate. Excluded: the original's INT ∪ STRING column (legacy
    * Spark widened to STRING; under ANSI Spark coerces the string to the
    * NUMERIC side and raises on 'a' — genuinely divergent from DuckDB's
    * widen-to-VARCHAR). */
  val union = QueryDef.sqlSame(
    "q_golden_sqlt_union",
    """WITH t1 AS (SELECT * FROM (VALUES (1, 10), (2, 20)) AS v(c1, c2)),
       t2 AS (SELECT * FROM (VALUES (1.5, 1), (2.5, 4)) AS v(c1, c2))
       SELECT 'coerced' AS tag, CAST(c1 AS STRING) AS c1,
              CAST(c2 AS STRING) AS c2
       FROM (SELECT * FROM t1
             UNION ALL SELECT * FROM t2
             UNION ALL SELECT * FROM t2)
       UNION ALL
       SELECT 'agg_branch', CAST(a AS STRING), CAST(b AS STRING)
       FROM (SELECT 0 AS a, 0 AS b
             UNION ALL
             SELECT CAST(SUM(1) AS INT) AS a, 0 AS b
             UNION ALL SELECT 0 AS a, 0 AS b) T""")

  val all: Seq[QueryDef] = Seq(castIntLimits, castTrim, datetimeArith,
    datetimeProleptic, decimalConst, decimalRows, operators, nullHandling,
    nullAgg, groupBy, predicates, having, union)
}
