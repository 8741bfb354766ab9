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

  val all: Seq[QueryDef] = Seq(castIntLimits, castTrim, datetimeArith,
    datetimeProleptic, decimalConst, decimalRows)
}
