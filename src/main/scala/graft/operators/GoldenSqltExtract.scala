package graft.operators

import graft.QueryDef

/** Port of the reference's forked-Spark `extract.sql` SQLQueryTestSuite
  * input (reference: native-sql-engine/core/src/test/resources/
  * sql-tests/inputs/extract.sql, 130 lines) — the EXTRACT field matrix
  * over a timestamp and a mixed-unit interval.
  *
  * Porting notes:
  *  - the reference's alias ladders (y/yr/yrs, mon/mons, h/hr/hrs …)
  *    are Spark parser aliases of the SAME field — each field is ported
  *    once under its canonical name (the aliases resolve identically by
  *    construction), and `date_part('x', c)` is the same function as
  *    `extract(x FROM c)` in both engines.
  *  - day-numbering dialects mirrored explicitly: Spark DAYOFWEEK and
  *    DOW are BOTH Sun=1-based in Spark 4 (measured — dow is an alias,
  *    not the PostgreSQL 0-based dow) ⇔ DuckDB dow+1; Spark DOW_ISO
  *    (Mon=1) ⇔ isodow; YEAROFWEEK ⇔ isoyear.
  *  - Spark extract(SECOND) returns DECIMAL seconds with the fraction;
  *    DuckDB's returns whole seconds — mirrored from
  *    date_part('microseconds') (which carries the seconds) / 1e6.
  *  - the fixture timestamp is trimmed to microsecond precision
  *    ('…09.123456' not the reference's 7-digit '.1234567'): the two
  *    engines round the 7th fractional digit differently, and the TC
  *    under test is field extraction, not sub-micro rounding.
  *  - `extract(not_supported …)` error TCs → GoldenStringErrorsSpec
  *    family.
  */
object GoldenSqltExtract {

  val extractMatrix = QueryDef.sql(
    "q_golden_sqlt_extract",
    """WITH t AS (SELECT
         CAST('2011-05-06 07:08:09.123456' AS TIMESTAMP) AS c)
       SELECT CAST(extract(year FROM c) AS BIGINT) AS c_year,
              CAST(extract(yearofweek FROM c) AS BIGINT) AS c_yow,
              CAST(extract(quarter FROM c) AS BIGINT) AS c_quarter,
              CAST(extract(month FROM c) AS BIGINT) AS c_month,
              CAST(extract(week FROM c) AS BIGINT) AS c_week,
              CAST(extract(day FROM c) AS BIGINT) AS c_day,
              CAST(extract(dayofweek FROM c) AS BIGINT) AS c_dayofweek,
              CAST(extract(dow FROM c) AS BIGINT) AS c_dow,
              CAST(extract(dow_iso FROM c) AS BIGINT) AS c_dow_iso,
              CAST(extract(doy FROM c) AS BIGINT) AS c_doy,
              CAST(extract(hour FROM c) AS BIGINT) AS c_hour,
              CAST(extract(minute FROM c) AS BIGINT) AS c_minute,
              CAST(extract(second FROM c) AS DOUBLE) AS c_second,
              CAST(date_part('year', c) AS BIGINT) AS dp_year,
              CAST(date_part('doy', c) AS BIGINT) AS dp_doy
       FROM t""",
    """WITH t AS (SELECT
         CAST('2011-05-06 07:08:09.123456' AS TIMESTAMP) AS c)
       SELECT CAST(extract(year FROM c) AS BIGINT) AS c_year,
              CAST(extract(isoyear FROM c) AS BIGINT) AS c_yow,
              CAST(extract(quarter FROM c) AS BIGINT) AS c_quarter,
              CAST(extract(month FROM c) AS BIGINT) AS c_month,
              CAST(extract(week FROM c) AS BIGINT) AS c_week,
              CAST(extract(day FROM c) AS BIGINT) AS c_day,
              CAST(extract(dow FROM c) + 1 AS BIGINT) AS c_dayofweek,
              CAST(extract(dow FROM c) + 1 AS BIGINT) AS c_dow,
              CAST(extract(isodow FROM c) AS BIGINT) AS c_dow_iso,
              CAST(extract(doy FROM c) AS BIGINT) AS c_doy,
              CAST(extract(hour FROM c) AS BIGINT) AS c_hour,
              CAST(extract(minute FROM c) AS BIGINT) AS c_minute,
              CAST(date_part('microseconds', c) AS DOUBLE) / 1e6
                AS c_second,
              CAST(date_part('year', c) AS BIGINT) AS dp_year,
              CAST(date_part('doy', c) AS BIGINT) AS dp_doy
       FROM t""")

  /** The interval half of extract.sql: year/month fold (10y + 20mo →
    * 11y8m), day/hour/minute stay unfolded in a day-time interval, and
    * the fractional-second extract. Spark's ANSI intervals are two
    * families (year-month vs day-time), so the fixture carries one of
    * each — the reference's single mixed literal predates ANSI
    * intervals. */
  val extractInterval = QueryDef.sql(
    "q_golden_sqlt_extract_interval",
    """WITH t AS (SELECT
         INTERVAL '10-8' YEAR TO MONTH AS ym,
         INTERVAL '30 16:50:06.789' DAY TO SECOND AS dt)
       SELECT CAST(extract(year FROM ym) AS BIGINT) AS i_year,
              CAST(extract(month FROM ym) AS BIGINT) AS i_month,
              CAST(extract(day FROM dt) AS BIGINT) AS i_day,
              CAST(extract(hour FROM dt) AS BIGINT) AS i_hour,
              CAST(extract(minute FROM dt) AS BIGINT) AS i_minute,
              CAST(extract(second FROM dt) AS DOUBLE) AS i_second
       FROM t""",
    """WITH t AS (SELECT
         INTERVAL '10 years 8 months' AS ym,
         INTERVAL '30 days 16 hours 50 minutes 6.789 seconds' AS dt)
       SELECT CAST(extract(year FROM ym) AS BIGINT) AS i_year,
              CAST(extract(month FROM ym) AS BIGINT) AS i_month,
              CAST(extract(day FROM dt) AS BIGINT) AS i_day,
              CAST(extract(hour FROM dt) AS BIGINT) AS i_hour,
              CAST(extract(minute FROM dt) AS BIGINT) AS i_minute,
              CAST(date_part('microseconds', dt) AS DOUBLE) / 1e6
                AS i_second
       FROM t""")

  val all: Seq[QueryDef] = Seq(extractMatrix, extractInterval)
}
