package graft.operators

import graft.QueryDef

/** Port of the reference's forked-Spark `pivot.sql` SQLQueryTestSuite
  * input (reference: native-sql-engine/core/src/test/resources/
  * sql-tests/inputs/pivot.sql) — the PIVOT clause matrix: single and
  * multiple aggregates, pivot with and without implicit grouping
  * columns, non-attribute aggregate expressions, and pivot over a
  * joined column. The Spark side uses the real PIVOT clause; DuckDB's
  * PIVOT grammar differs, so the oracle replays each TC as grouped
  * conditional aggregation — which doubles as the semantics spec
  * (PIVOT ≡ GROUP BY + FILTERed aggregates).
  *
  * Exclusions: the yearsWithComplexTypes TCs (pivot with array/map/
  * struct GROUPING columns) — complex-typed output columns are outside
  * the driver comparator; the complex-GROUP-BY machinery is pinned by
  * q_expr_array/map and the HOF goldens. The pivot-value-cast and
  * repeated-value ERROR TCs belong to the error-spec family. */
object GoldenSqltPivot {

  private val fix = """
    coursesales AS (SELECT * FROM (VALUES
      ('dotNET', 2012, 10000), ('Java', 2012, 20000),
      ('dotNET', 2012, 5000), ('dotNET', 2013, 48000),
      ('Java', 2013, 30000)) AS t(course, year, earnings)),
    years AS (SELECT * FROM (VALUES (2012, 1), (2013, 2)) AS t(y, s))"""

  // pivot grouping rule pinned by 'sum_min': a column referenced by a
  // pivot AGGREGATE (min(year)) drops out of the implicit group-by, so
  // that TC collapses to one global row — exactly Spark's documented
  // "remaining columns" semantics
  val pivotMatrix = QueryDef.sql(
    "q_golden_sqlt_pivot",
    s"""WITH $fix
       SELECT 'by_course' AS tc, CAST(year AS STRING) AS k,
              CAST(dotNET AS DOUBLE) AS v1, CAST(Java AS DOUBLE) AS v2,
              CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4
       FROM (SELECT year, course, earnings FROM coursesales)
       PIVOT (sum(earnings) FOR course IN ('dotNET', 'Java'))
       UNION ALL
       SELECT 'by_year', course, CAST(`2012` AS DOUBLE),
              CAST(`2013` AS DOUBLE), CAST(NULL AS DOUBLE),
              CAST(NULL AS DOUBLE)
       FROM coursesales PIVOT (sum(earnings) FOR year IN (2012, 2013))
       UNION ALL
       SELECT 'two_aggs', CAST(year AS STRING),
              CAST(dotNET_s AS DOUBLE), CAST(dotNET_a AS DOUBLE),
              CAST(Java_s AS DOUBLE), CAST(Java_a AS DOUBLE)
       FROM (SELECT year, course, earnings FROM coursesales)
       PIVOT (sum(earnings) AS s, avg(earnings) AS a
              FOR course IN ('dotNET', 'Java'))
       UNION ALL
       SELECT 'no_group', 'all', CAST(dotNET AS DOUBLE),
              CAST(Java AS DOUBLE), CAST(NULL AS DOUBLE),
              CAST(NULL AS DOUBLE)
       FROM (SELECT course, earnings FROM coursesales)
       PIVOT (sum(earnings) FOR course IN ('dotNET', 'Java'))
       UNION ALL
       SELECT 'sum_min', 'all',
              CAST(dotNET_s AS DOUBLE), CAST(dotNET_m AS DOUBLE),
              CAST(Java_s AS DOUBLE), CAST(Java_m AS DOUBLE)
       FROM (SELECT year, course, earnings FROM coursesales)
       PIVOT (sum(earnings) AS s, min(year) AS m
              FOR course IN ('dotNET', 'Java'))
       UNION ALL
       SELECT 'joined_s', concat(course, '/', CAST(year AS STRING)),
              CAST(`1` AS DOUBLE), CAST(`2` AS DOUBLE),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       FROM (SELECT course, year, earnings, s
             FROM coursesales JOIN years ON year = y)
       PIVOT (sum(earnings) FOR s IN (1, 2))""",
    s"""WITH $fix
       SELECT 'by_course' AS tc, CAST(year AS STRING) AS k,
              CAST(sum(earnings) FILTER (WHERE course = 'dotNET')
                AS DOUBLE) AS v1,
              CAST(sum(earnings) FILTER (WHERE course = 'Java')
                AS DOUBLE) AS v2,
              CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4
       FROM coursesales GROUP BY year
       UNION ALL
       SELECT 'by_year', course,
              CAST(sum(earnings) FILTER (WHERE year = 2012) AS DOUBLE),
              CAST(sum(earnings) FILTER (WHERE year = 2013) AS DOUBLE),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       FROM coursesales GROUP BY course
       UNION ALL
       SELECT 'two_aggs', CAST(year AS STRING),
              CAST(sum(earnings) FILTER (WHERE course = 'dotNET')
                AS DOUBLE),
              CAST(avg(earnings) FILTER (WHERE course = 'dotNET')
                AS DOUBLE),
              CAST(sum(earnings) FILTER (WHERE course = 'Java')
                AS DOUBLE),
              CAST(avg(earnings) FILTER (WHERE course = 'Java')
                AS DOUBLE)
       FROM coursesales GROUP BY year
       UNION ALL
       SELECT 'no_group', 'all',
              CAST(sum(earnings) FILTER (WHERE course = 'dotNET')
                AS DOUBLE),
              CAST(sum(earnings) FILTER (WHERE course = 'Java')
                AS DOUBLE),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       FROM coursesales
       UNION ALL
       SELECT 'sum_min', 'all',
              CAST(sum(earnings) FILTER (WHERE course = 'dotNET')
                AS DOUBLE),
              CAST(min(year) FILTER (WHERE course = 'dotNET')
                AS DOUBLE),
              CAST(sum(earnings) FILTER (WHERE course = 'Java')
                AS DOUBLE),
              CAST(min(year) FILTER (WHERE course = 'Java') AS DOUBLE)
       FROM coursesales
       UNION ALL
       SELECT 'joined_s', concat(course, '/', CAST(year AS VARCHAR)),
              CAST(sum(earnings) FILTER (WHERE s = 1) AS DOUBLE),
              CAST(sum(earnings) FILTER (WHERE s = 2) AS DOUBLE),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       FROM (SELECT course, year, earnings, s
             FROM coursesales JOIN years ON year = y)
       GROUP BY course, year""")

  val all: Seq[QueryDef] = Seq(pivotMatrix)
}
