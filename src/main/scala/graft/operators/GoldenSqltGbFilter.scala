package graft.operators

import graft.QueryDef

/** Port of the reference's forked-Spark `group-by-filter.sql`
  * SQLQueryTestSuite input (reference: native-sql-engine/core/src/test/
  * resources/sql-tests/inputs/group-by-filter.sql, 161 lines) — the
  * aggregate FILTER clause matrix: plain and DISTINCT aggregates,
  * multiple filtered aggregates side by side (the planner's filtered
  * Expand rewrite), filters over date/timestamp/format expressions, and
  * ordinal GROUP BY.
  *
  * Dialect mirrors: Spark `COUNT(DISTINCT x, y)` ⇔ DuckDB
  * `COUNT(DISTINCT (x, y))` (row-value; exact here because the probed
  * columns are non-null — Spark's any-null-drops semantics never
  * fires), `date_format(d, 'yyyy-MM-dd')` ⇔ `strftime(d, '%Y-%m-%d')`,
  * `to_date`/`to_timestamp` literals ⇔ typed literals.
  *
  * Exclusion: `SELECT a, COUNT(b) FILTER (...) FROM t [GROUP BY b]`
  * with ungrouped `a` — golden output is MISSING_AGGREGATION /
  * MISSING_GROUP_BY analysis errors on both engines, pinned in
  * GoldenGroupHofErrorsSpec's family.
  */
object GoldenSqltGbFilter {
  import GoldenSqltSubquery.empFix

  private val tdFix = """
    testdata AS (SELECT * FROM (VALUES
      (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2),
      (CAST(NULL AS INT), 1), (3, CAST(NULL AS INT)),
      (CAST(NULL AS INT), CAST(NULL AS INT))) AS t(a, b))"""

  /** group-by-filter.sql:28-49 — global (ungrouped) FILTER aggregates:
    * plain counts, date/format predicates, DISTINCT counts under
    * true/false filters, and the constant multi-column DISTINCT
    * counts. */
  val gbFilterGlobal = QueryDef.sql(
    "q_golden_sqlt_gbfilter_global",
    s"""WITH $tdFix, $empFix
       SELECT 'counts' AS tc,
              COUNT(a) FILTER (WHERE a = 1) AS c1,
              COUNT(b) FILTER (WHERE a > 1) AS c2,
              CAST(NULL AS DOUBLE) AS s
       FROM testdata
       UNION ALL
       SELECT 'dates',
              COUNT(id) FILTER (WHERE hiredate = DATE '2001-01-01'),
              COUNT(id) FILTER (WHERE date_format(hiredate, 'yyyy-MM-dd')
                                      = '2001-01-01'),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'dist_truefalse',
              COUNT(DISTINCT id) FILTER (WHERE true),
              COUNT(DISTINCT id) FILTER (WHERE false),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'dist_consts',
              COUNT(DISTINCT 2),
              COUNT(DISTINCT 2, 3) FILTER (WHERE dept_id = 40),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'dist_mix',
              COUNT(DISTINCT id),
              COUNT(DISTINCT 3, 2) FILTER (WHERE dept_id > 0),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'sum_beside_dist',
              COUNT(DISTINCT id),
              COUNT(DISTINCT id)
                FILTER (WHERE hiredate = DATE '2001-01-01'),
              SUM(salary)
       FROM emp""",
    s"""WITH $tdFix, $empFix
       SELECT 'counts' AS tc,
              COUNT(a) FILTER (WHERE a = 1) AS c1,
              COUNT(b) FILTER (WHERE a > 1) AS c2,
              CAST(NULL AS DOUBLE) AS s
       FROM testdata
       UNION ALL
       SELECT 'dates',
              COUNT(id) FILTER (WHERE hiredate = DATE '2001-01-01'),
              COUNT(id) FILTER (WHERE strftime(hiredate, '%Y-%m-%d')
                                      = '2001-01-01'),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'dist_truefalse',
              COUNT(DISTINCT id) FILTER (WHERE true),
              COUNT(DISTINCT id) FILTER (WHERE false),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'dist_consts',
              COUNT(DISTINCT 2),
              COUNT(DISTINCT (2, 3)) FILTER (WHERE dept_id = 40),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'dist_mix',
              COUNT(DISTINCT id),
              COUNT(DISTINCT (3, 2)) FILTER (WHERE dept_id > 0),
              CAST(NULL AS DOUBLE)
       FROM emp
       UNION ALL
       SELECT 'sum_beside_dist',
              COUNT(DISTINCT id),
              COUNT(DISTINCT id)
                FILTER (WHERE hiredate = DATE '2001-01-01'),
              SUM(salary)
       FROM emp""")

  /** group-by-filter.sql:51-161 — grouped FILTER aggregates: the
    * filtered-sum family, SUM(DISTINCT) under filters, multiple
    * DISTINCT aggregates with and without filters side by side (the
    * hardest Expand-rewrite shapes), expression-DISTINCT sums, the
    * multi-column DISTINCT count, and ordinal GROUP BY 1. */
  val gbFilterGrouped = QueryDef.sql(
    "q_golden_sqlt_gbfilter_grouped",
    s"""WITH $tdFix, $empFix
       SELECT 'by_a' AS tc, CAST(a AS STRING) AS k,
              COUNT(b) FILTER (WHERE a >= 2) AS c1,
              CAST(NULL AS BIGINT) AS c2,
              CAST(NULL AS DOUBLE) AS s1, CAST(NULL AS DOUBLE) AS s2
       FROM testdata GROUP BY a
       UNION ALL
       SELECT 'sum_f', CAST(dept_id AS STRING), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT),
              SUM(salary) FILTER (WHERE hiredate > DATE '2003-01-01'),
              CAST(NULL AS DOUBLE)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'sumdist_f', CAST(dept_id AS STRING), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT),
              SUM(DISTINCT salary),
              SUM(DISTINCT salary)
                FILTER (WHERE date_format(hiredate, 'yyyy-MM-dd')
                              > '2001-01-01')
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'dists_sums', CAST(dept_id AS STRING),
              COUNT(DISTINCT emp_name), COUNT(DISTINCT hiredate),
              SUM(salary), SUM(salary) FILTER (WHERE id > 200)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'dists_f_sums_f', CAST(dept_id AS STRING),
              COUNT(DISTINCT emp_name) FILTER (WHERE id > 200),
              COUNT(DISTINCT hiredate)
                FILTER (WHERE hiredate > DATE '2003-01-01'),
              SUM(salary) FILTER (WHERE salary < 400.0),
              SUM(salary) FILTER (WHERE id > 200)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'sumdist_expr', CAST(dept_id AS STRING),
              COUNT(DISTINCT hiredate), CAST(NULL AS BIGINT),
              SUM(DISTINCT (id + dept_id)) FILTER (WHERE id > 200),
              SUM(salary)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'multicol_dist', CAST(dept_id AS STRING),
              COUNT(DISTINCT emp_name, hiredate)
                FILTER (WHERE id > 200),
              CAST(NULL AS BIGINT), SUM(salary), CAST(NULL AS DOUBLE)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'ordinal', 'foo',
              COUNT(a) FILTER (WHERE b <= 2), CAST(NULL AS BIGINT),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       FROM testdata GROUP BY 1""",
    s"""WITH $tdFix, $empFix
       SELECT 'by_a' AS tc, CAST(a AS STRING) AS k,
              COUNT(b) FILTER (WHERE a >= 2) AS c1,
              CAST(NULL AS BIGINT) AS c2,
              CAST(NULL AS DOUBLE) AS s1, CAST(NULL AS DOUBLE) AS s2
       FROM testdata GROUP BY a
       UNION ALL
       SELECT 'sum_f', CAST(dept_id AS STRING), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT),
              SUM(salary) FILTER (WHERE hiredate > DATE '2003-01-01'),
              CAST(NULL AS DOUBLE)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'sumdist_f', CAST(dept_id AS STRING), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT),
              SUM(DISTINCT salary),
              SUM(DISTINCT salary)
                FILTER (WHERE strftime(hiredate, '%Y-%m-%d')
                              > '2001-01-01')
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'dists_sums', CAST(dept_id AS STRING),
              COUNT(DISTINCT emp_name), COUNT(DISTINCT hiredate),
              SUM(salary), SUM(salary) FILTER (WHERE id > 200)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'dists_f_sums_f', CAST(dept_id AS STRING),
              COUNT(DISTINCT emp_name) FILTER (WHERE id > 200),
              COUNT(DISTINCT hiredate)
                FILTER (WHERE hiredate > DATE '2003-01-01'),
              SUM(salary) FILTER (WHERE salary < 400.0),
              SUM(salary) FILTER (WHERE id > 200)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'sumdist_expr', CAST(dept_id AS STRING),
              COUNT(DISTINCT hiredate), CAST(NULL AS BIGINT),
              SUM(DISTINCT (id + dept_id)) FILTER (WHERE id > 200),
              SUM(salary)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'multicol_dist', CAST(dept_id AS STRING),
              COUNT(DISTINCT (emp_name, hiredate))
                FILTER (WHERE id > 200),
              CAST(NULL AS BIGINT), SUM(salary), CAST(NULL AS DOUBLE)
       FROM emp GROUP BY dept_id
       UNION ALL
       SELECT 'ordinal', 'foo',
              COUNT(a) FILTER (WHERE b <= 2), CAST(NULL AS BIGINT),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       FROM testdata GROUP BY 1""")

  val all: Seq[QueryDef] = Seq(gbFilterGlobal, gbFilterGrouped)
}
