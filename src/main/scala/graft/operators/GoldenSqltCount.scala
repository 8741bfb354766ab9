package graft.operators

import graft.QueryDef

/** Port of the reference's forked-Spark `count.sql` SQLQueryTestSuite
  * input (reference: native-sql-engine/core/src/test/resources/
  * sql-tests/inputs/count.sql) — the COUNT null/distinct/multi-column
  * matrix over a fixture with partial-null rows.
  *
  * Dialect mirrors: Spark's multi-argument `count(a, b)` /
  * `count(DISTINCT a, b)` drop rows where ANY argument is null; DuckDB
  * has no multi-argument count, so the oracle spells the semantics out
  * (`count(CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN ...)`), which
  * also pins the any-null-drops rule itself. `count((a, b))` — the
  * STRUCT count — counts every row in both engines (a struct with null
  * fields is not a null struct).
  *
  * Exclusions: `percentile_approx(DISTINCT ...)` (sketch value, covered
  * by the driver-checked approx-percentile guarantee rows in
  * Aggregates); the `spark.sql.legacy.allowParameterlessCount` pair —
  * `count()` under the DEFAULT conf is pinned as an error in
  * GoldenStringErrorsSpec's family; `count(testdata.*)` /
  * `count(DISTINCT testdata.*)` — rejected outright by Spark 4
  * ("use count(*) or expand the columns manually"), the expanded
  * `count(a, b)` forms below ARE that manual expansion.
  */
object GoldenSqltCount {

  private val fix = """
    testdata AS (SELECT * FROM (VALUES
      (1, 1), (1, 2), (2, 1), (1, 1),
      (CAST(NULL AS INT), 2), (1, CAST(NULL AS INT)),
      (CAST(NULL AS INT), CAST(NULL AS INT))) AS t(a, b))"""

  val countMatrix = QueryDef.sql(
    "q_golden_sqlt_count",
    s"""WITH $fix
       SELECT 'plain' AS tc,
              count(*) AS c1, count(1) AS c2, count(null) AS c3,
              count(a) AS c4, count(b) AS c5, count(a + b) AS c6,
              count((a, b)) AS c7
       FROM testdata
       UNION ALL
       SELECT 'distinct',
              count(DISTINCT 1), count(DISTINCT null),
              count(DISTINCT a), count(DISTINCT b),
              count(DISTINCT (a + b)), count(DISTINCT a, b),
              count(DISTINCT b, a)
       FROM testdata
       UNION ALL
       SELECT 'multicol',
              count(a, b), count(b, a), count(DISTINCT *),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
       FROM testdata
       UNION ALL
       SELECT 'const_dist',
              count(DISTINCT 3, 2), count(DISTINCT 2),
              count(DISTINCT 2, 3), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT)
       UNION ALL
       SELECT 'mixed_dist',
              count(DISTINCT a), count(DISTINCT 2, 3),
              count(DISTINCT 3, 2), count(DISTINCT 2),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT)
       FROM testdata""",
    s"""WITH $fix
       SELECT 'plain' AS tc,
              count(*) AS c1, count(1) AS c2, count(null) AS c3,
              count(a) AS c4, count(b) AS c5, count(a + b) AS c6,
              count((a, b)) AS c7
       FROM testdata
       UNION ALL
       SELECT 'distinct',
              count(DISTINCT 1), count(DISTINCT null),
              count(DISTINCT a), count(DISTINCT b),
              count(DISTINCT (a + b)),
              count(DISTINCT CASE WHEN a IS NOT NULL AND b IS NOT NULL
                                  THEN (a, b) END),
              count(DISTINCT CASE WHEN a IS NOT NULL AND b IS NOT NULL
                                  THEN (b, a) END)
       FROM testdata
       UNION ALL
       SELECT 'multicol',
              count(CASE WHEN a IS NOT NULL AND b IS NOT NULL
                         THEN 1 END),
              count(CASE WHEN a IS NOT NULL AND b IS NOT NULL
                         THEN 1 END),
              count(DISTINCT CASE WHEN a IS NOT NULL AND b IS NOT NULL
                                  THEN (a, b) END),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
       FROM testdata
       UNION ALL
       SELECT 'const_dist',
              count(DISTINCT (3, 2)), count(DISTINCT 2),
              count(DISTINCT (2, 3)), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT)
       UNION ALL
       SELECT 'mixed_dist',
              count(DISTINCT a), count(DISTINCT (2, 3)),
              count(DISTINCT (3, 2)), count(DISTINCT 2),
              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              CAST(NULL AS BIGINT)
       FROM testdata""")

  val all: Seq[QueryDef] = Seq(countMatrix)
}
