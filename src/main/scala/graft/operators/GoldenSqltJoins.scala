package graft.operators

import graft.QueryDef

/** Ports of the reference's forked-Spark `natural-join.sql`,
  * `cross-join.sql`, and `outer-join.sql` SQLQueryTestSuite inputs
  * (reference: native-sql-engine/core/src/test/resources/sql-tests/
  * inputs/). The repo's q_join_* family covers every join SHAPE at
  * scale; these pin the reference's exact parser/analyzer corners —
  * NATURAL join column merging, CROSS JOIN with ON/WHERE/theta
  * predicates, and outer joins whose ON clause is constant-false or
  * whose grouping keys are COALESCE/GREATEST over both sides.
  *
  * Dialect mirror: Spark parses `CROSS JOIN ... ON (cond)` (an inner
  * join in cross clothing); DuckDB's CROSS JOIN takes no ON — the
  * oracle spells those as JOIN ... ON, same semantics. */
object GoldenSqltJoins {

  private val ntFix = """
    nt1 AS (SELECT * FROM (VALUES ('one', 1), ('two', 2), ('three', 3))
      AS t(k, v1)),
    nt2 AS (SELECT * FROM (VALUES ('one', 1), ('two', 22), ('one', 5))
      AS t(k, v2))"""

  /** natural-join.sql — NATURAL inner/left/right joins and the FULL
    * OUTER count (the merged-key projection is the TC). */
  val naturalJoin = QueryDef.sqlSame(
    "q_golden_sqlt_natural_join",
    s"""WITH $ntFix
       SELECT 'inner' AS tc, k, CAST(v1 AS BIGINT) AS v1,
              CAST(v2 AS BIGINT) AS v2
       FROM (SELECT * FROM nt1 NATURAL JOIN nt2) WHERE k = 'one'
       UNION ALL
       SELECT 'left', k, CAST(v1 AS BIGINT), CAST(v2 AS BIGINT)
       FROM (SELECT * FROM nt1 NATURAL LEFT JOIN nt2)
       UNION ALL
       SELECT 'right', k, CAST(v1 AS BIGINT), CAST(v2 AS BIGINT)
       FROM (SELECT * FROM nt1 NATURAL RIGHT JOIN nt2)
       UNION ALL
       SELECT 'full_count', CAST(NULL AS STRING), count(*),
              CAST(NULL AS BIGINT)
       FROM (SELECT * FROM nt1 NATURAL FULL OUTER JOIN nt2)""")

  /** cross-join.sql — the plain product, WHERE-filtered and ON-form
    * crosses, constant-predicate cross, subquery cross, the
    * inner×cross×inner ABCD chain, and the theta (k > k) cross. */
  val crossJoin = QueryDef.sql(
    "q_golden_sqlt_cross_join",
    s"""WITH $ntFix,
       a AS (SELECT k AS ka, v1 AS va FROM nt1),
       b AS (SELECT k AS kb, v1 AS vb FROM nt1),
       c AS (SELECT k AS kc, v1 AS vc FROM nt1),
       d AS (SELECT k AS kd, v1 AS vd FROM nt1)
       SELECT 'product' AS tc, nt1.k AS k1, CAST(v1 AS BIGINT) AS v1,
              nt2.k AS k2, CAST(v2 AS BIGINT) AS v2
       FROM nt1 CROSS JOIN nt2
       UNION ALL
       SELECT 'where_eq', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 CROSS JOIN nt2 WHERE nt1.k = nt2.k
       UNION ALL
       SELECT 'on_eq', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 CROSS JOIN nt2 ON (nt1.k = nt2.k)
       UNION ALL
       SELECT 'const_pred', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 CROSS JOIN nt2 WHERE nt1.v1 = 1 AND nt2.v2 = 22
       UNION ALL
       SELECT 'subq_cross', x.key, CAST(NULL AS BIGINT), y.key,
              CAST(NULL AS BIGINT)
       FROM (SELECT k AS key FROM nt1 WHERE v1 < 2) x
       CROSS JOIN (SELECT k AS key FROM nt2 WHERE v2 = 22) y
       UNION ALL
       SELECT 'abcd_chain', ka, CAST(va AS BIGINT), kc,
              CAST(vd AS BIGINT)
       FROM ((a JOIN b ON (ka = kb)) CROSS JOIN c) JOIN d ON (ka = kd)
       UNION ALL
       SELECT 'theta_gt', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 CROSS JOIN nt2 ON (nt1.k > nt2.k)""",
    s"""WITH $ntFix,
       a AS (SELECT k AS ka, v1 AS va FROM nt1),
       b AS (SELECT k AS kb, v1 AS vb FROM nt1),
       c AS (SELECT k AS kc, v1 AS vc FROM nt1),
       d AS (SELECT k AS kd, v1 AS vd FROM nt1)
       SELECT 'product' AS tc, nt1.k AS k1, CAST(v1 AS BIGINT) AS v1,
              nt2.k AS k2, CAST(v2 AS BIGINT) AS v2
       FROM nt1 CROSS JOIN nt2
       UNION ALL
       SELECT 'where_eq', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 CROSS JOIN nt2 WHERE nt1.k = nt2.k
       UNION ALL
       SELECT 'on_eq', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 JOIN nt2 ON (nt1.k = nt2.k)
       UNION ALL
       SELECT 'const_pred', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 CROSS JOIN nt2 WHERE nt1.v1 = 1 AND nt2.v2 = 22
       UNION ALL
       SELECT 'subq_cross', x.key, CAST(NULL AS BIGINT), y.key,
              CAST(NULL AS BIGINT)
       FROM (SELECT k AS key FROM nt1 WHERE v1 < 2) x
       CROSS JOIN (SELECT k AS key FROM nt2 WHERE v2 = 22) y
       UNION ALL
       SELECT 'abcd_chain', ka, CAST(va AS BIGINT), kc,
              CAST(vd AS BIGINT)
       FROM ((a JOIN b ON (ka = kb)) CROSS JOIN c) JOIN d ON (ka = kd)
       UNION ALL
       SELECT 'theta_gt', nt1.k, CAST(v1 AS BIGINT), nt2.k,
              CAST(v2 AS BIGINT)
       FROM nt1 JOIN nt2 ON (nt1.k > nt2.k)""")

  /** outer-join.sql — the RIGHT JOIN with COALESCE/GREATEST grouping
    * keys and a HAVING over both sides' coalesced columns, and the
    * LEFT JOIN ON false null-supplying path. */
  val outerJoin = QueryDef.sqlSame(
    "q_golden_sqlt_outer_join",
    s"""WITH j1 AS (SELECT * FROM (VALUES (-234), (145), (367), (975),
         (298)) AS t(int_col1)),
       j2 AS (SELECT * FROM (VALUES (-769, -244), (-800, -409),
         (940, 86), (-507, 304), (-367, 158)) AS t(int_col0, int_col1)),
       s1 AS (SELECT * FROM (VALUES (97)) AS t(int_col1)),
       s2 AS (SELECT * FROM (VALUES (0)) AS t(int_col1))
       SELECT 'right_grouped' AS tc,
              CAST(SUM(COALESCE(j1.int_col1, j2.int_col0)) AS BIGINT)
                AS v1,
              CAST((COALESCE(j1.int_col1, j2.int_col0)) * 2 AS BIGINT)
                AS v2
       FROM j1 RIGHT JOIN j2 ON (j2.int_col0) = (j1.int_col1)
       GROUP BY GREATEST(COALESCE(j2.int_col1, 109),
                         COALESCE(j1.int_col1, -449)),
                COALESCE(j1.int_col1, j2.int_col0)
       HAVING (SUM(COALESCE(j1.int_col1, j2.int_col0)))
              > ((COALESCE(j1.int_col1, j2.int_col0)) * 2)
       UNION ALL
       SELECT 'on_false', CAST(t.int_col AS BIGINT),
              CAST(NULL AS BIGINT)
       FROM (SELECT COALESCE(s2.int_col1, s1.int_col1) AS int_col
             FROM s1 LEFT JOIN s2 ON false) t
       WHERE t.int_col IS NOT NULL""")

  val all: Seq[QueryDef] = Seq(naturalJoin, crossJoin, outerJoin)
}
