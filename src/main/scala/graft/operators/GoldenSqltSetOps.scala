package graft.operators

import graft.QueryDef

/** Ports of the reference's forked-Spark `intersect-all.sql` and
  * `except-all.sql` SQLQueryTestSuite inputs (reference:
  * native-sql-engine/core/src/test/resources/sql-tests/inputs/) — the
  * BAG-semantics set-op batteries the repo's q_intersect_all /
  * q_except_all rows don't spell TC by TC: null-row multiplicity,
  * MINUS ALL (Spark synonym, mirrored as EXCEPT ALL), and above all the
  * CHAINING/PRECEDENCE matrix (INTERSECT binds tighter than
  * EXCEPT/UNION in both engines; explicit parens flip it).
  *
  * Each TC is wrapped as a counted census (`GROUP BY the row`) before
  * union-tagging, so bag MULTIPLICITY — the thing ALL variants exist
  * for — is pinned in the output, not collapsed by the comparator's
  * row sort. Exclusions: the type-coercion TCs (INTERSECT ALL against
  * a BIGINT literal / array(1)) are analyzer coercion pins covered by
  * GoldenSqlt's cast batteries; Spark's MINUS keyword has no DuckDB
  * spelling (mirrored, noted inline). */
object GoldenSqltSetOps {

  private val fix = """
    tab1 AS (SELECT * FROM (VALUES (0), (1), (2), (2), (2), (2), (3),
      (CAST(NULL AS INT)), (CAST(NULL AS INT))) AS t(c1)),
    tab2 AS (SELECT * FROM (VALUES (1), (2), (2), (3), (5), (5),
      (CAST(NULL AS INT))) AS t(c1)),
    tab3 AS (SELECT * FROM (VALUES (1, 2), (1, 2), (1, 3), (2, 3),
      (2, 2)) AS t(k, v)),
    tab4 AS (SELECT * FROM (VALUES (1, 2), (2, 3), (2, 2), (2, 2),
      (2, 20)) AS t(k, v)),
    itab1 AS (SELECT * FROM (VALUES (1, 2), (1, 2), (1, 3), (1, 3),
      (2, 3), (CAST(NULL AS INT), CAST(NULL AS INT)),
      (CAST(NULL AS INT), CAST(NULL AS INT))) AS t(k, v)),
    itab2 AS (SELECT * FROM (VALUES (1, 2), (1, 2), (2, 3), (3, 4),
      (CAST(NULL AS INT), CAST(NULL AS INT)),
      (CAST(NULL AS INT), CAST(NULL AS INT))) AS t(k, v))"""

  val exceptAll = QueryDef.sql(
    "q_golden_sqlt_except_all",
    s"""WITH $fix
       SELECT 'basic' AS tc, CAST(c1 AS STRING) AS k,
              CAST(NULL AS STRING) AS v, count(*) AS n
       FROM (SELECT * FROM tab1 EXCEPT ALL SELECT * FROM tab2)
       GROUP BY c1
       UNION ALL
       SELECT 'minus_all', CAST(c1 AS STRING), CAST(NULL AS STRING),
              count(*)
       FROM (SELECT * FROM tab1 MINUS ALL SELECT * FROM tab2)
       GROUP BY c1
       UNION ALL
       SELECT 'filtered', CAST(c1 AS STRING), CAST(NULL AS STRING),
              count(*)
       FROM (SELECT * FROM tab1 EXCEPT ALL
             SELECT * FROM tab2 WHERE c1 IS NOT NULL)
       GROUP BY c1
       UNION ALL
       SELECT 'pairs', CAST(k AS STRING), CAST(v AS STRING), count(*)
       FROM (SELECT * FROM tab4 EXCEPT ALL SELECT * FROM tab3)
       GROUP BY k, v
       UNION ALL
       SELECT 'chain_intersect_first', CAST(k AS STRING),
              CAST(v AS STRING), count(*)
       FROM (SELECT * FROM tab4 EXCEPT ALL SELECT * FROM tab3
             INTERSECT DISTINCT SELECT * FROM tab4)
       GROUP BY k, v
       UNION ALL
       SELECT 'chain_left_assoc', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (SELECT * FROM tab4 EXCEPT ALL SELECT * FROM tab3
             EXCEPT DISTINCT SELECT * FROM tab4)
       GROUP BY k, v
       UNION ALL
       SELECT 'chain_union', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (SELECT * FROM tab3 EXCEPT ALL SELECT * FROM tab4
             UNION ALL SELECT * FROM tab3
             EXCEPT DISTINCT SELECT * FROM tab4)
       GROUP BY k, v""",
    s"""WITH $fix
       SELECT 'basic' AS tc, CAST(c1 AS STRING) AS k,
              CAST(NULL AS STRING) AS v, count(*) AS n
       FROM (SELECT * FROM tab1 EXCEPT ALL SELECT * FROM tab2)
       GROUP BY c1
       UNION ALL
       SELECT 'minus_all', CAST(c1 AS STRING), CAST(NULL AS STRING),
              count(*)
       FROM (SELECT * FROM tab1 EXCEPT ALL SELECT * FROM tab2)
       GROUP BY c1
       UNION ALL
       SELECT 'filtered', CAST(c1 AS STRING), CAST(NULL AS STRING),
              count(*)
       FROM (SELECT * FROM tab1 EXCEPT ALL
             SELECT * FROM tab2 WHERE c1 IS NOT NULL)
       GROUP BY c1
       UNION ALL
       SELECT 'pairs', CAST(k AS STRING), CAST(v AS STRING), count(*)
       FROM (SELECT * FROM tab4 EXCEPT ALL SELECT * FROM tab3)
       GROUP BY k, v
       UNION ALL
       SELECT 'chain_intersect_first', CAST(k AS STRING),
              CAST(v AS STRING), count(*)
       FROM (SELECT * FROM tab4 EXCEPT ALL SELECT * FROM tab3
             INTERSECT DISTINCT SELECT * FROM tab4)
       GROUP BY k, v
       UNION ALL
       SELECT 'chain_left_assoc', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (SELECT * FROM tab4 EXCEPT ALL SELECT * FROM tab3
             EXCEPT DISTINCT SELECT * FROM tab4)
       GROUP BY k, v
       UNION ALL
       SELECT 'chain_union', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (SELECT * FROM tab3 EXCEPT ALL SELECT * FROM tab4
             UNION ALL SELECT * FROM tab3
             EXCEPT DISTINCT SELECT * FROM tab4)
       GROUP BY k, v""")

  val intersectAll = QueryDef.sqlSame(
    "q_golden_sqlt_intersect_all",
    s"""WITH $fix
       SELECT 'basic' AS tc, CAST(k AS STRING) AS k, CAST(v AS STRING)
                AS v, count(*) AS n
       FROM (SELECT * FROM itab1 INTERSECT ALL SELECT * FROM itab2)
       GROUP BY k, v
       UNION ALL
       SELECT 'self', CAST(k AS STRING), CAST(v AS STRING), count(*)
       FROM (SELECT * FROM itab1 INTERSECT ALL
             SELECT * FROM itab1 WHERE k = 1)
       GROUP BY k, v
       UNION ALL
       SELECT 'empty_left', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (SELECT * FROM itab1 WHERE k > 2 INTERSECT ALL
             SELECT * FROM itab2)
       GROUP BY k, v
       UNION ALL
       SELECT 'triple', CAST(k AS STRING), CAST(v AS STRING), count(*)
       FROM (SELECT * FROM itab2 INTERSECT ALL SELECT * FROM itab1
             INTERSECT ALL SELECT * FROM itab2)
       GROUP BY k, v
       UNION ALL
       SELECT 'except_then_intersect', CAST(k AS STRING),
              CAST(v AS STRING), count(*)
       FROM (SELECT * FROM itab1 EXCEPT SELECT * FROM itab2
             UNION ALL SELECT * FROM itab1
             INTERSECT ALL SELECT * FROM itab2)
       GROUP BY k, v
       UNION ALL
       SELECT 'parens_flip', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (((SELECT * FROM itab1 EXCEPT SELECT * FROM itab2)
              EXCEPT SELECT * FROM itab1)
             INTERSECT ALL SELECT * FROM itab2)
       GROUP BY k, v
       UNION ALL
       SELECT 'join_operands', CAST(k AS STRING), CAST(v AS STRING),
              count(*)
       FROM (SELECT * FROM (SELECT itab1.k, itab2.v FROM itab1
                            JOIN itab2 ON itab1.k = itab2.k)
             INTERSECT ALL
             SELECT * FROM (SELECT itab1.k, itab2.v FROM itab1
                            JOIN itab2 ON itab1.k = itab2.k))
       GROUP BY k, v""")

  val all: Seq[QueryDef] = Seq(exceptAll, intersectAll)
}
