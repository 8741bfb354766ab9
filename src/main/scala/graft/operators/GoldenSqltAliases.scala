package graft.operators

import graft.QueryDef

/** Ports of the reference's `inner-join.sql` and `table-aliases.sql`
  * SQLQueryTestSuite inputs (reference: native-sql-engine/core/src/
  * test/resources/sql-tests/inputs/) — union-of-duplicates inner join
  * and the table-alias column-rename matrix (rename in FROM, grouped
  * alias keys, subquery renames, renaming a parenthesized JOIN result).
  * Error TCs (wrong alias arity, referencing a renamed-away column) are
  * pinned in GoldenMiscSpec. */
object GoldenSqltAliases {

  val aliasesAndInnerJoin = QueryDef.sqlSame(
    "q_golden_sqlt_aliases_ijoin",
    """WITH td AS (SELECT * FROM (VALUES (1, 1), (1, 2), (2, 1))
         AS t(a, b)),
       src1 AS (SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c'))
         AS t(id, v1)),
       src2 AS (SELECT * FROM (VALUES (2, 1.0), (3, 3.2), (1, 8.5))
         AS t(id, v2)),
       ta AS (SELECT 1 AS a, 'a' AS tag UNION ALL
              SELECT 1, 'b'),
       tb AS (SELECT 1 AS a, 'a' AS tag UNION ALL SELECT 1, 'a'
              UNION ALL SELECT 1, 'b' UNION ALL SELECT 1, 'b')
       SELECT 'rename_where' AS tc, CAST(col1 AS STRING) AS x,
              CAST(col2 AS STRING) AS y, CAST(NULL AS STRING) AS z,
              CAST(NULL AS STRING) AS w
       FROM td AS t(col1, col2) WHERE col1 = 1
       UNION ALL
       SELECT 'rename_group', CAST(k AS STRING), CAST(s AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS STRING)
       FROM (SELECT col1 AS k, CAST(SUM(col2) AS BIGINT) AS s
             FROM td AS t(col1, col2) GROUP BY col1)
       UNION ALL
       SELECT 'subq_rename', CAST(col1 AS STRING), CAST(col2 AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS STRING)
       FROM (SELECT 1 AS a, 1 AS b) t(col1, col2)
       UNION ALL
       SELECT 'join_rename', CAST(a AS STRING), b,
              CAST(c AS STRING), CAST(d AS STRING)
       FROM (src1 s1 INNER JOIN src2 s2 ON s1.id = s2.id) dst(a, b, c, d)
       UNION ALL
       SELECT 'dup_inner', CAST(tb.a AS STRING), tb.tag,
              CAST(NULL AS STRING), CAST(NULL AS STRING)
       FROM ta INNER JOIN tb ON ta.a = tb.a AND ta.tag = tb.tag""")

  val all: Seq[QueryDef] = Seq(aliasesAndInnerJoin)
}
