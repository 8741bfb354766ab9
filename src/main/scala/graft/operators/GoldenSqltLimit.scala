package graft.operators

import graft.QueryDef

/** Port of the reference's `limit.sql` SQLQueryTestSuite input
  * (reference: native-sql-engine/core/src/test/resources/sql-tests/
  * inputs/limit.sql). An unordered LIMIT's row CHOICE is
  * engine-dependent, so the value TCs pin what IS deterministic: the
  * returned COUNT (foldable limit expressions included), the row SET
  * when the source is ordered (range), and LIMIT ALL. The error TCs
  * (negative / NULL / non-integer / non-foldable limits) are pinned in
  * GoldenMiscSpec. */
object GoldenSqltLimit {

  private def sqlFor(rangeIdExpr: String) =
    s"""WITH td AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5), (6))
         AS t(key))
       SELECT 'plain' AS tc, count(*) AS n, CAST(NULL AS BIGINT) AS v
       FROM (SELECT * FROM td LIMIT 2)
       UNION ALL
       SELECT 'folded_expr', count(*), CAST(NULL AS BIGINT)
       FROM (SELECT * FROM td LIMIT 2 + 1)
       UNION ALL
       SELECT 'cast_lit', count(*), CAST(NULL AS BIGINT)
       FROM (SELECT * FROM td LIMIT CAST(1 AS INT))
       UNION ALL
       SELECT 'over_count', count(*), CAST(NULL AS BIGINT)
       FROM (SELECT * FROM td LIMIT 99)
       UNION ALL
       SELECT 'ordered_subq', count(*), CAST(sum(id) AS BIGINT)
       FROM (SELECT * FROM ($rangeIdExpr LIMIT 5)
             WHERE id > 3)
       UNION ALL
       SELECT 'limit_all', count(*), CAST(sum(key) AS BIGINT)
       FROM (SELECT * FROM td WHERE key < 3 LIMIT ALL)"""

  // Spark range() emits `id`; DuckDB's emits `range` — aliased
  val limitMatrix = QueryDef.sql(
    "q_golden_sqlt_limit",
    sqlFor("SELECT id FROM range(10)"),
    sqlFor("SELECT range AS id FROM range(10)"))

  val all: Seq[QueryDef] = Seq(limitMatrix)
}
