package graft.operators

import graft.QueryDef

/** Ports of four small reference SQLQueryTestSuite inputs (reference:
  * native-sql-engine/core/src/test/resources/sql-tests/inputs/):
  * `join-empty-relation.sql`, `null-propagation.sql`,
  * `sql-compatibility-functions.sql`, and `grouping_set.sql`.
  *
  * Dialect mirrors: Spark's condition-less INNER/SEMI/ANTI joins have
  * no DuckDB spelling (CROSS JOIN / SEMI-ANTI ON true); nvl/nvl2 are
  * Spark compatibility aliases (COALESCE / CASE mirrors); the
  * type-constructor functions (boolean(x), bigint(x)…) mirror as ANSI
  * CASTs — which is exactly what they alias.
  *
  * Exclusions: misc-functions.sql's typeof battery (Spark-spelled type
  * names have no cross-engine oracle — pinned in GoldenMiscSpec) and
  * its assert_true / raise_error TCs (error outputs, same spec);
  * `string(1, 2)` arity error likewise; grouping_set.sql's bare
  * `GROUP BY WITH ROLLUP` (no grouping columns — a Spark parser
  * special, error-pinned). */
object GoldenSqltMisc {

  /** join-empty-relation.sql — every join type against an empty
    * relation, in both directions plus empty×empty: the
    * null-supplying/eliminating matrix. Each TC is a counted census so
    * the empty results pin as zero-row counts. */
  val joinEmpty = QueryDef.sql(
    "q_golden_sqlt_join_empty",
    """WITH t1 AS (SELECT 1 AS a),
       et AS (SELECT a FROM t1 WHERE false)
       SELECT 'inner' AS tc, count(*) AS n FROM
         (SELECT t1.a FROM t1 INNER JOIN et)
       UNION ALL SELECT 'cross', count(*) FROM
         (SELECT t1.a FROM t1 CROSS JOIN et)
       UNION ALL SELECT 'left', count(*) FROM
         (SELECT t1.a, et.a AS b FROM t1 LEFT OUTER JOIN et)
       UNION ALL SELECT 'right', count(*) FROM
         (SELECT t1.a, et.a AS b FROM t1 RIGHT OUTER JOIN et)
       UNION ALL SELECT 'full', count(*) FROM
         (SELECT t1.a, et.a AS b FROM t1 FULL OUTER JOIN et)
       UNION ALL SELECT 'semi', count(*) FROM
         (SELECT * FROM t1 LEFT SEMI JOIN et)
       UNION ALL SELECT 'anti', count(*) FROM
         (SELECT * FROM t1 LEFT ANTI JOIN et)
       UNION ALL SELECT 'rev_left', count(*) FROM
         (SELECT et.a FROM et LEFT OUTER JOIN t1)
       UNION ALL SELECT 'rev_full', count(*) FROM
         (SELECT t1.a FROM et FULL OUTER JOIN t1)
       UNION ALL SELECT 'rev_anti', count(*) FROM
         (SELECT * FROM et LEFT ANTI JOIN t1)
       UNION ALL SELECT 'both_full', count(*) FROM
         (SELECT * FROM et FULL OUTER JOIN
          (SELECT a FROM et) AS et2)""",
    """WITH t1 AS (SELECT 1 AS a),
       et AS (SELECT a FROM t1 WHERE false)
       SELECT 'inner' AS tc, count(*) AS n FROM
         (SELECT t1.a FROM t1 CROSS JOIN et)
       UNION ALL SELECT 'cross', count(*) FROM
         (SELECT t1.a FROM t1 CROSS JOIN et)
       UNION ALL SELECT 'left', count(*) FROM
         (SELECT t1.a, et.a AS b FROM t1 LEFT OUTER JOIN et ON true)
       UNION ALL SELECT 'right', count(*) FROM
         (SELECT t1.a, et.a AS b FROM t1 RIGHT OUTER JOIN et ON true)
       UNION ALL SELECT 'full', count(*) FROM
         (SELECT t1.a, et.a AS b FROM t1 FULL OUTER JOIN et ON true)
       UNION ALL SELECT 'semi', count(*) FROM
         (SELECT * FROM t1 SEMI JOIN et ON true)
       UNION ALL SELECT 'anti', count(*) FROM
         (SELECT * FROM t1 ANTI JOIN et ON true)
       UNION ALL SELECT 'rev_left', count(*) FROM
         (SELECT et.a FROM et LEFT OUTER JOIN t1 ON true)
       UNION ALL SELECT 'rev_full', count(*) FROM
         (SELECT t1.a FROM et FULL OUTER JOIN t1 ON true)
       UNION ALL SELECT 'rev_anti', count(*) FROM
         (SELECT * FROM et ANTI JOIN t1 ON true)
       UNION ALL SELECT 'both_full', count(*) FROM
         (SELECT * FROM et FULL OUTER JOIN
          (SELECT a FROM et) AS et2 ON true)""")

  /** null-propagation.sql — COUNT of NULL-typed expressions as plain
    * and windowed aggregates (count skips them; the window form returns
    * one zero per row). */
  val nullProp = QueryDef.sqlSame(
    "q_golden_sqlt_null_prop",
    """WITH v AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(x))
       SELECT 'plain' AS tc, count(NULL) AS c1, count(1 + NULL) AS c2
       FROM v
       UNION ALL
       SELECT 'windowed', count(NULL) OVER (), count(1 + NULL) OVER ()
       FROM v""")

  /** sql-compatibility-functions.sql — ifnull/nullif/nvl/nvl2 with
    * type-coercion pairs, the type-constructor function family
    * (mirrored as the CASTs they alias), and nvl over a struct field
    * as a grouping key. */
  val compatFns = QueryDef.sql(
    "q_golden_sqlt_compat_fns",
    """SELECT ifnull(null, 'x') AS i1, ifnull('y', 'x') AS i2,
              nullif('x', 'x') AS n1, nullif('x', 'y') AS n2,
              nvl(null, 'x') AS v1, nvl('y', 'x') AS v2,
              nvl2(null, 'x', 'y') AS w1, nvl2('n', 'x', 'y') AS w2,
              CAST(ifnull(1, 2.1d) AS DOUBLE) AS c1,
              CAST(ifnull(null, 2.1d) AS DOUBLE) AS c2,
              CAST(nullif(1, 2.1d) AS DOUBLE) AS c3,
              CAST(nullif(1, 1.0d) AS DOUBLE) AS c4,
              CAST(nvl2(null, 1, 2.1d) AS DOUBLE) AS c5,
              CAST(nvl2('n', 1, 2.1d) AS DOUBLE) AS c6,
              boolean(1) AS t1, CAST(tinyint(1) AS INT) AS t2,
              CAST(smallint(1) AS INT) AS t3, int(1) AS t4,
              bigint(1) AS t5, double(1) AS t6,
              CAST(date('2014-04-04') AS STRING) AS d1,
              CAST(timestamp(date('2014-04-04')) AS STRING) AS d2,
              (SELECT concat(nvl(st.col1, 'value'), '/',
                             CAST(count(*) AS STRING))
               FROM (SELECT NAMED_STRUCT('col1', 'gamma') AS st)
               GROUP BY nvl(st.col1, 'value')) AS g1""",
    """SELECT ifnull(null, 'x') AS i1, ifnull('y', 'x') AS i2,
              nullif('x', 'x') AS n1, nullif('x', 'y') AS n2,
              coalesce(null, 'x') AS v1, coalesce('y', 'x') AS v2,
              CASE WHEN null IS NOT NULL THEN 'x' ELSE 'y' END AS w1,
              CASE WHEN 'n' IS NOT NULL THEN 'x' ELSE 'y' END AS w2,
              CAST(ifnull(1, 2.1) AS DOUBLE) AS c1,
              CAST(ifnull(CAST(NULL AS INT), 2.1) AS DOUBLE) AS c2,
              CAST(nullif(1, 2.1) AS DOUBLE) AS c3,
              CAST(nullif(1, 1.0) AS DOUBLE) AS c4,
              CAST(CASE WHEN null IS NOT NULL THEN CAST(1 AS DOUBLE)
                   ELSE 2.1 END AS DOUBLE) AS c5,
              CAST(CASE WHEN 'n' IS NOT NULL THEN CAST(1 AS DOUBLE)
                   ELSE 2.1 END AS DOUBLE) AS c6,
              CAST(1 AS BOOLEAN) AS t1, CAST(1 AS INT) AS t2,
              CAST(1 AS INT) AS t3, CAST(1 AS INT) AS t4,
              CAST(1 AS BIGINT) AS t5, CAST(1 AS DOUBLE) AS t6,
              CAST(DATE '2014-04-04' AS STRING) AS d1,
              CAST(CAST(DATE '2014-04-04' AS TIMESTAMP) AS STRING)
                AS d2,
              (SELECT concat(coalesce(st.col1, 'value'), '/',
                             CAST(count(*) AS STRING))
               FROM (SELECT {'col1': 'gamma'} AS st)
               GROUP BY coalesce(st.col1, 'value')) AS g1""")

  /** grouping_set.sql — GROUPING SETS corners beyond the
    * group-analytics port: the empty set () beside a full GROUP BY
    * list, single-column sets over a wider list, negated/aliased
    * SELECT expressions as set members, commuted (a+b)/(b+a) sets, and
    * HAVING over output aliases. */
  val groupingSetCorners = QueryDef.sql(
    "q_golden_sqlt_grouping_set",
    """WITH g AS (SELECT * FROM (VALUES
         ('1', '2', '3', 1), ('4', '5', '6', 1), ('7', '8', '9', 1))
         AS t(a, b, c, d))
       SELECT 'empty_set' AS tc, a, b, c, count(d) AS n
       FROM g GROUP BY a, b, c GROUPING SETS (())
       UNION ALL
       SELECT 'set_a', a, b, c, count(d)
       FROM g GROUP BY a, b, c GROUPING SETS ((a))
       UNION ALL
       SELECT 'set_c', a, b, c, count(d)
       FROM g GROUP BY a, b, c GROUPING SETS ((c))
       UNION ALL
       SELECT 'neg_alias', CAST(c1n AS STRING), CAST(NULL AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS BIGINT)
       FROM (SELECT -c1 AS c1n FROM (VALUES (1, 2), (3, 2)) t(c1, c2)
             GROUP BY GROUPING SETS ((c1), (c1, c2)))
       UNION ALL
       SELECT 'commuted', CAST(ab AS STRING), CAST(b AS STRING),
              CAST(NULL AS STRING), CAST(s AS BIGINT)
       FROM (SELECT a + b AS ab, b, sum(c) AS s
             FROM (VALUES (1, 1, 1), (2, 2, 2)) AS t(a, b, c)
             GROUP BY GROUPING SETS ((a + b), (b + a), (b)))
       UNION ALL
       SELECT 'having_alias', CAST(col1 AS STRING), CAST(col2 AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS BIGINT)
       FROM (SELECT c1 AS col1, c2 AS col2
             FROM (VALUES (1, 2), (3, 2)) t(c1, c2)
             GROUP BY GROUPING SETS ((c1), (c1, c2))
             HAVING col2 IS NOT NULL)""",
    // 'commuted' mirror note: Spark CANONICALIZES b+a to a+b, so its
    // (b+a) set is a literal duplicate of (a+b) (ab populated twice);
    // DuckDB keeps b+a a distinct expression — the oracle spells the
    // canonicalized form (two identical sets) to pin Spark's semantics.
    """WITH g AS (SELECT * FROM (VALUES
         ('1', '2', '3', 1), ('4', '5', '6', 1), ('7', '8', '9', 1))
         AS t(a, b, c, d))
       SELECT 'empty_set' AS tc, CAST(NULL AS STRING) AS a,
              CAST(NULL AS STRING) AS b, CAST(NULL AS STRING) AS c,
              count(d) AS n
       FROM g
       UNION ALL
       SELECT 'set_a', a, CAST(NULL AS STRING), CAST(NULL AS STRING),
              count(d)
       FROM g GROUP BY GROUPING SETS ((a))
       UNION ALL
       SELECT 'set_c', CAST(NULL AS STRING), CAST(NULL AS STRING), c,
              count(d)
       FROM g GROUP BY GROUPING SETS ((c))
       UNION ALL
       SELECT 'neg_alias', CAST(c1n AS STRING), CAST(NULL AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS BIGINT)
       FROM (SELECT -c1 AS c1n FROM (VALUES (1, 2), (3, 2)) t(c1, c2)
             GROUP BY GROUPING SETS ((c1), (c1, c2)))
       UNION ALL
       SELECT 'commuted', CAST(ab AS STRING), CAST(b AS STRING),
              CAST(NULL AS STRING), CAST(s AS BIGINT)
       FROM (SELECT a + b AS ab, b, sum(c) AS s
             FROM (VALUES (1, 1, 1), (2, 2, 2)) AS t(a, b, c)
             GROUP BY GROUPING SETS ((a + b), (a + b), (b)))
       UNION ALL
       SELECT 'having_alias', CAST(col1 AS STRING), CAST(col2 AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS BIGINT)
       FROM (SELECT c1 AS col1, c2 AS col2
             FROM (VALUES (1, 2), (3, 2)) t(c1, c2)
             GROUP BY GROUPING SETS ((c1), (c1, c2))
             HAVING col2 IS NOT NULL)""")

  val all: Seq[QueryDef] = Seq(joinEmpty, nullProp, compatFns,
    groupingSetCorners)
}
