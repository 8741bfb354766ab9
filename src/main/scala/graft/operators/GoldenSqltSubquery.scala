package graft.operators

import graft.QueryDef

/** Ports of the reference's forked-Spark `subquery/` SQLQueryTestSuite
  * directory (reference: native-sql-engine/core/src/test/resources/
  * sql-tests/inputs/subquery/{scalar-subquery,exists-subquery,
  * in-subquery}/) — the correlation/null-semantics corner batteries a
  * real user hits that the repo's own q_subq_* rows don't spell out TC
  * by TC. Same porting discipline as [[GoldenSqlt]]: a statement GROUP
  * becomes one registry row, individual test cases union-tagged with a
  * `tc` column into a comparator-portable shape, checked against the
  * live DuckDB oracle.
  *
  * Documented exclusions:
  *  - TCs over the FLOAT/DECIMAL columns of the t1/t2/t3 fixture
  *    (scalar-subquery-predicate TC 01.05/01.07/01.08's t2e/t1g): float32
  *    render and decimal scale promotion differ across engines; the
  *    cast/decimal batteries in [[GoldenSqlt]] pin those families.
  *  - exists-cte.sql / in-with-cte.sql: the CTE+subquery composition is
  *    pinned by q_subq_cte and q_golden_recursive_cte already.
  *  - exists-joins-and-set-ops / in-set-operations: representative set-op
  *    TCs are in the scalar_corr row (INTERSECT) — full join matrices
  *    are covered by the q_join_* family.
  *  - not-in-unit-tests-*-literal: literal variants of the same
  *    null-semantics matrix ported here with subquery probes.
  */
object GoldenSqltSubquery {

  /** The shared t1/t2/t3 fixture (the scalar-subquery sql headers), minus
    * the float/decimal columns (see exclusions): a STRING, b SMALLINT,
    * c INT, d BIGINT, h TIMESTAMP, i DATE — null rows included. */
  private[operators] val tFix = """
    t1 AS (SELECT * FROM (VALUES
      ('val1a', CAST(6 AS SMALLINT), 8, CAST(10 AS BIGINT),
       TIMESTAMP '2014-04-04 00:00:00', DATE '2014-04-04'),
      ('val1b', CAST(8 AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-05-04 01:01:00', DATE '2014-05-04'),
      ('val1a', CAST(16 AS SMALLINT), 12, CAST(21 AS BIGINT),
       TIMESTAMP '2014-06-04 01:02:00.001', DATE '2014-06-04'),
      ('val1a', CAST(16 AS SMALLINT), 12, CAST(10 AS BIGINT),
       TIMESTAMP '2014-07-04 01:01:00', DATE '2014-07-04'),
      ('val1c', CAST(8 AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-05-04 01:02:00.001', DATE '2014-05-05'),
      ('val1d', CAST(NULL AS SMALLINT), 16, CAST(22 AS BIGINT),
       TIMESTAMP '2014-06-04 01:01:00', CAST(NULL AS DATE)),
      ('val1d', CAST(NULL AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-07-04 01:02:00.001', CAST(NULL AS DATE)),
      ('val1e', CAST(10 AS SMALLINT), CAST(NULL AS INT),
       CAST(25 AS BIGINT), TIMESTAMP '2014-08-04 01:01:00',
       DATE '2014-08-04'),
      ('val1e', CAST(10 AS SMALLINT), CAST(NULL AS INT),
       CAST(19 AS BIGINT), TIMESTAMP '2014-09-04 01:02:00.001',
       DATE '2014-09-04'),
      ('val1d', CAST(10 AS SMALLINT), CAST(NULL AS INT),
       CAST(12 AS BIGINT), TIMESTAMP '2015-05-04 01:01:00',
       DATE '2015-05-04'),
      ('val1a', CAST(6 AS SMALLINT), 8, CAST(10 AS BIGINT),
       TIMESTAMP '2014-04-04 01:02:00.001', DATE '2014-04-04'),
      ('val1e', CAST(10 AS SMALLINT), CAST(NULL AS INT),
       CAST(19 AS BIGINT), TIMESTAMP '2014-05-04 01:01:00',
       DATE '2014-05-04')
    ) AS t1(t1a, t1b, t1c, t1d, t1h, t1i)),
    t2 AS (SELECT * FROM (VALUES
      ('val2a', CAST(6 AS SMALLINT), 12, CAST(14 AS BIGINT),
       TIMESTAMP '2014-04-04 01:01:00', DATE '2014-04-04'),
      ('val1b', CAST(10 AS SMALLINT), 12, CAST(19 AS BIGINT),
       TIMESTAMP '2014-05-04 01:01:00', DATE '2014-05-04'),
      ('val1b', CAST(8 AS SMALLINT), 16, CAST(119 AS BIGINT),
       TIMESTAMP '2015-05-04 01:01:00', DATE '2015-05-04'),
      ('val1c', CAST(12 AS SMALLINT), 16, CAST(219 AS BIGINT),
       TIMESTAMP '2016-05-04 01:01:00', DATE '2016-05-04'),
      ('val1b', CAST(NULL AS SMALLINT), 16, CAST(319 AS BIGINT),
       TIMESTAMP '2017-05-04 01:01:00', CAST(NULL AS DATE)),
      ('val2e', CAST(8 AS SMALLINT), CAST(NULL AS INT),
       CAST(419 AS BIGINT), TIMESTAMP '2014-06-04 01:01:00',
       DATE '2014-06-04'),
      ('val1f', CAST(19 AS SMALLINT), CAST(NULL AS INT),
       CAST(519 AS BIGINT), TIMESTAMP '2014-05-04 01:01:00',
       DATE '2014-05-04'),
      ('val1b', CAST(10 AS SMALLINT), 12, CAST(19 AS BIGINT),
       TIMESTAMP '2014-06-04 01:01:00', DATE '2014-06-04'),
      ('val1b', CAST(8 AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-07-04 01:01:00', DATE '2014-07-04'),
      ('val1c', CAST(12 AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-08-04 01:01:00', DATE '2014-08-05'),
      ('val1e', CAST(8 AS SMALLINT), CAST(NULL AS INT),
       CAST(19 AS BIGINT), TIMESTAMP '2014-09-04 01:01:00',
       DATE '2014-09-04'),
      ('val1f', CAST(19 AS SMALLINT), CAST(NULL AS INT),
       CAST(19 AS BIGINT), TIMESTAMP '2014-10-04 01:01:00',
       DATE '2014-10-04'),
      ('val1b', CAST(NULL AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-05-04 01:01:00', CAST(NULL AS DATE))
    ) AS t2(t2a, t2b, t2c, t2d, t2h, t2i)),
    t3 AS (SELECT * FROM (VALUES
      ('val3a', CAST(6 AS SMALLINT), 12, CAST(110 AS BIGINT),
       TIMESTAMP '2014-04-04 01:02:00', DATE '2014-04-04'),
      ('val3a', CAST(6 AS SMALLINT), 12, CAST(10 AS BIGINT),
       TIMESTAMP '2014-05-04 01:02:00', DATE '2014-05-04'),
      ('val1b', CAST(10 AS SMALLINT), 12, CAST(219 AS BIGINT),
       TIMESTAMP '2014-05-04 01:02:00', DATE '2014-05-04'),
      ('val1b', CAST(10 AS SMALLINT), 12, CAST(19 AS BIGINT),
       TIMESTAMP '2014-05-04 01:02:00', DATE '2014-05-04'),
      ('val1b', CAST(8 AS SMALLINT), 16, CAST(319 AS BIGINT),
       TIMESTAMP '2014-06-04 01:02:00', DATE '2014-06-04'),
      ('val1b', CAST(8 AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-07-04 01:02:00', DATE '2014-07-04'),
      ('val3c', CAST(17 AS SMALLINT), 16, CAST(519 AS BIGINT),
       TIMESTAMP '2014-08-04 01:02:00', DATE '2014-08-04'),
      ('val3c', CAST(17 AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-09-04 01:02:00', DATE '2014-09-05'),
      ('val1b', CAST(NULL AS SMALLINT), 16, CAST(419 AS BIGINT),
       TIMESTAMP '2014-10-04 01:02:00', CAST(NULL AS DATE)),
      ('val1b', CAST(NULL AS SMALLINT), 16, CAST(19 AS BIGINT),
       TIMESTAMP '2014-11-04 01:02:00', CAST(NULL AS DATE)),
      ('val3b', CAST(8 AS SMALLINT), CAST(NULL AS INT),
       CAST(719 AS BIGINT), TIMESTAMP '2014-05-04 01:02:00',
       DATE '2014-05-04'),
      ('val3b', CAST(8 AS SMALLINT), CAST(NULL AS INT),
       CAST(19 AS BIGINT), TIMESTAMP '2015-05-04 01:02:00',
       DATE '2015-05-04')
    ) AS t3(t3a, t3b, t3c, t3d, t3h, t3i))"""

  /** The EMP/DEPT/BONUS fixture shared by the exists-subquery suite
    * (exists-basic.sql:4-35) — integer-valued DOUBLE money columns, a
    * NULL dept_id, unassigned departments. */
  private[operators] val empFix = """
    emp AS (SELECT * FROM (VALUES
      (100, 'emp 1', DATE '2005-01-01', CAST(100.00 AS DOUBLE), 10),
      (100, 'emp 1', DATE '2005-01-01', CAST(100.00 AS DOUBLE), 10),
      (200, 'emp 2', DATE '2003-01-01', CAST(200.00 AS DOUBLE), 10),
      (300, 'emp 3', DATE '2002-01-01', CAST(300.00 AS DOUBLE), 20),
      (400, 'emp 4', DATE '2005-01-01', CAST(400.00 AS DOUBLE), 30),
      (500, 'emp 5', DATE '2001-01-01', CAST(400.00 AS DOUBLE),
       CAST(NULL AS INT)),
      (600, 'emp 6 - no dept', DATE '2001-01-01', CAST(400.00 AS DOUBLE),
       100),
      (700, 'emp 7', DATE '2010-01-01', CAST(400.00 AS DOUBLE), 100),
      (800, 'emp 8', DATE '2016-01-01', CAST(150.00 AS DOUBLE), 70)
    ) AS emp(id, emp_name, hiredate, salary, dept_id)),
    dept AS (SELECT * FROM (VALUES
      (10, 'dept 1', 'CA'), (20, 'dept 2', 'NY'), (30, 'dept 3', 'TX'),
      (40, 'dept 4 - unassigned', 'OR'), (50, 'dept 5 - unassigned', 'NJ'),
      (70, 'dept 7', 'FL')
    ) AS dept(dept_id, dept_name, state)),
    bonus AS (SELECT * FROM (VALUES
      ('emp 1', CAST(10.00 AS DOUBLE)), ('emp 1', CAST(20.00 AS DOUBLE)),
      ('emp 2', CAST(300.00 AS DOUBLE)), ('emp 2', CAST(100.00 AS DOUBLE)),
      ('emp 3', CAST(300.00 AS DOUBLE)), ('emp 4', CAST(100.00 AS DOUBLE)),
      ('emp 5', CAST(1000.00 AS DOUBLE)),
      ('emp 6 - no dept', CAST(500.00 AS DOUBLE))
    ) AS bonus(emp_name, bonus_amt))"""

  /** The m/s fixtures of the NOT IN null-semantics unit tests
    * (not-in-unit-tests-single-column.sql:11-22 and
    * not-in-unit-tests-multi-column.sql:15-27). */
  private val msSingle = """
    m AS (SELECT * FROM (VALUES
      (CAST(NULL AS INT), CAST(1.0 AS DOUBLE)), (2, CAST(3.0 AS DOUBLE)),
      (4, CAST(5.0 AS DOUBLE))) AS m(a, b)),
    s AS (SELECT * FROM (VALUES
      (CAST(NULL AS INT), CAST(1.0 AS DOUBLE)), (2, CAST(3.0 AS DOUBLE)),
      (6, CAST(7.0 AS DOUBLE))) AS s(c, d))"""

  private val msMulti = """
    m AS (SELECT * FROM (VALUES
      (CAST(NULL AS INT), CAST(NULL AS DOUBLE)),
      (CAST(NULL AS INT), CAST(1.0 AS DOUBLE)),
      (2, CAST(3.0 AS DOUBLE)), (4, CAST(5.0 AS DOUBLE))) AS m(a, b)),
    s AS (SELECT * FROM (VALUES
      (CAST(NULL AS INT), CAST(NULL AS DOUBLE)),
      (0, CAST(1.0 AS DOUBLE)), (2, CAST(3.0 AS DOUBLE)),
      (4, CAST(NULL AS DOUBLE))) AS s(c, d))"""

  /** scalar-subquery-select.sql TC 01.01-01.03 — multiple uncorrelated
    * scalar subqueries in one SELECT, a scalar inside an IN probe with
    * GROUP BY + HAVING, and scalars under a set op. */
  val scalarSel = QueryDef.sqlSame(
    "q_golden_sqlt_subq_scalar_sel",
    s"""WITH $tFix
       SELECT '01.01' AS tc, t1a AS a,
              (SELECT min(t3d) FROM t3) AS num,
              (SELECT CAST(max(t2h) AS STRING) FROM t2) AS s
       FROM t1 WHERE t1a = 'val1c'
       UNION ALL
       SELECT '01.02', t1a, count(*),
              CAST(NULL AS STRING)
       FROM t1
       WHERE t1c IN (SELECT (SELECT min(t3c) FROM t3)
                     FROM t2 GROUP BY t2h HAVING count(*) > 1)
       GROUP BY t1a
       UNION ALL
       SELECT '01.03', t1a, (SELECT min(t3d) FROM t3),
              CAST(NULL AS STRING)
       FROM t1 WHERE t1a = 'val1c'""")

  /** scalar-subquery-predicate.sql Group 1 (uncorrelated, TC 01.01-01.04,
    * 01.06, 01.09) — scalar probes under =, AND/OR composition, over an
    * outer join, with a date cast, and two scalars compared to each
    * other. */
  val scalarPred = QueryDef.sqlSame(
    "q_golden_sqlt_subq_scalar_pred",
    s"""WITH $tFix
       SELECT '01.01' AS tc, t1a AS a, CAST(t1b AS BIGINT) AS x,
              CAST(NULL AS STRING) AS y
       FROM t1 WHERE t1c = (SELECT max(t2c) FROM t2)
       UNION ALL
       SELECT '01.02', t1a, t1d, CAST(NULL AS STRING)
       FROM t1 WHERE t1c = (SELECT max(t2c) FROM t2)
                 AND t1b > (SELECT min(t3b) FROM t3)
       UNION ALL
       SELECT '01.03', t1a, CAST(NULL AS BIGINT), CAST(t1h AS STRING)
       FROM t1 WHERE t1c = (SELECT max(t2c) FROM t2)
                  OR t1b = (SELECT min(t3b) FROM t3 WHERE t3b > 10)
       UNION ALL
       SELECT '01.04', t1a, t2d, CAST(NULL AS STRING)
       FROM t1 LEFT JOIN t2 ON t1a = t2a
       WHERE t1b = (SELECT min(t3b) FROM t3)
       UNION ALL
       SELECT '01.06', t1a, CAST(NULL AS BIGINT), CAST(t1h AS STRING)
       FROM t1 WHERE CAST(t1h AS DATE) = (SELECT min(t2i) FROM t2)
       UNION ALL
       SELECT '01.09', t3a, CAST(t3b AS BIGINT), CAST(t3c AS STRING)
       FROM t3
       WHERE (SELECT max(t3c) FROM t3 WHERE t3b > 10) >=
             (SELECT min(t3b) FROM t3 WHERE t3c > 0)
         AND (t3b IS NULL OR t3c IS NULL)""")

  /** scalar-subquery-predicate.sql Group 2 (correlated, TC 02.01-02.03,
    * 02.05-02.06) — correlated grouped scalars under </IS NULL/HAVING/
    * range composition and an INTERSECT of two correlated probes. */
  val scalarCorr = QueryDef.sqlSame(
    "q_golden_sqlt_subq_scalar_corr",
    s"""WITH $tFix
       SELECT '02.01' AS tc, t1a AS a, CAST(NULL AS BIGINT) AS c
       FROM t1
       WHERE t1a < (SELECT max(t2a) FROM t2 WHERE t2c = t1c GROUP BY t2c)
       UNION ALL
       SELECT '02.02', t1a, CAST(t1c AS BIGINT)
       FROM t1
       WHERE (SELECT max(t2a) FROM t2 WHERE t2c = t1c GROUP BY t2c)
             IS NULL
       UNION ALL
       SELECT '02.03', t1a, CAST(NULL AS BIGINT)
       FROM t1
       WHERE t1a = (SELECT max(t2a) FROM t2 WHERE t2c = t1c
                    GROUP BY t2c HAVING count(*) >= 1)
          OR t1i > DATE '2014-12-31'
       UNION ALL
       SELECT '02.05', t1a, CAST(t1b AS BIGINT)
       FROM t1
       WHERE t1b <= (SELECT max(t2b) FROM t2 WHERE t2c = t1c GROUP BY t2c)
         AND t1b >= (SELECT min(t2b) FROM t2 WHERE t2c = t1c GROUP BY t2c)
       UNION ALL
       (SELECT '02.06', t1a, CAST(NULL AS BIGINT)
        FROM t1
        WHERE t1a <= (SELECT max(t2a) FROM t2 WHERE t2c = t1c
                      GROUP BY t2c)
        INTERSECT
        SELECT '02.06', t1a, CAST(NULL AS BIGINT)
        FROM t1
        WHERE t1a >= (SELECT min(t2a) FROM t2 WHERE t2c = t1c
                      GROUP BY t2c))""")

  /** exists-basic.sql TC 01.01-01.10 — EXISTS/NOT EXISTS over
    * uncorrelated, correlated, null-tolerant-OR, locally-filtered, and
    * NESTED subqueries, across all three fixture tables (output shapes
    * union-tagged: emp rows carry hiredate, dept rows carry state). */
  val existsBasic = QueryDef.sqlSame(
    "q_golden_sqlt_subq_exists_basic",
    s"""WITH $empFix,
       e AS (SELECT CAST(id AS BIGINT) AS id, emp_name AS name,
                    CAST(hiredate AS STRING) AS s, salary AS num,
                    CAST(dept_id AS BIGINT) AS dep
             FROM emp)
       SELECT '01.01' AS tc, e.* FROM e WHERE EXISTS
         (SELECT 1 FROM dept WHERE dept.dept_id > 10 AND
          dept.dept_id < 30)
       UNION ALL
       SELECT '01.02', e.* FROM e WHERE EXISTS
         (SELECT dept.dept_name FROM dept WHERE e.dep = dept.dept_id)
       UNION ALL
       SELECT '01.03', e.* FROM e WHERE EXISTS
         (SELECT dept.dept_name FROM dept
          WHERE e.dep = dept.dept_id OR e.dep IS NULL)
       UNION ALL
       SELECT '01.04', e.* FROM e WHERE EXISTS
         (SELECT dept.dept_name FROM dept WHERE e.dep = dept.dept_id)
         AND e.id > 200
       UNION ALL
       SELECT '01.09', e.* FROM e WHERE NOT EXISTS
         (SELECT NULL FROM bonus WHERE bonus.emp_name = e.name)
       UNION ALL
       SELECT '01.06', CAST(dept_id AS BIGINT), dept_name, state,
              CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
       FROM dept WHERE NOT EXISTS
         (SELECT emp_name FROM emp WHERE emp.dept_id = dept.dept_id)
       UNION ALL
       SELECT '01.07', CAST(dept_id AS BIGINT), dept_name, state,
              CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
       FROM dept WHERE NOT EXISTS
         (SELECT emp_name FROM emp
          WHERE emp.dept_id = dept.dept_id OR state = 'NJ')
       UNION ALL
       SELECT '01.08', CAST(NULL AS BIGINT), emp_name,
              CAST(NULL AS STRING), bonus_amt, CAST(NULL AS BIGINT)
       FROM bonus WHERE NOT EXISTS
         (SELECT * FROM emp WHERE emp.emp_name = bonus.emp_name
          AND bonus_amt > emp.salary)
       UNION ALL
       SELECT '01.10', CAST(NULL AS BIGINT), bonus.emp_name,
              CAST(NULL AS STRING), bonus_amt, CAST(NULL AS BIGINT)
       FROM bonus WHERE EXISTS
         (SELECT emp_name FROM emp
          WHERE bonus.emp_name = emp.emp_name AND EXISTS
            (SELECT state FROM dept WHERE dept.dept_id = emp.dept_id))""")

  /** exists-aggregate.sql TC 01.01-01.08 — aggregates in the outer
    * block, in the subquery block, in both, nested under EXISTS, and all
    * four again under NOT EXISTS. Money aggregates stay exact (the
    * fixture's doubles are integer-valued). */
  val existsAgg = QueryDef.sqlSame(
    "q_golden_sqlt_subq_exists_agg",
    s"""WITH $empFix
       SELECT '01.01' AS tc, CAST(dept_id AS STRING) AS k,
              CAST(sum(salary) AS DOUBLE)
                / CAST(count(salary) AS DOUBLE) AS v1,
              sum(salary) AS v2
       FROM emp WHERE EXISTS
         (SELECT state FROM dept WHERE dept.dept_id = emp.dept_id)
       GROUP BY dept_id
       UNION ALL
       SELECT '01.02', emp_name, CAST(NULL AS DOUBLE),
              CAST(NULL AS DOUBLE)
       FROM emp WHERE EXISTS
         (SELECT max(dept.dept_id) FROM dept
          WHERE dept.dept_id = emp.dept_id GROUP BY dept.dept_id)
       UNION ALL
       SELECT '01.03', 'count', CAST(count(*) AS DOUBLE),
              CAST(NULL AS DOUBLE)
       FROM emp WHERE EXISTS
         (SELECT max(dept.dept_id) FROM dept
          WHERE dept.dept_id = emp.dept_id GROUP BY dept.dept_id)
       UNION ALL
       SELECT '01.04', emp_name, bonus_amt, CAST(NULL AS DOUBLE)
       FROM bonus WHERE EXISTS
         (SELECT 1 FROM emp
          WHERE emp.emp_name = bonus.emp_name AND EXISTS
            (SELECT max(dept.dept_id) FROM dept
             WHERE emp.dept_id = dept.dept_id GROUP BY dept.dept_id))
       UNION ALL
       SELECT '01.05', CAST(dept_id AS STRING),
              CAST(sum(salary) AS DOUBLE)
                / CAST(count(salary) AS DOUBLE),
              sum(salary)
       FROM emp WHERE NOT EXISTS
         (SELECT state FROM dept WHERE dept.dept_id = emp.dept_id)
       GROUP BY dept_id
       UNION ALL
       SELECT '01.06', emp_name, CAST(NULL AS DOUBLE),
              CAST(NULL AS DOUBLE)
       FROM emp WHERE NOT EXISTS
         (SELECT max(dept.dept_id) FROM dept
          WHERE dept.dept_id = emp.dept_id GROUP BY dept.dept_id)
       UNION ALL
       SELECT '01.07', 'count', CAST(count(*) AS DOUBLE),
              CAST(NULL AS DOUBLE)
       FROM emp WHERE NOT EXISTS
         (SELECT max(dept.dept_id) FROM dept
          WHERE dept.dept_id = emp.dept_id GROUP BY dept.dept_id)
       UNION ALL
       SELECT '01.08', emp_name, bonus_amt, CAST(NULL AS DOUBLE)
       FROM bonus WHERE NOT EXISTS
         (SELECT 1 FROM emp
          WHERE emp.emp_name = bonus.emp_name AND EXISTS
            (SELECT max(dept.dept_id) FROM dept
             WHERE emp.dept_id = dept.dept_id GROUP BY dept.dept_id))""")

  /** simple-in.sql heads — uncorrelated IN, correlated IN, and the
    * correlated NOT IN over the same probe (the shape the reference's
    * in-subquery suite opens with). */
  val inSimple = QueryDef.sqlSame(
    "q_golden_sqlt_subq_in_simple",
    s"""WITH $tFix
       SELECT 'in_uncorr' AS tc, t1a AS a, CAST(t1b AS BIGINT) AS b,
              t1d AS d
       FROM t1 WHERE t1a IN (SELECT t2a FROM t2)
       UNION ALL
       SELECT 'in_corr', t1a, CAST(t1b AS BIGINT), t1d
       FROM t1 WHERE t1b IN (SELECT t2b FROM t2 WHERE t1a = t2a)
       UNION ALL
       SELECT 'notin_corr', t1a, CAST(t1b AS BIGINT), t1d
       FROM t1 WHERE t1b NOT IN (SELECT t2b FROM t2 WHERE t1a = t2a)""")

  /** not-in-unit-tests-single-column.sql — the five uncorrelated NOT IN
    * null-semantics cases (empty subquery, null in subquery, null probe,
    * matching probe, non-matching probe) and the three correlated
    * null-elimination cases. THE null-aware-anti-join truth table. */
  val notinSingle = QueryDef.sqlSame(
    "q_golden_sqlt_subq_notin_single",
    s"""WITH $msSingle
       SELECT 'u1' AS tc, a, b FROM m
       WHERE a NOT IN (SELECT c FROM s WHERE d > 10.0)
       UNION ALL
       SELECT 'u2', a, b FROM m
       WHERE a NOT IN (SELECT c FROM s WHERE d = 1.0)
       UNION ALL
       SELECT 'u3', a, b FROM m WHERE b = 1.0
         AND a NOT IN (SELECT c FROM s WHERE d = 3.0)
       UNION ALL
       SELECT 'u4', a, b FROM m WHERE b = 3.0
         AND a NOT IN (SELECT c FROM s WHERE d = 3.0)
       UNION ALL
       SELECT 'u5', a, b FROM m WHERE b = 5.0
         AND a NOT IN (SELECT c FROM s WHERE d = 7.0)
       UNION ALL
       SELECT 'c1', a, b FROM m
       WHERE a NOT IN (SELECT c FROM s WHERE d = b + 10)
       UNION ALL
       SELECT 'c2', a, b FROM m WHERE b = 1.0
         AND a NOT IN (SELECT c FROM s WHERE d = b + 10)
       UNION ALL
       SELECT 'c3', a, b FROM m WHERE b = 3.0
         AND a NOT IN (SELECT c FROM s WHERE d = b + 10)""")

  /** not-in-unit-tests-multi-column.sql — the (a, b) NOT IN (SELECT *)
    * struct-probe matrix: empty subquery, all-null subquery row, null
    * probe against non-null rows, partial-null interactions, matching
    * and non-matching probes.
    *
    * DuckDB can't bind a two-column IN subquery, so the oracle spells
    * the ANSI three-valued semantics explicitly — a row survives NOT IN
    * iff EVERY subquery row compares FALSE, i.e.
    * `NOT EXISTS (... WHERE (a = c AND b = d) IS NOT FALSE)` — the
    * truth table Spark's null-aware anti join implements. */
  private val notinMultiCases = Seq(
    ("m1", "TRUE", "d > 5.0"),
    ("m2", "TRUE", "c IS NULL AND d IS NULL"),
    ("m3", "a IS NULL AND b IS NULL", "c IS NOT NULL"),
    ("m4", "b = 1.0", "c IS NOT NULL"),
    ("m5", "b = 1.0", "c = 2"),
    ("m6", "b = 3.0", "c = 2"),
    ("m7", "b = 5.0", "c = 2"))

  val notinMulti = QueryDef.sql(
    "q_golden_sqlt_subq_notin_multi",
    s"""WITH $msMulti
       ${notinMultiCases.map { case (tc, local, sub) =>
        s"""SELECT '$tc' AS tc, a, b FROM m WHERE $local
            AND (a, b) NOT IN (SELECT * FROM s WHERE $sub)"""
      }.mkString("\n       UNION ALL\n       ")}""",
    s"""WITH $msMulti
       ${notinMultiCases.map { case (tc, local, sub) =>
        s"""SELECT '$tc' AS tc, a, b FROM m WHERE $local
            AND NOT EXISTS (SELECT 1 FROM s WHERE $sub
                            AND (m.a = s.c AND m.b = s.d) IS NOT FALSE)"""
      }.mkString("\n       UNION ALL\n       ")}""")

  val all: Seq[QueryDef] = Seq(scalarSel, scalarPred, scalarCorr,
    existsBasic, existsAgg, inSimple, notinSingle, notinMulti)
}
