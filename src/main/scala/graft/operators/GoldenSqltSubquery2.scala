package graft.operators

import graft.QueryDef

/** Second tranche of the reference's `subquery/` SQLQueryTestSuite
  * directory (see [[GoldenSqltSubquery]] for the first): the
  * exists-having / exists-orderby-limit / exists-within-and-or
  * batteries over the EMP/DEPT/BONUS fixture, the in-group-by /
  * in-having / in-limit batteries over t1/t2/t3, and nested-not-in's
  * null-dept_id matrix.
  *
  * Documented exclusions:
  *  - in-limit TCs whose subquery has LIMIT without ORDER BY (e.g.
  *    `t2b > 6 LIMIT 2`) or an OUTER unordered LIMIT: the selected row
  *    set is engine-dependent by definition — only the
  *    ORDER BY ... LIMIT variants (deterministic value sets) port.
  *  - in-joins / not-in-joins: the join matrices composed with IN are
  *    covered shape-by-shape by q_join_* + the in_simple/in_groupby
  *    correlated probes; porting every permutation adds rows, not
  *    coverage.
  *  - not-in-group-by TC 3+ (NOT IN over t2h timestamp correlation):
  *    timestamp inequality correlation is ported in in_having's
  *    `t1c < t2c` variant instead (same decorrelation shape, integer
  *    column).
  */
object GoldenSqltSubquery2 {
  import GoldenSqltSubquery.{empFix, tFix}

  /** nested-not-in.sql:1-24 fixture (trimmed to the tables its TCs
    * touch): EMP with NULL dept_ids and ADDRESS with NULL ids/names. */
  private val nestFix = """
    emp2 AS (SELECT * FROM (VALUES
      (100, 'emp 1', 10), (200, 'emp 2', CAST(NULL AS INT)),
      (300, 'emp 3', 20), (400, 'emp 4', 30),
      (500, 'emp 5', CAST(NULL AS INT)), (600, 'emp 6', 100),
      (800, 'emp 8', 70)) AS emp2(id, emp_name, dept_id)),
    address AS (SELECT * FROM (VALUES
      (100, 'emp 1', 'addr1'), (200, CAST(NULL AS STRING), 'addr2'),
      (CAST(NULL AS INT), 'emp 3', 'addr3'),
      (CAST(NULL AS INT), CAST(NULL AS STRING), 'addr4'),
      (600, 'emp 6', 'addr6'), (800, 'emp 8', 'addr8'))
      AS address(id, emp_name, address)),
    s1 AS (SELECT * FROM (VALUES (CAST(NULL AS INT), CAST(NULL AS INT)),
      (5, 5), (8, 8), (11, 11)) AS s1(a, b)),
    s2 AS (SELECT * FROM (VALUES (7, 7), (8, 8), (11, 11),
      (CAST(NULL AS INT), CAST(NULL AS INT))) AS s2(c, d))"""

  /** exists-having.sql — EXISTS in a HAVING clause, with the outer
    * aggregate's MIN referenced inside the doubly-nested probe; both
    * the gate-everything and gate-per-group variants, and the
    * correlated + conjunct count(*) form. */
  val existsHaving = QueryDef.sqlSame(
    "q_golden_sqlt_subq_exists_having",
    s"""WITH $empFix
       SELECT 'gate_all' AS tc, CAST(dept_id AS BIGINT) AS id,
              dept_name AS s1, state AS s2, CAST(NULL AS DOUBLE) AS num
       FROM dept WHERE EXISTS
         (SELECT dept_id, count(*) FROM emp GROUP BY dept_id
          HAVING EXISTS (SELECT 1 FROM bonus
                         WHERE bonus_amt < min(emp.salary)))
       UNION ALL
       SELECT 'grouped', CAST(dept_id AS BIGINT), CAST(NULL AS STRING),
              CAST(NULL AS STRING), max(salary)
       FROM emp gp WHERE EXISTS
         (SELECT dept_id, count(*) FROM emp p GROUP BY dept_id
          HAVING EXISTS (SELECT 1 FROM bonus
                         WHERE bonus_amt < min(p.salary)))
       GROUP BY gp.dept_id
       UNION ALL
       SELECT 'gate_gt', CAST(dept_id AS BIGINT), dept_name, state,
              CAST(NULL AS DOUBLE)
       FROM dept WHERE EXISTS
         (SELECT dept_id, count(*) FROM emp GROUP BY dept_id
          HAVING EXISTS (SELECT 1 FROM bonus
                         WHERE bonus_amt > min(emp.salary)))
       UNION ALL
       SELECT 'corr_conj', CAST(dept.dept_id AS BIGINT), dept_name,
              state, CAST(NULL AS DOUBLE)
       FROM dept WHERE EXISTS
         (SELECT e.dept_id, count(e.dept_id) FROM emp e
          WHERE dept.dept_id = e.dept_id GROUP BY e.dept_id
          HAVING EXISTS (SELECT 1 FROM bonus
                         WHERE bonus_amt > min(e.salary)
                           AND count(e.dept_id) > 1))""")

  /** exists-orderby-limit.sql — ORDER BY inside (NOT) EXISTS (a no-op
    * the optimizer must strip), LIMIT 1 gates (uncorrelated and
    * grouped), and NOT EXISTS over an emptied LIMIT subquery. */
  val existsObLimit = QueryDef.sqlSame(
    "q_golden_sqlt_subq_exists_ob_limit",
    s"""WITH $empFix,
       e AS (SELECT CAST(id AS BIGINT) AS id, emp_name AS name,
                    CAST(hiredate AS STRING) AS hd,
                    CAST(dept_id AS BIGINT) AS dep
             FROM emp)
       SELECT 'ob_exists' AS tc, e.* FROM e WHERE EXISTS
         (SELECT dept.dept_id FROM dept WHERE e.dep = dept.dept_id
          ORDER BY state)
       UNION ALL
       SELECT 'ob_notexists', e.* FROM e WHERE NOT EXISTS
         (SELECT dept.dept_id FROM dept WHERE e.dep = dept.dept_id
          ORDER BY state)
       UNION ALL
       SELECT 'ob_grouped_ne', e.* FROM e WHERE NOT EXISTS
         (SELECT max(dept.dept_id) FROM dept
          WHERE dept.dept_id = e.dep GROUP BY state ORDER BY state)
       UNION ALL
       SELECT 'lim_uncorr', e.* FROM e WHERE EXISTS
         (SELECT dept.dept_name FROM dept WHERE dept.dept_id > 10
          LIMIT 1)
       UNION ALL
       SELECT 'lim_grouped', e.* FROM e WHERE EXISTS
         (SELECT max(dept.dept_id) FROM dept GROUP BY state LIMIT 1)
       UNION ALL
       SELECT 'lim_empty_ne', e.* FROM e WHERE NOT EXISTS
         (SELECT dept.dept_name FROM dept WHERE dept.dept_id > 100
          LIMIT 1)
       UNION ALL
       SELECT 'lim_empty_grouped_ne', e.* FROM e WHERE NOT EXISTS
         (SELECT max(dept.dept_id) FROM dept WHERE dept.dept_id > 100
          GROUP BY state LIMIT 1)""")

  /** exists-within-and-or.sql — EXISTS composed under OR with a local
    * null predicate, OR of two correlated EXISTS, and the NOT EXISTS /
    * EXISTS and NOT EXISTS / IN conjunctions over bonus. */
  val existsAndOr = QueryDef.sqlSame(
    "q_golden_sqlt_subq_exists_andor",
    s"""WITH $empFix
       SELECT 'or_null' AS tc, CAST(id AS BIGINT) AS id,
              emp_name AS name, CAST(dept_id AS BIGINT) AS dep,
              CAST(NULL AS DOUBLE) AS amt
       FROM emp WHERE EXISTS
         (SELECT dept.dept_name FROM dept
          WHERE emp.dept_id = dept.dept_id)
          OR emp.dept_id IS NULL
       UNION ALL
       SELECT 'or_two_exists', CAST(NULL AS BIGINT), emp.emp_name,
              CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
       FROM emp WHERE EXISTS
         (SELECT dept.state FROM dept
          WHERE emp.dept_id = dept.dept_id AND dept.dept_id = 20)
          OR EXISTS
         (SELECT dept.state FROM dept
          WHERE emp.dept_id = dept.dept_id AND dept.dept_id = 30)
       UNION ALL
       SELECT 'ne_or_e', CAST(NULL AS BIGINT), bonus.emp_name,
              CAST(NULL AS BIGINT), bonus_amt
       FROM bonus WHERE
         (NOT EXISTS (SELECT * FROM emp
                      WHERE emp.emp_name = bonus.emp_name
                        AND bonus_amt > emp.salary)
          OR EXISTS (SELECT * FROM emp
                     WHERE emp.emp_name = bonus.emp_name
                        OR bonus_amt < emp.salary))
       UNION ALL
       SELECT 'ne_and_in', CAST(NULL AS BIGINT), bonus.emp_name,
              CAST(NULL AS BIGINT), bonus_amt
       FROM bonus WHERE NOT EXISTS
         (SELECT * FROM emp WHERE emp.emp_name = bonus.emp_name
          AND bonus_amt > emp.salary)
         AND bonus.emp_name IN (SELECT emp_name FROM emp
                                WHERE bonus_amt < emp.salary)""")

  /** in-group-by.sql heads — IN probes under GROUP BY: uncorrelated,
    * correlated with extra grouping keys, and the OR of two correlated
    * INs with a DISTINCT sum.
    *
    * Oracle note (also inHaving below): DuckDB 1.0.0 mishandles a NULL
    * probe against a CORRELATED IN subquery — `NULL IN (SELECT NULL)`
    * is correctly NULL, but the decorrelated plan returns the row
    * (probed live this round; Spark follows ANSI and drops it). The
    * oracle therefore guards every nullable probe column with
    * IS NOT NULL — semantically identical for a positive IN, where a
    * NULL probe can never produce TRUE. */
  val inGroupBy = QueryDef.sql(
    "q_golden_sqlt_subq_in_groupby",
    s"""WITH $tFix
       SELECT 'uncorr' AS tc, t1a AS a, CAST(count(*) AS BIGINT) AS v
       FROM t1 WHERE t1a IN (SELECT t2a FROM t2) GROUP BY t1a
       UNION ALL
       SELECT 'corr_max', t1a, CAST(max(t1b) AS BIGINT)
       FROM t1 WHERE t1b IN (SELECT t2b FROM t2 WHERE t1a = t2a)
       GROUP BY t1a, t1d
       UNION ALL
       SELECT 'corr_pair', t1a, CAST(t1b AS BIGINT)
       FROM t1 WHERE t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a)
       GROUP BY t1a, t1b
       UNION ALL
       SELECT 'or_two_in', t1a, CAST(sum(DISTINCT t1b) AS BIGINT)
       FROM t1
       WHERE t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a)
          OR t1c IN (SELECT t3c FROM t3 WHERE t1a = t3a)
       GROUP BY t1a, t1c""",
    s"""WITH $tFix
       SELECT 'uncorr' AS tc, t1a AS a, CAST(count(*) AS BIGINT) AS v
       FROM t1 WHERE t1a IN (SELECT t2a FROM t2) GROUP BY t1a
       UNION ALL
       SELECT 'corr_max', t1a, CAST(max(t1b) AS BIGINT)
       FROM t1 WHERE t1b IS NOT NULL
         AND t1b IN (SELECT t2b FROM t2 WHERE t1a = t2a)
       GROUP BY t1a, t1d
       UNION ALL
       SELECT 'corr_pair', t1a, CAST(t1b AS BIGINT)
       FROM t1 WHERE t1c IS NOT NULL
         AND t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a)
       GROUP BY t1a, t1b
       UNION ALL
       SELECT 'or_two_in', t1a, CAST(sum(DISTINCT t1b) AS BIGINT)
       FROM t1
       WHERE (t1c IS NOT NULL
              AND t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a))
          OR (t1c IS NOT NULL
              AND t1c IN (SELECT t3c FROM t3 WHERE t1a = t3a))
       GROUP BY t1a, t1c""")

  /** in-having.sql heads — HAVING inside the IN subquery (grouped probe
    * sets), correlated min-probe with HAVING, inequality correlation,
    * and outer HAVING over an IN-filtered aggregate. */
  val inHaving = QueryDef.sql(
    "q_golden_sqlt_subq_in_having",
    s"""WITH $tFix
       SELECT 'sub_having' AS tc, t1a AS a, CAST(t1b AS BIGINT) AS b,
              CAST(NULL AS BIGINT) AS c
       FROM t1 WHERE t1b IN
         (SELECT t2b FROM t2 GROUP BY t2b HAVING t2b < 10)
       UNION ALL
       SELECT 'corr_min_having', t1a, CAST(t1b AS BIGINT),
              CAST(t1c AS BIGINT)
       FROM t1 WHERE t1b IN
         (SELECT min(t2b) FROM t2 WHERE t1a = t2a GROUP BY t2b
          HAVING t2b > 1)
       UNION ALL
       SELECT 'ineq_corr', t1a, CAST(t1b AS BIGINT), CAST(t1c AS BIGINT)
       FROM t1 WHERE t1b IN (SELECT t2b FROM t2 WHERE t1c < t2c)
       GROUP BY t1a, t1b, t1c HAVING t1b < 10
       UNION ALL
       SELECT 'outer_having', t1a, CAST(t1b AS BIGINT),
              CAST(t1c AS BIGINT)
       FROM t1 WHERE t1b IN (SELECT t2b FROM t2 WHERE t1c = t2c)
       GROUP BY t1a, t1b, t1c HAVING count(DISTINCT t1b) < 10""",
    s"""WITH $tFix
       SELECT 'sub_having' AS tc, t1a AS a, CAST(t1b AS BIGINT) AS b,
              CAST(NULL AS BIGINT) AS c
       FROM t1 WHERE t1b IN
         (SELECT t2b FROM t2 GROUP BY t2b HAVING t2b < 10)
       UNION ALL
       SELECT 'corr_min_having', t1a, CAST(t1b AS BIGINT),
              CAST(t1c AS BIGINT)
       FROM t1 WHERE t1b IS NOT NULL AND t1b IN
         (SELECT min(t2b) FROM t2 WHERE t1a = t2a GROUP BY t2b
          HAVING t2b > 1)
       UNION ALL
       SELECT 'ineq_corr', t1a, CAST(t1b AS BIGINT), CAST(t1c AS BIGINT)
       FROM t1 WHERE t1b IS NOT NULL
         AND t1b IN (SELECT t2b FROM t2 WHERE t1c < t2c)
       GROUP BY t1a, t1b, t1c HAVING t1b < 10
       UNION ALL
       SELECT 'outer_having', t1a, CAST(t1b AS BIGINT),
              CAST(t1c AS BIGINT)
       FROM t1 WHERE t1b IS NOT NULL
         AND t1b IN (SELECT t2b FROM t2 WHERE t1c = t2c)
       GROUP BY t1a, t1b, t1c HAVING count(DISTINCT t1b) < 10""")

  /** in-limit.sql (deterministic variants) — ORDER BY ... LIMIT probe
    * sets for IN and NOT IN, with grouped outers. The unordered-LIMIT
    * TCs are excluded (engine-dependent row choice; see class doc). */
  val inLimit = QueryDef.sqlSame(
    "q_golden_sqlt_subq_in_limit",
    s"""WITH $tFix
       SELECT 'in_ob_limit' AS tc, CAST(count(DISTINCT t1a) AS BIGINT)
                AS v, CAST(t1b AS BIGINT) AS b
       FROM t1 WHERE t1d IN
         (SELECT t2d FROM t2 ORDER BY t2c, t2d LIMIT 2)
       GROUP BY t1b
       UNION ALL
       SELECT 'notin_ob_limit', CAST(count(DISTINCT t1a) AS BIGINT),
              CAST(t1b AS BIGINT)
       FROM t1 WHERE t1d NOT IN
         (SELECT t2d FROM t2 ORDER BY t2b DESC NULLS FIRST, t2d LIMIT 1)
       GROUP BY t1b""")

  /** nested-not-in.sql — NOT IN against a probe set that contains NULL
    * dept_ids, disarmed by IS NOT NULL guards and OR'd local
    * predicates: the null-poisoning interaction a user hits first. */
  val nestedNotIn = QueryDef.sqlSame(
    "q_golden_sqlt_subq_nested_notin",
    s"""WITH $nestFix
       SELECT 'poisoned' AS tc, CAST(id AS BIGINT) AS id,
              CAST(dept_id AS BIGINT) AS dep
       FROM emp2 WHERE id = 600 OR id = 500
          OR dept_id NOT IN (SELECT dept_id FROM emp2)
       UNION ALL
       SELECT 'guarded', CAST(id AS BIGINT), CAST(dept_id AS BIGINT)
       FROM emp2 WHERE id = 800
          OR (dept_id IS NOT NULL
              AND dept_id NOT IN (SELECT dept_id FROM emp2))
       UNION ALL
       SELECT 'notnull_probe', CAST(id AS BIGINT), CAST(dept_id AS BIGINT)
       FROM emp2
       WHERE dept_id IS NOT NULL
         AND dept_id NOT IN (SELECT dept_id FROM emp2
                             WHERE dept_id IS NULL)
       UNION ALL
       SELECT 'sq_nested', CAST(a AS BIGINT), CAST(b AS BIGINT)
       FROM s1 WHERE a NOT IN (SELECT c FROM s2
                               WHERE c NOT IN (SELECT a FROM s1
                                               WHERE a IS NOT NULL))""")

  val all: Seq[QueryDef] = Seq(existsHaving, existsObLimit, existsAndOr,
    inGroupBy, inHaving, inLimit, nestedNotIn)
}
