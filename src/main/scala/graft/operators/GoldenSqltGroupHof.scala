package graft.operators

import graft.QueryDef

/** Ports of the reference's forked-Spark `group-analytics.sql` and
  * `higher-order-functions.sql` SQLQueryTestSuite inputs (reference:
  * native-sql-engine/core/src/test/resources/sql-tests/inputs/). Same
  * discipline as [[GoldenSqlt]]: statement groups become oracle-checked
  * registry rows; dialect splits are spelled per engine.
  *
  * Dialect notes:
  *  - Spark `GROUP BY a, b WITH CUBE` / `WITH ROLLUP` and the trailing
  *    `GROUP BY c, y GROUPING SETS(x)` forms have no DuckDB spelling —
  *    the oracle uses the ANSI `GROUP BY CUBE(...)` / `GROUPING SETS
  *    ((x))` equivalents (same sets, same rows).
  *  - Spark `GROUPING_ID(a, b)` and the legacy `grouping__id` ==
  *    DuckDB's multi-argument `GROUPING(a, b)` bitmask.
  *  - HOF outputs are arrays/maps — rendered with to_json on BOTH
  *    engines (the driver comparator excludes list columns; the JSON
  *    image is byte-identical: '[1,null]', '{"1":10}').
  *  - DuckDB's list_reduce takes no init/finish — the oracle mirrors
  *    Spark's aggregate(l, init, merge) as
  *    list_reduce(list_prepend(init, l), merge), and the indexed
  *    transform as list_transform(range(len(l)), i -> l[i+1] + i).
  *
  * Documented exclusions:
  *  - `GROUPING(x)` / `GROUPING_ID(x)` on a plain GROUP BY: Spark
  *    ERRORS (UNSUPPORTED_GROUPING_EXPRESSION) where DuckDB returns 0 —
  *    pinned as error TCs in GoldenGroupHofErrorsSpec.
  *  - `upper(x -> x)` (lambda outside a HOF): analysis error, pinned in
  *    the same spec. (`transform(ys, 0)` with a constant body is LEGAL
  *    in Spark 4 and ported below as t_zero.)
  *  - the trailing SPARK-32819 nested-string-array aggregate: it pins
  *    Spark's accumulator TYPE COERCION, and its value (an array of the
  *    split's last element) collapses to a trivial literal — the nested
  *    aggregate TC here covers the same machinery with a real value.
  */
object GoldenSqltGroupHof {

  private val abFix = """
    testdata AS (SELECT * FROM (VALUES
      (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)) AS t(a, b))"""

  private val salesFix = """
    coursesales AS (SELECT * FROM (VALUES
      ('dotNET', 2012, 10000), ('Java', 2012, 20000),
      ('dotNET', 2012, 5000), ('dotNET', 2013, 48000),
      ('Java', 2013, 30000)) AS t(course, year, earnings))"""

  // array literals split by dialect: Spark array(...), DuckDB [...]
  private val nestedFixSpark = """
    nested AS (SELECT * FROM (VALUES
      (1, array(32, 97), array(array(12, 99), array(123, 42), array(1))),
      (2, array(77, -76), array(array(6, 96, 65), array(-1, -2))),
      (3, array(12), array(array(17)))) AS t(x, ys, zs))"""

  private val nestedFixDuck = """
    nested AS (SELECT * FROM (VALUES
      (1, [32, 97], [[12, 99], [123, 42], [1]]),
      (2, [77, -76], [[6, 96, 65], [-1, -2]]),
      (3, [12], [[17]])) AS t(x, ys, zs))"""

  /** group-analytics.sql:5-25 — WITH CUBE / WITH ROLLUP on OVERLAPPING
    * expression columns (a+b beside b) and the courseSales
    * ROLLUP/CUBE. */
  val groupCubeRollup = QueryDef.sql(
    "q_golden_sqlt_group_cube_rollup",
    s"""WITH $abFix, $salesFix
       SELECT 'cube_expr' AS tc, CAST(a + b AS STRING) AS k1,
              CAST(b AS STRING) AS k2, CAST(SUM(a - b) AS BIGINT) AS s
       FROM testdata GROUP BY a + b, b WITH CUBE
       UNION ALL
       SELECT 'cube_ab', CAST(a AS STRING), CAST(b AS STRING),
              CAST(SUM(b) AS BIGINT)
       FROM testdata GROUP BY a, b WITH CUBE
       UNION ALL
       SELECT 'rollup_expr', CAST(a + b AS STRING), CAST(b AS STRING),
              CAST(SUM(a - b) AS BIGINT)
       FROM testdata GROUP BY a + b, b WITH ROLLUP
       UNION ALL
       SELECT 'rollup_sales', course, CAST(year AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales GROUP BY ROLLUP(course, year)
       UNION ALL
       SELECT 'cube_sales', course, CAST(year AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)""",
    s"""WITH $abFix, $salesFix
       SELECT 'cube_expr' AS tc, CAST(a + b AS STRING) AS k1,
              CAST(b AS STRING) AS k2, CAST(SUM(a - b) AS BIGINT) AS s
       FROM testdata GROUP BY CUBE(a + b, b)
       UNION ALL
       SELECT 'cube_ab', CAST(a AS STRING), CAST(b AS STRING),
              CAST(SUM(b) AS BIGINT)
       FROM testdata GROUP BY CUBE(a, b)
       UNION ALL
       SELECT 'rollup_expr', CAST(a + b AS STRING), CAST(b AS STRING),
              CAST(SUM(a - b) AS BIGINT)
       FROM testdata GROUP BY ROLLUP(a + b, b)
       UNION ALL
       SELECT 'rollup_sales', course, CAST(year AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales GROUP BY ROLLUP(course, year)
       UNION ALL
       SELECT 'cube_sales', course, CAST(year AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)""")

  /** group-analytics.sql:27-62 — GROUPING SETS trailing forms, grouping
    * sets with aggregated grouping columns, GROUPING/GROUPING_ID
    * projection, grouping predicates in HAVING, and SELECT aliases used
    * inside CUBE/ROLLUP/GROUPING SETS. */
  val groupingSetsId = QueryDef.sql(
    "q_golden_sqlt_grouping_sets_id",
    s"""WITH $abFix, $salesFix
       SELECT 'gs_course' AS tc, course AS k1, CAST(year AS STRING) AS k2,
              CAST(SUM(earnings) AS BIGINT) AS s
       FROM coursesales GROUP BY course, year GROUPING SETS(course)
       UNION ALL
       SELECT 'gs_year', course, CAST(year AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales GROUP BY course, year GROUPING SETS(year)
       UNION ALL
       SELECT 'gs_aggcol', course, CAST(NULL AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales
       GROUP BY course, earnings
       GROUPING SETS((), (course), (course, earnings))
       UNION ALL
       SELECT 'gid_proj', course,
              CAST(GROUPING(course) AS STRING) ||
              CAST(GROUPING(year) AS STRING),
              CAST(GROUPING_ID(course, year) AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)
       UNION ALL
       SELECT 'gid_legacy', course, CAST(year AS STRING),
              CAST(grouping__id AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)
       UNION ALL
       SELECT 'gid_having', course, CAST(year AS STRING),
              CAST(NULL AS BIGINT)
       FROM (SELECT course, year FROM coursesales
             GROUP BY CUBE(course, year)
             HAVING GROUPING(year) = 1 AND
                    GROUPING_ID(course, year) > 0)
       UNION ALL
       SELECT 'cube_alias', CAST(k1 AS STRING), CAST(k2 AS STRING), s
       FROM (SELECT a + b AS k1, b AS k2, CAST(SUM(a - b) AS BIGINT) AS s
             FROM testdata GROUP BY CUBE(k1, k2))
       UNION ALL
       SELECT 'rollup_alias', CAST(k AS STRING), CAST(b AS STRING), s
       FROM (SELECT a + b AS k, b, CAST(SUM(a - b) AS BIGINT) AS s
             FROM testdata GROUP BY ROLLUP(k, b))""",
    s"""WITH $abFix, $salesFix
       SELECT 'gs_course' AS tc, course AS k1, CAST(NULL AS STRING) AS k2,
              CAST(SUM(earnings) AS BIGINT) AS s
       FROM coursesales GROUP BY GROUPING SETS((course))
       UNION ALL
       SELECT 'gs_year', CAST(NULL AS STRING), CAST(year AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales GROUP BY GROUPING SETS((year))
       UNION ALL
       SELECT 'gs_aggcol', course, CAST(NULL AS STRING),
              CAST(SUM(earnings) AS BIGINT)
       FROM coursesales
       GROUP BY GROUPING SETS((), (course), (course, earnings))
       UNION ALL
       SELECT 'gid_proj', course,
              CAST(GROUPING(course) AS STRING) ||
              CAST(GROUPING(year) AS STRING),
              CAST(GROUPING(course, year) AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)
       UNION ALL
       SELECT 'gid_legacy', course, CAST(year AS STRING),
              CAST(GROUPING(course, year) AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)
       UNION ALL
       SELECT 'gid_having', course, CAST(year AS STRING),
              CAST(NULL AS BIGINT)
       FROM coursesales GROUP BY CUBE(course, year)
       HAVING GROUPING(year) = 1 AND GROUPING(course, year) > 0
       UNION ALL
       SELECT 'cube_alias', CAST(k1 AS STRING), CAST(k2 AS STRING), s
       FROM (SELECT a + b AS k1, b AS k2, CAST(SUM(a - b) AS BIGINT) AS s
             FROM testdata GROUP BY CUBE(k1, k2))
       UNION ALL
       SELECT 'rollup_alias', CAST(k AS STRING), CAST(b AS STRING), s
       FROM (SELECT a + b AS k, b, CAST(SUM(a - b) AS BIGINT) AS s
             FROM testdata GROUP BY ROLLUP(k, b))""")

  /** higher-order-functions.sql:16-67 (array block) — transform
    * (identity, arithmetic, WITH INDEX, outer-scope reference, nested
    * filter/aggregate), filter, aggregate (scalar init, nested, null
    * array), exists, and the three zip_with cases. Outputs rendered
    * with to_json (see dialect notes). */
  val hofArrays = QueryDef.sql(
    "q_golden_sqlt_hof_arrays",
    s"""WITH $nestedFixSpark
       SELECT x,
              to_json(transform(zs, z -> z)) AS t_ident,
              to_json(transform(ys, y -> y * y)) AS t_sq,
              to_json(transform(ys, (y, i) -> y + i)) AS t_idx,
              to_json(transform(ys, 0)) AS t_zero,
              to_json(transform(zs, z -> concat(ys, z))) AS t_ref,
              to_json(filter(ys, y -> y > 30)) AS f_gt30,
              to_json(transform(zs, z -> filter(z, zz -> zz > 50)))
                AS f_nested,
              aggregate(ys, 0, (a, y) -> a + y + x) AS agg_x,
              to_json(transform(zs,
                z -> aggregate(z, 1, (acc, v) -> acc * v * size(z))))
                AS agg_nested,
              CAST(exists(ys, y -> y > 30) AS INT) AS ex_gt30
       FROM nested
       UNION ALL
       SELECT 99,
              to_json(transform(CAST(NULL AS ARRAY<INT>), z -> z + 1)),
              to_json(filter(CAST(NULL AS ARRAY<INT>), y -> true)),
              CAST(aggregate(CAST(NULL AS ARRAY<INT>), 0,
                (a, y) -> a + y + 1, a -> a + 2) AS STRING),
              CAST(NULL AS STRING),
              to_json(zip_with(ARRAY(1, 2), ARRAY(ARRAY(1), ARRAY(2, 3)),
                (a, b) -> a + size(b))),
              to_json(zip_with(ARRAY('a', 'b', 'c'),
                ARRAY('d', 'e', 'f'), (x, y) -> concat(x, y))),
              to_json(zip_with(ARRAY('a'),
                ARRAY('d', CAST(NULL AS STRING), 'f'),
                (x, y) -> coalesce(x, y))),
              CAST(NULL AS INT),
              CAST(exists(CAST(NULL AS ARRAY<INT>), y -> y > 30)
                AS STRING),
              CAST(NULL AS INT)""",
    s"""WITH $nestedFixDuck
       SELECT x,
              to_json(list_transform(zs, z -> z)) AS t_ident,
              to_json(list_transform(ys, y -> y * y)) AS t_sq,
              to_json(list_transform(range(len(ys)), i -> ys[i+1] + i))
                AS t_idx,
              to_json(list_transform(ys, y -> 0)) AS t_zero,
              to_json(list_transform(zs, z -> list_concat(ys, z)))
                AS t_ref,
              to_json(list_filter(ys, y -> y > 30)) AS f_gt30,
              to_json(list_transform(zs,
                z -> list_filter(z, zz -> zz > 50))) AS f_nested,
              list_reduce(list_prepend(0, ys), (a, y) -> a + y + x)
                AS agg_x,
              to_json(list_transform(zs,
                z -> list_reduce(list_prepend(1, z),
                  (acc, v) -> acc * v * len(z)))) AS agg_nested,
              CAST(len(list_filter(ys, y -> y > 30)) > 0 AS INT)
                AS ex_gt30
       FROM nested
       UNION ALL
       SELECT 99,
              to_json(CAST(NULL AS INT[])),
              to_json(CAST(NULL AS INT[])),
              CAST(NULL AS VARCHAR),
              CAST(NULL AS VARCHAR),
              to_json(list_transform(list_zip([1, 2], [[1], [2, 3]]),
                p -> p[1] + len(p[2]))),
              to_json(list_transform(list_zip(['a', 'b', 'c'],
                ['d', 'e', 'f']), p -> concat(p[1], p[2]))),
              to_json(list_transform(list_zip(['a'],
                ['d', CAST(NULL AS VARCHAR), 'f']),
                p -> coalesce(p[1], p[2]))),
              CAST(NULL AS INT),
              CAST(NULL AS VARCHAR),
              CAST(NULL AS INT)""")

  /** higher-order-functions.sql:69-95 (map block + keyword lambdas) —
    * transform_keys / transform_values (identity, constant shift,
    * key+value arithmetic), plus the `all`-named lambda parameters
    * (Spark treats `all` as a soft keyword in lambda position, ANSI
    * included; the oracle mirror names its parameter freely). */
  val hofMaps = QueryDef.sql(
    "q_golden_sqlt_hof_maps",
    s"""SELECT x,
              to_json(transform_keys(ys, (k, v) -> k)) AS tk_ident,
              to_json(transform_keys(ys, (k, v) -> k + 1)) AS tk_shift,
              to_json(transform_keys(ys, (k, v) -> k + v)) AS tk_kv,
              to_json(transform_values(ys, (k, v) -> v)) AS tv_ident,
              to_json(transform_values(ys, (k, v) -> v + 1)) AS tv_shift,
              to_json(transform_values(ys, (k, v) -> k + v)) AS tv_kv
       FROM (SELECT 1 AS x, map(1, 1, 2, 2, 3, 3) AS ys
             UNION ALL SELECT 2, map(4, 4, 5, 5, 6, 6))
       UNION ALL
       SELECT 3,
              to_json(transform(ks, all -> all * all)),
              to_json(transform(ks, (all, i) -> all + i)),
              CAST(NULL AS STRING), CAST(NULL AS STRING),
              CAST(NULL AS STRING), CAST(NULL AS STRING)
       FROM (SELECT array(32, 97) AS ks)""",
    s"""SELECT x,
              to_json(map(list_transform(map_keys(ys), k -> k),
                map_values(ys))) AS tk_ident,
              to_json(map(list_transform(map_keys(ys), k -> k + 1),
                map_values(ys))) AS tk_shift,
              to_json(map(list_transform(
                list_zip(map_keys(ys), map_values(ys)),
                p -> p[1] + p[2]), map_values(ys))) AS tk_kv,
              to_json(map(map_keys(ys),
                list_transform(map_values(ys), v -> v))) AS tv_ident,
              to_json(map(map_keys(ys),
                list_transform(map_values(ys), v -> v + 1))) AS tv_shift,
              to_json(map(map_keys(ys), list_transform(
                list_zip(map_keys(ys), map_values(ys)),
                p -> p[1] + p[2]))) AS tv_kv
       FROM (SELECT 1 AS x, map([1, 2, 3], [1, 2, 3]) AS ys
             UNION ALL SELECT 2, map([4, 5, 6], [4, 5, 6]))
       UNION ALL
       SELECT 3,
              to_json(list_transform(ks, a -> a * a)),
              to_json(list_transform(range(len(ks)), i -> ks[i+1] + i)),
              CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
              CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
       FROM (SELECT [32, 97] AS ks)""")

  val all: Seq[QueryDef] = Seq(groupCubeRollup, groupingSetsId,
    hofArrays, hofMaps)
}
