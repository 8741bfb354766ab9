package graft.operators

import graft.QueryDef

/** Port of the reference's forked-Spark `string-functions.sql`
  * SQLQueryTestSuite input (reference: native-sql-engine/core/src/test/
  * resources/sql-tests/inputs/string-functions.sql, 55 lines). Constant
  * batteries — the oracle replays the same expressions, with semantics
  * differences spelled explicitly:
  *  - Spark `left/right(s, n<0)` returns '' — DuckDB strips from the
  *    other end, so the oracle wraps negatives in CASE.
  *  - Spark 2-arg `replace(s, find)` deletes — DuckDB replace is
  *    3-arg, mirrored with ''.
  *  - `split(s, re, limit)` has no DuckDB limit form — mirrored with
  *    regexp algebra (prefix before first separator + remainder).
  *  - uuid() is random: the PORTED facts are its length and
  *    uuid() <> uuid(), exactly as the reference's TC checks.
  *
  * Error TCs (ANSI): `concat_ws()` / `format_string()` zero-arity and
  * the `left/lpad` string-length casts raise — pinned in
  * GoldenStringErrorsSpec (the reference's non-ANSI golden returned
  * NULL for the casts; Spark 4 ANSI raises by design, same exclusion
  * family as GoldenSqlt's cast batteries).
  */
object GoldenSqltString {

  /** string-functions.sql:3-25 — concat/replace/position, the
    * left/right matrix, regex split (with and without limit), and the
    * substr/substring FROM-FOR matrix. */
  val strBasics = QueryDef.sql(
    "q_golden_sqlt_str_basics",
    """SELECT 'a' || 'b' || 'c' AS cat3,
              replace('abc', 'b', '123') AS repl3,
              replace('abc', 'b') AS repl2,
              length(uuid()) AS uuid_len,
              (uuid() <> uuid()) AS uuid_ne,
              position('bar' in 'foobarbar') AS pos,
              position(null, 'foobarbar') AS pos_nullkey,
              position('aaads', null) AS pos_nullstr,
              left('abcd', 2) AS l2, left('abcd', 5) AS l5,
              left('abcd', '2') AS lcast, left('abcd', null) AS lnull,
              left(null, -2) AS lnullneg, left('abcd', -2) AS lneg,
              left('abcd', 0) AS l0,
              right('abcd', 2) AS r2, right('abcd', 5) AS r5,
              right('abcd', '2') AS rcast, right('abcd', null) AS rnull,
              right(null, -2) AS rnullneg, right('abcd', -2) AS rneg,
              right('abcd', 0) AS r0,
              to_json(split('aa1cc2ee3', '[1-9]+')) AS sp,
              to_json(split('aa1cc2ee3', '[1-9]+', 2)) AS sp2,
              substr('Spark SQL', 5) AS su5,
              substr('Spark SQL', -3) AS suneg,
              substr('Spark SQL', 5, 1) AS su51,
              substring('Spark SQL' from 5) AS sb5,
              substring('Spark SQL' from -3) AS sbneg,
              substring('Spark SQL' from 5 for 1) AS sb51""",
    """SELECT 'a' || 'b' || 'c' AS cat3,
              replace('abc', 'b', '123') AS repl3,
              replace('abc', 'b', '') AS repl2,
              length(CAST(uuid() AS VARCHAR)) AS uuid_len,
              (CAST(uuid() AS VARCHAR) <> CAST(uuid() AS VARCHAR))
                AS uuid_ne,
              position('bar' in 'foobarbar') AS pos,
              position(NULL in 'foobarbar') AS pos_nullkey,
              position('aaads' in NULL) AS pos_nullstr,
              left('abcd', 2) AS l2, left('abcd', 5) AS l5,
              left('abcd', CAST('2' AS INT)) AS lcast,
              left('abcd', CAST(NULL AS INT)) AS lnull,
              CAST(NULL AS VARCHAR) AS lnullneg,
              '' AS lneg, left('abcd', 0) AS l0,
              right('abcd', 2) AS r2, right('abcd', 5) AS r5,
              right('abcd', CAST('2' AS INT)) AS rcast,
              right('abcd', CAST(NULL AS INT)) AS rnull,
              CAST(NULL AS VARCHAR) AS rnullneg,
              '' AS rneg, right('abcd', 0) AS r0,
              to_json(regexp_split_to_array('aa1cc2ee3', '[1-9]+')) AS sp,
              to_json(list_value(
                regexp_extract('aa1cc2ee3', '^([^1-9]*)', 1),
                regexp_replace('aa1cc2ee3', '^[^1-9]*[1-9]+', ''))) AS sp2,
              substr('Spark SQL', 5) AS su5,
              substr('Spark SQL', -3) AS suneg,
              substr('Spark SQL', 5, 1) AS su51,
              substring('Spark SQL' from 5) AS sb5,
              substring('Spark SQL' from -3) AS sbneg,
              substring('Spark SQL' from 5 for 1) AS sb51""")

  /** string-functions.sql:26-43 — the full TRIM matrix: bare
    * trim/ltrim/rtrim, BOTH (explicit and implied), LEADING, TRAILING,
    * each with multi-char trim sets. Identical spelling in both
    * engines. */
  val strTrim = QueryDef.sqlSame(
    "q_golden_sqlt_str_trim",
    """SELECT trim(' xyz ') AS t, ltrim(' xyz ') AS lt,
              rtrim(' xyz ') AS rt,
              trim(BOTH 'xyz' FROM 'yxTomxx') AS b1,
              trim('xyz' FROM 'yxTomxx') AS b1i,
              trim(BOTH 'x' FROM 'xxxbarxxx') AS b2,
              trim('x' FROM 'xxxbarxxx') AS b2i,
              trim(LEADING 'xyz' FROM 'zzzytest') AS ld1,
              trim(LEADING 'xyz' FROM 'zzzytestxyz') AS ld2,
              trim(LEADING 'xy' FROM 'xyxXxyLAST WORD') AS ld3,
              trim(TRAILING 'xyz' FROM 'testxxzx') AS tr1,
              trim(TRAILING 'xyz' FROM 'xyztestxxzx') AS tr2,
              trim(TRAILING 'xy' FROM 'TURNERyxXxy') AS tr3""")

  val all: Seq[QueryDef] = Seq(strBasics, strTrim)
}
