package graft.operators

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** Scalar expression surface — one query per family from SURVEY §2.9.
  *
  * The reference converts these through `ColumnarExpressionConverter` to
  * Gandiva trees (reference: core/com/intel/oap/expression/
  * ColumnarExpressionConverter.scala:35-313, ColumnarBinaryOperator.scala,
  * ColumnarUnaryOperator.scala, ColumnarDateTimeExpressions.scala). For us
  * every one is a Spark built-in inside whole-stage codegen.
  *
  * Cross-engine determinism rules: no libm-dependent transcendentals
  * (exp/ln last-ulp differ between JVM and C); sqrt is IEEE-correctly-rounded
  * so it's safe; halfway rounding goes through decimal (HALF_UP in both for
  * positive values); double→int casts avoided (Spark truncates, DuckDB
  * rounds).
  */
object Expressions {

  /** String family: case, substring, concat, trim/pad, replace, predicates
    * (Like/StartsWith/EndsWith/Contains — ColumnarBinaryOperator.scala:70-135). */
  val stringFns = QueryDef(
    "q_expr_string",
    (spark, dir) => {
      Tables(spark, dir, "part")
        // '%i%' keeps ~half the parts at every SF (ring/widget/gizmo...);
        // the previous '%it%' matched zero rows at sf0.01, making the row
        // vacuously green (VERDICT r2 "What's wrong" #1)
        .filter(col("p_name").like("%i%"))
        .select(
          col("p_partkey"),
          upper(col("p_type")).as("up"),
          lower(col("p_brand")).as("lo"),
          length(col("p_name")).cast("long").as("len"),
          substring(col("p_name"), 1, 5).as("sub"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("cat"),
          lpad(col("p_brand"), 12, "_").as("padded"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
          trim(col("p_name")).as("trimmed"),
          col("p_type").startsWith("PROMO").as("is_promo"),
          col("p_type").endsWith("ED").as("ends_ed"),
          col("p_name").contains("box").as("has_box"))
    },
    Some("""
      SELECT p_partkey, upper(p_type) AS up, lower(p_brand) AS lo,
             CAST(length(p_name) AS BIGINT) AS len,
             substring(p_name, 1, 5) AS sub,
             concat(p_brand, '/', p_type) AS cat,
             lpad(p_brand, 12, '_') AS padded,
             replace(p_name, ' ', '_') AS snake,
             trim(p_name) AS trimmed,
             starts_with(p_type, 'PROMO') AS is_promo,
             suffix(p_type, 'ED') AS ends_ed,
             contains(p_name, 'box') AS has_box
      FROM part
      WHERE p_name LIKE '%i%'"""))

  /** Regex family: RLike + regexp_extract/replace/count
    * (StringRegexExpression converter case, ColumnarExpressionConverter.scala:143). */
  val regexFns = QueryDef(
    "q_expr_regex",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .filter(col("text").rlike("data|query"))
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          regexp_count(col("text"), lit("the")).cast("long").as("n_the"),
          regexp_replace(col("text"), lit("[aeiou]"), lit("")).as("no_vowels"))
    },
    Some("""
      SELECT doc_id,
             regexp_extract(text, '([a-z]+)', 1) AS first_word,
             CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the,
             regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels
      FROM documents
      WHERE regexp_matches(text, 'data|query')"""))

  /** Arithmetic/math family (ColumnarArithmetic.scala:409-432; Round via
    * decimal for halfway-rule parity; sqrt is IEEE-exact). */
  val mathFns = QueryDef(
    "q_expr_math",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .filter(col("l_linenumber") <= 3)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          floor(col("l_extendedprice")).cast("long").as("fl"),
          ceil(col("l_extendedprice")).cast("long").as("ce"),
          round(dec2(col("l_extendedprice")), 1).cast("double").as("rnd1"),
          sqrt(col("l_quantity")).as("sq"),
          signum(col("l_discount") - 0.05).as("sg"),
          (col("l_quantity") % 7.0).as("md"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS abs_d,
             CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE)
               AS rnd1,
             sqrt(l_quantity) AS sq,
             CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
             fmod(l_quantity, 7.0) AS md,
             greatest(l_quantity, l_discount * 100) AS gr,
             least(l_tax, l_discount) AS le
      FROM lineitem
      WHERE l_linenumber <= 3"""))

  /** Bitwise family (BitwiseAnd/Or/Xor/Not, ShiftLeft/Right —
    * ColumnarArithmetic.scala, ColumnarBinaryOperator.scala:424-446). */
  val bitwiseFns = QueryDef(
    "q_expr_bitwise",
    (spark, dir) => {
      Tables(spark, dir, "part")
        .select(
          col("p_partkey"),
          (col("p_size").bitwiseAND(15)).cast("long").as("b_and"),
          (col("p_size").bitwiseOR(64)).cast("long").as("b_or"),
          (col("p_size").bitwiseXOR(col("p_partkey").cast("int")))
            .cast("long").as("b_xor"),
          bitwise_not(col("p_size")).cast("long").as("b_not"),
          shiftleft(col("p_size"), 2).cast("long").as("b_shl"),
          shiftright(col("p_size"), 1).cast("long").as("b_shr"),
          bit_count(col("p_size")).cast("long").as("b_cnt"))
    },
    Some("""
      SELECT p_partkey,
             CAST(p_size & 15 AS BIGINT) AS b_and,
             CAST(p_size | 64 AS BIGINT) AS b_or,
             CAST(xor(p_size, CAST(p_partkey AS INT)) AS BIGINT) AS b_xor,
             CAST(~p_size AS BIGINT) AS b_not,
             CAST(p_size << 2 AS BIGINT) AS b_shl,
             CAST(p_size >> 1 AS BIGINT) AS b_shr,
             CAST(bit_count(p_size) AS BIGINT) AS b_cnt
      FROM part"""))

  /** Conditional family: CaseWhen/If/Coalesce/NullIf/In/IsNull
    * (ColumnarCaseWhenOperator, ColumnarIfOperator, ColumnarCoalesceOperator,
    * ColumnarInOperator files). NULLs are manufactured via nullif so the
    * null paths actually execute. */
  val conditionalFns = QueryDef(
    "q_expr_conditional",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 150000.0, "high")
            .when(col("o_totalprice") > 50000.0, "mid")
            .otherwise("low").as("bucket"),
          when(col("o_orderstatus") === "O", lit("open"))
            .otherwise(lit("done")).as("st"),
          coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
            lit("unspecified")).as("prio"),
          nullif(col("o_orderstatus"), lit("P")).isNull.as("is_p"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_hot"))
    },
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 150000.0 THEN 'high'
                  WHEN o_totalprice > 50000.0 THEN 'mid'
                  ELSE 'low' END AS bucket,
             CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'done' END AS st,
             coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'),
                      'unspecified') AS prio,
             nullif(o_orderstatus, 'P') IS NULL AS is_p,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_hot
      FROM orders"""))

  /** Cast matrix (the reference's largest expression —
    * ColumnarUnaryOperator.scala:386-653): long↔string, string→double,
    * timestamp→date→string, double→decimal→double. Double→int is excluded
    * by design (Spark truncates, DuckDB rounds — documented divergence). */
  val castFns = QueryDef(
    "q_expr_cast",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("string").cast("long").as("key_rt"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("price_rt"),
          col("o_orderdate").cast("date").cast("string").as("date_str"),
          concat(lit(""), col("o_custkey").cast("double")).as("cust_dbl_str"),
          lit("42").cast("long").as("parsed"),
          lit("3.5").cast("double").as("parsed_d"))
    },
    Some("""
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) AS key_str,
             CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_rt,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
             CAST(CAST(o_custkey AS DOUBLE) AS VARCHAR) AS cust_dbl_str,
             CAST('42' AS BIGINT) AS parsed,
             CAST('3.5' AS DOUBLE) AS parsed_d
      FROM orders
      WHERE o_orderkey % 97 = 0"""))

  /** Datetime family (ColumnarDateTimeExpressions.scala:57-550): extract
    * fields, truncate, day arithmetic, diffs, make_date. */
  val datetimeFns = QueryDef(
    "q_expr_datetime",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % 31 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          unix_millis(date_trunc("month", col("o_orderdate")).cast("timestamp"))
            .as("month_start_ms"),
          date_add(col("o_orderdate").cast("date"), 30).cast("string")
            .as("plus30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"),
          last_day(col("o_orderdate").cast("date")).cast("string").as("eom"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
            .cast("string").as("som"))
    },
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(day(o_orderdate) AS BIGINT) AS d,
             CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
             CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
             CAST(quarter(o_orderdate) AS BIGINT) AS q,
             epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
             CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
             CAST(date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
             CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
             CAST(make_date(year(o_orderdate), month(o_orderdate), 1)
                  AS VARCHAR) AS som
      FROM orders
      WHERE o_orderkey % 31 = 0"""))

  /** Decimal money math: multiply/add with scale growth, HALF_UP rounding,
    * exact aggregation (PromotePrecision/CheckOverflow parity —
    * ColumnarUnaryOperator.scala:799-801). */
  val decimalFns = QueryDef(
    "q_expr_decimal",
    (spark, dir) => {
      // per-row decimal-multiply chain runs in the scan-fused partial
      // aggregate — spread the single-row-group input (guide §2.5)
      val li = Tables.spread(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          sum(round(dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))) *
            (lit(1).cast("decimal(18,2)") + dec2(col("l_tax"))), 2))
            .cast("double").as("sum_charge"),
          sum(dec2(col("l_quantity")) + dec2(col("l_tax"))).cast("double")
            .as("sum_qt"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(round(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2))) *
                            (1 + CAST(l_tax AS DECIMAL(18,2))), 2)) AS DOUBLE)
               AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) +
                      CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_qt,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  /** JSON extraction (fallback-only in the reference — SURVEY §2.9 "JSON/
    * array/map functions: none columnar"): get_json_object + from_json over
    * the events.props JSON strings. */
  val jsonFns = QueryDef(
    "q_expr_json",
    (spark, dir) => {
      Tables(spark, dir, "events")
        .filter(col("event_id") % 41 === 0)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long")
            .as("k_schema"))
        .withColumn("k2", col("k_path") * 2)
    },
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_schema,
             CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2
      FROM events
      WHERE event_id % 41 = 0"""))

  /** Array functions (nested types are row-fallback in the reference,
    * first-class here): construction, sort, slice, membership, join. */
  val arrayFns = QueryDef(
    "q_expr_array",
    (spark, dir) => {
      Tables(spark, dir, "part")
        .filter(col("p_partkey") % 13 === 0)
        .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
        .select(
          col("p_partkey"),
          size(col("words")).cast("long").as("n_words"),
          array_join(sort_array(col("words")), "|").as("sorted_joined"),
          array_contains(col("words"), "box").as("has_box"),
          array_join(slice(col("words"), 1, 2), " ").as("first_two"),
          element_at(col("words"), -1).as("last_word"),
          array_join(sort_array(array_distinct(col("words"))), ",")
            .as("distinct_words"))
    },
    Some("""
      SELECT p_partkey,
             CAST(len(words) AS BIGINT) AS n_words,
             array_to_string(list_sort(words), '|') AS sorted_joined,
             list_contains(words, 'box') AS has_box,
             array_to_string(words[1:2], ' ') AS first_two,
             words[-1] AS last_word,
             array_to_string(list_sort(list_distinct(words)), ',')
               AS distinct_words
      FROM (SELECT p_partkey, str_split(p_name, ' ') AS words FROM part)
      WHERE p_partkey % 13 = 0"""))

  /** Map functions (nested types are row-fallback in the reference,
    * first-class here): map_from_entries construction over collected
    * (status, count) pairs, element_at lookup with null-on-missing,
    * map_keys, size. The oracle computes identical values relationally. */
  val mapFns = QueryDef(
    "q_expr_map",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderpriority"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("o_orderstatus"), col("cnt"))))).as("m"))
        .select(
          col("o_orderpriority"),
          coalesce(element_at(col("m"), "F"), lit(0L)).as("n_f"),
          coalesce(element_at(col("m"), "O"), lit(0L)).as("n_o"),
          size(col("m")).cast("long").as("n_statuses"),
          concat_ws(",", map_keys(col("m"))).as("statuses"))
    },
    Some("""
      SELECT o_orderpriority,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN cnt END), 0)
                  AS BIGINT) AS n_f,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN cnt END), 0)
                  AS BIGINT) AS n_o,
             CAST(count(*) AS BIGINT) AS n_statuses,
             string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
            FROM orders GROUP BY 1, 2)
      GROUP BY o_orderpriority"""))

  /** Null-safe equality (EqualNullSafe — ColumnarBinaryOperator.scala:38-499);
    * nulls manufactured via nullif. */
  val nullSafeEq = QueryDef.sqlSame(
    "q_expr_nullsafe",
    """SELECT o_orderstatus, count(*) AS n
       FROM orders
       WHERE nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM
             nullif(o_orderstatus, 'P')
         AND NOT (nullif(o_orderstatus, 'O') IS DISTINCT FROM
                  nullif(o_orderstatus, 'O'))
       GROUP BY o_orderstatus""")

  /** InSet (large IN-list switches Catalyst from In to InSet —
    * ColumnarInSetOperator parity) + LIKE with custom escape character. */
  val inSetLike = QueryDef.sqlSame(
    "q_expr_inset_like",
    """SELECT p_brand, count(*) AS n,
              CAST(sum(CASE WHEN p_name LIKE '%^_%' ESCAPE '^'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_underscore
       FROM part
       WHERE p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5',
                         'Brand#6','Brand#7','Brand#8','Brand#9','Brand#10',
                         'Brand#11','Brand#12','Brand#13')
       GROUP BY p_brand""")

  /** Higher-order functions over arrays — transform/filter/aggregate/
    * zip_with, the lambda surface the reference row-falls-back entirely
    * (ARRAY is columnar-unsupported, ConverterUtils.scala:494-508). Lists
    * are built ordered by l_linenumber (collect_list alone has no order
    * guarantee: sort structs, then project) and values are exact cents, so
    * the DuckDB twin (list_transform/list_filter/list_reduce/list_zip)
    * matches element-for-element. */
  val hofFns = QueryDef(
    "q_expr_hof",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        // the sort key is (linenumber, qty, price) on BOTH lists and BOTH
        // engines: linenumber alone ties within an order, and each engine
        // breaks ties differently — the composite key is total, so the
        // permutation is unique and qts/prices stay positionally aligned
        .agg(
          expr("""transform(
                    array_sort(collect_list(named_struct(
                      'k1', l_linenumber,
                      'k2', CAST(round(l_quantity * 100, 0) AS BIGINT),
                      'k3', CAST(round(l_extendedprice * 100, 0) AS BIGINT)))),
                    s -> s.k2)""").as("qts"),
          expr("""transform(
                    array_sort(collect_list(named_struct(
                      'k1', l_linenumber,
                      'k2', CAST(round(l_quantity * 100, 0) AS BIGINT),
                      'k3', CAST(round(l_extendedprice * 100, 0) AS BIGINT)))),
                    s -> s.k3)""").as("prices"))
        .filter(col("l_orderkey") % 97 === 0)
        .select(
          col("l_orderkey"),
          size(col("qts")).cast("long").as("n_items"),
          // arrays are joined to strings: the driver's comparer hashes cell
          // values and cannot sort/hash array-typed cells (r3: numpy
          // unhashable), so every list output ships as a canonical CSV
          expr("array_join(transform(qts, x -> CAST(x * 2 AS STRING)), ',')")
            .as("doubled"),
          expr("array_join(transform(filter(qts, x -> x > 2500)," +
            " x -> CAST(x AS STRING)), ',')").as("big"),
          expr("aggregate(qts, CAST(0 AS BIGINT), (a, b) -> a + b)")
            .as("total_q"),
          expr("array_join(transform(zip_with(qts, prices, (a, b) -> a + b)," +
            " x -> CAST(x AS STRING)), ',')").as("zipped"))
    },
    Some("""
      WITH arrs AS (
        SELECT l_orderkey,
               list(CAST(round(l_quantity * 100, 0) AS BIGINT)
                    ORDER BY l_linenumber,
                             CAST(round(l_quantity * 100, 0) AS BIGINT),
                             CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                 AS qts,
               list(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    ORDER BY l_linenumber,
                             CAST(round(l_quantity * 100, 0) AS BIGINT),
                             CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                 AS prices
        FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey,
             len(qts) AS n_items,
             array_to_string(list_transform(qts, x -> x * 2), ',') AS doubled,
             coalesce(array_to_string(list_filter(qts, x -> x > 2500), ','),
                      '') AS big,
             list_reduce(list_prepend(CAST(0 AS BIGINT), qts),
                         (a, b) -> a + b) AS total_q,
             array_to_string(list_transform(list_zip(qts, prices),
                                            t -> t[1] + t[2]), ',')
               AS zipped
      FROM arrs WHERE l_orderkey % 97 = 0"""))

  /** Second string family — the transform/codec half of the surface
    * (translate/repeat/reverse/split_part/ascii/chr/left/right), dialect-
    * portable and run as identical text on both engines. */
  val stringFns2 = QueryDef.sqlSame(
    "q_expr_string2",
    """SELECT p_partkey,
              translate(p_name, 'aeiou', '_____') AS tr,
              repeat(p_brand, 2) AS rep,
              reverse(p_type) AS rev,
              split_part(p_name, ' ', 2) AS sp2,
              CAST(ascii(p_name) AS INT) AS first_code,
              chr(65 + CAST(p_partkey % 26 AS INT)) AS bucket_ch,
              left(p_name, 5) AS l5,
              right(p_name, 5) AS r5
       FROM part WHERE p_partkey % 7 = 0""")

  val all: Seq[QueryDef] = Seq(
    stringFns, regexFns, mathFns, bitwiseFns, conditionalFns, castFns,
    datetimeFns, decimalFns, jsonFns, arrayFns, mapFns, nullSafeEq, inSetLike,
    hofFns, stringFns2)
}
