package graft.operators

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** Hash-aggregation capability surface.
  *
  * Mirrors the reference's `ColumnarHashAggregateExec` + the six supported
  * aggregate functions Sum/Average/Count/Min/Max/StddevSamp
  * (reference: native-sql-engine/core/src/main/scala/com/intel/oap/expression/ColumnarHashAggregation.scala:101-196)
  * plus distinct-aggregate rewrite and Expand-based grouping sets
  * (reference: .../execution/ColumnarExpandExec.scala:37-136).
  * Spark plans these as partial/final HashAggregate pairs with map-side
  * combine automatically; at 100 TB the only knobs that matter are key
  * cardinality (bounded here) and AQE partition coalescing (on).
  */
object Aggregates {

  /** TPC-H Q1 adapted to the testdata schema (l_shipdate is a timestamp).
    * scan → filter → partial agg → shuffle → final agg → sort. */
  val q1Agg = QueryDef(
    "q1_agg",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sumProdD(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          avgd(col("l_quantity")).as("avg_qty"),
          avgd(col("l_extendedprice")).as("avg_price"),
          avgd(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sumdSql("l_quantity")} AS sum_qty,
             ${sumdSql("l_extendedprice")} AS sum_base_price,
             ${sumProdDSql("l_extendedprice", "l_discount")} AS sum_disc_price,
             ${avgdSql("l_quantity")} AS avg_qty,
             ${avgdSql("l_extendedprice")} AS avg_price,
             ${avgdSql("l_discount")} AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** COUNT(DISTINCT) — Catalyst rewrites to a two-stage agg over Expand,
    * the same planning the reference relies on (SURVEY §2.4 "distinct"). */
  val aggDistinct = QueryDef(
    "q_agg_distinct",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_fs"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT (l_returnflag, l_linestatus)) AS n_fs,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag"""))

  /** min/max/count on ints, doubles, strings, timestamps — all exact
    * pass-through values, no FP accumulation. Timestamps are emitted as
    * epoch millis so both engines hash the same integer. */
  val aggMinMax = QueryDef(
    "q_agg_minmax",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_custkey")).as("min_cust"),
          max(col("o_custkey")).as("max_cust"),
          min(col("o_orderstatus")).as("min_status"),
          unix_millis(min(col("o_orderdate")).cast("timestamp")).as("min_date_ms"),
          unix_millis(max(col("o_orderdate")).cast("timestamp")).as("max_date_ms"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT o_orderpriority,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price,
             min(o_custkey) AS min_cust,
             max(o_custkey) AS max_cust,
             min(o_orderstatus) AS min_status,
             epoch_ms(min(o_orderdate)) AS min_date_ms,
             epoch_ms(max(o_orderdate)) AS max_date_ms,
             count(*) AS n
      FROM orders GROUP BY o_orderpriority"""))

  /** stddev_samp / var_samp, the reference's sixth aggregate
    * (ColumnarHashAggregation.scala:178 StddevSamp). FP-iteration-order
    * sensitive in both engines, so the oracle recomputes from exact decimal
    * moments; the Spark side exercises the built-in and we verify it agrees
    * with the exact formula to 1e-6 in GraftSpec, while the oracle row uses
    * the same closed form on both sides for bit-equality. */
  val aggStddev = QueryDef(
    "q_agg_stddev",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      // exact fixed-point moments -> one identical double expression both sides
      val s1 = sum(cents(col("l_quantity"))).cast("double") / lit(100.0)
      val s2 = sum(cents(col("l_quantity")) * cents(col("l_quantity")))
        .cast("double") / lit(10000.0)
      val n = count(col("l_quantity")).cast("double")
      li.groupBy(col("l_returnflag"))
        .agg(
          sqrt((s2 - (s1 * s1) / n) / (n - lit(1.0))).as("stddev_qty"),
          ((s2 - (s1 * s1) / n) / (n - lit(1.0))).as("var_qty"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT l_returnflag,
        sqrt((s2 - (s1*s1)/n) / (n - 1.0)) AS stddev_qty,
        ((s2 - (s1*s1)/n) / (n - 1.0)) AS var_qty,
        n_rows
      FROM (
        SELECT l_returnflag,
          CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
            / 100.0 AS s1,
          CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT) *
                   CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
            / 10000.0 AS s2,
          CAST(count(l_quantity) AS DOUBLE) AS n,
          count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag)"""))

  /** ROLLUP — Expand-based grouping sets
    * (reference: ColumnarExpandExec.scala:37-136). */
  val rollup = QueryDef.sqlSame(
    "q_rollup",
    s"""SELECT coalesce(l_returnflag, '<all>') AS flag,
              coalesce(l_linestatus, '<all>') AS status,
              ${sumdSql("l_quantity")} AS sum_qty,
              count(*) AS n
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""")

  /** CUBE over two dims. */
  val cube = QueryDef.sqlSame(
    "q_cube",
    s"""SELECT coalesce(o_orderstatus, '<all>') AS status,
              coalesce(o_orderpriority, '<all>') AS prio,
              ${sumdSql("o_totalprice")} AS sum_price,
              count(*) AS n
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)""")

  /** Explicit GROUPING SETS with grouping() marker columns. */
  val groupingSets = QueryDef.sqlSame(
    "q_grouping_sets",
    """SELECT coalesce(l_returnflag, '<all>') AS flag,
              coalesce(l_linestatus, '<all>') AS status,
              CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
              CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
              count(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                               (l_returnflag, l_linestatus), ())""")

  /** global (no-key) aggregate — reference special-cases the zero-grouping
    * path (ColumnarHashAggregateExec.scala:151-213). */
  val aggGlobal = QueryDef(
    "q_agg_global",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.agg(
        sumd(col("l_extendedprice")).as("sum_price"),
        avgd(col("l_discount")).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },
    Some(s"""
      SELECT ${sumdSql("l_extendedprice")} AS sum_price,
             ${avgdSql("l_discount")} AS avg_disc,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             count(*) AS n,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem"""))

  /** HAVING clause (post-aggregation filter). */
  val having = QueryDef.sqlSame(
    "q_agg_having",
    s"""SELECT o_custkey, count(*) AS n_orders,
              ${sumdSql("o_totalprice")} AS spend
       FROM orders
       GROUP BY o_custkey
       HAVING count(*) >= 12""")

  /** Pivot (groupBy().pivot().agg()) — planned as conditional aggregation;
    * the oracle spells out the rewrite. */
  val pivot = QueryDef(
    "q_pivot",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sumd(col("o_totalprice")))
        .select(col("o_orderpriority"), col("F").as("sum_f"),
          col("O").as("sum_o"), col("P").as("sum_p"))
    },
    Some(s"""
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus = 'F'
                           THEN ${centsSql("o_totalprice")} END)
                  AS DOUBLE) / 100.0 AS sum_f,
             CAST(sum(CASE WHEN o_orderstatus = 'O'
                           THEN ${centsSql("o_totalprice")} END)
                  AS DOUBLE) / 100.0 AS sum_o,
             CAST(sum(CASE WHEN o_orderstatus = 'P'
                           THEN ${centsSql("o_totalprice")} END)
                  AS DOUBLE) / 100.0 AS sum_p
      FROM orders GROUP BY o_orderpriority"""))

  /** Exact percentiles (sort-based `percentile`, linear interpolation) over
    * the integral-valued quantity column. */
  val percentile = QueryDef(
    "q_agg_percentile",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS p50,
             quantile_cont(l_quantity, 0.25) AS p25,
             quantile_cont(l_quantity, 0.9) AS p90,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  /** approx_percentile beside the exact percentiles — Spark's built-in
    * Greenwald-Khanna quantile sketch (bounded state per group, one
    * partial/merge/final pass; the scale path where exact percentile's
    * full-sort-per-group is not affordable). At accuracy 1e6 the GK bound
    * (relativeError·N < 0.5 ranks for any group under ~500k rows) pins the
    * sketch to the EXACT discrete percentile, so the row is
    * DuckDB-oracle-checked against quantile_disc; the loose-accuracy
    * behavior stays pinned in KmvSpec alongside the other sketch bounds.
    * (GK rank convention = DuckDB quantile_disc: smallest element whose
    * rank >= ceil(p*N).) */
  val aggApproxPercentile = QueryDef(
    "q_agg_approx_percentile",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 1000000)").as("ap50"),
          expr("approx_percentile(l_quantity, 0.9, 1000000)").as("ap90"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS ap50,
             quantile_disc(l_quantity, 0.9) AS ap90, count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  /** Custom KLL-style quantile sketch UDAF (graft.functions.KllQuantile)
    * beside the built-in GK sketch above — mergeable partial/merge/final
    * with O(k·log n) state per group and DETERMINISTIC compaction (no
    * random coin), so the row reproduces run-to-run. The sketch VALUES are
    * compaction-dependent, so the registry row emits the DERIVED facts the
    * sketch promises instead: the TRUE RANK of each returned quantile sits
    * within ±3% of its target (the rank-error guarantee, measured by
    * joining the sketch output back against the raw rows in exact integer
    * arithmetic: |100·cnt≤q − p·n| ≤ 3n) — the oracle checks rank_ok=1 per
    * group, so the guarantee itself is a driver-checked fact. Raw sketch
    * values stay pinned in KllSpec. */
  val aggKllQuantile = QueryDef(
    "q_agg_kll_quantile",
    (spark, dir) => {
      val li = Tables.spread(spark, dir, "lineitem")
      val sk = li.groupBy(col("l_returnflag"))
        .agg(
          expr("kll_quantile(l_extendedprice, 0.5D)").as("kp50"),
          expr("kll_quantile(l_extendedprice, 0.95D)").as("kp95"))
      li.join(broadcast(sk), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") <= col("kp50"), 1L)
            .otherwise(0L)).as("c50"),
          sum(when(col("l_extendedprice") <= col("kp95"), 1L)
            .otherwise(0L)).as("c95"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("c50") * 100 - col("n") * 50) <= col("n") * 3)
            .cast("int").as("rank50_ok"),
          (abs(col("c95") * 100 - col("n") * 95) <= col("n") * 3)
            .cast("int").as("rank95_ok"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             1 AS rank50_ok, 1 AS rank95_ok
      FROM lineitem GROUP BY l_returnflag"""))

  /** MATERIALIZED KLL rollup — the quantile member of the sketch-table
    * family beside `kmv_state`: per-(flag, ship-month) binary sketch
    * states re-aggregated to per-flag quantiles via `kll_merge`, with a
    * THREE-level path (month → quarter states → final) run through
    * `kll_merge_state` beside it. KLL merging is mergeable-but-not-
    * lossless (compaction order shifts survivors), so the driver-checked
    * claim is the GUARANTEE: both rollup paths' p50/p95 sit within the
    * ±3% true-rank envelope measured against the raw rows — same derived-
    * fact discipline as [[aggKllQuantile]]. */
  val aggKllRollup = QueryDef(
    "q_agg_kll_rollup",
    (spark, dir) => {
      graft.plans.GraftFunctions.ensureRegistered(spark)
      val li = Tables(spark, dir, "lineitem")
      val monthly = li
        .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("mo"))
        .agg(expr("kll_state(l_extendedprice)").as("st"))
      val twoLevel = monthly.groupBy(col("l_returnflag"))
        .agg(expr("kll_merge(st, 0.5D)").as("kp50"))
      val threeLevel = monthly
        .withColumn("qr", expr("(mo + 2) div 3"))
        .groupBy(col("l_returnflag"), col("qr"))
        .agg(expr("kll_merge_state(st)").as("st"))
        .groupBy(col("l_returnflag"))
        .agg(expr("kll_merge(st, 0.95D)").as("kp95"))
      val sk = twoLevel.join(threeLevel, "l_returnflag")
      li.join(broadcast(sk), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") <= col("kp50"), 1L)
            .otherwise(0L)).as("c50"),
          sum(when(col("l_extendedprice") <= col("kp95"), 1L)
            .otherwise(0L)).as("c95"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("c50") * 100 - col("n") * 50) <= col("n") * 3)
            .cast("int").as("rank50_ok"),
          (abs(col("c95") * 100 - col("n") * 95) <= col("n") * 3)
            .cast("int").as("rank95_ok"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             1 AS rank50_ok, 1 AS rank95_ok
      FROM lineitem GROUP BY l_returnflag"""))

  /** Aggregation over genuinely-null inputs: count(col) skips nulls,
    * sum of an all-null slice is NULL, avg ignores nulls. */
  val aggNulls = QueryDef.sqlSame(
    "q_agg_nulls",
    s"""SELECT o_orderstatus,
              count(*) AS n_rows,
              count(v) AS n_vals,
              coalesce(CAST(sum(${centsSql("v")}) AS DOUBLE) / 100.0, -1.0)
                AS sum_v,
              CAST(count(CASE WHEN v IS NULL THEN 1 END) AS BIGINT) AS n_nulls
       FROM (SELECT o_orderstatus,
                    CASE WHEN o_totalprice < 50000.0 THEN NULL
                         ELSE o_totalprice END AS v
             FROM orders)
       GROUP BY o_orderstatus""")

  /** Typed Dataset aggregation through a custom Aggregator[IN,BUF,OUT]
    * (graft.functions.CentsSumAgg) — groupByKey + typed agg, the
    * Dataset-native UDAF surface absent from the reference. Plans as a
    * regular partial/final aggregate over the shuffled key. */
  val aggTyped = QueryDef(
    "q_agg_typed",
    (spark, dir) => {
      import spark.implicits._
      Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .as[(String, Double)]
        .groupByKey(_._1)
        .agg(graft.functions.CentsSumAgg.toColumn.name("sum_qty"))
        .toDF("flag", "sum_qty")
    },
    Some(s"""
      SELECT l_returnflag AS flag, ${sumdSql("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_returnflag"""))

  /** Decimal-NATIVE aggregation (the reference's decimal128 agg path —
    * actions_impl.cc decimal actions with PromotePrecision/CheckOverflow).
    * Everywhere else money sums route through exact int64 cents for speed
    * (Oracle.scala); this query pins the decimal path itself: Spark plans
    * sum(decimal(18,2)) with +10 precision headroom — decimal(28,2) — so a
    * `sum_big` whose per-row values sit AT the decimal(18,2) boundary
    * (o_orderkey%1e5·1e11 → up to 16 integer digits, the type's max; the
    * modulus keeps the per-row value inside the cast at EVERY scale factor —
    * ADVICE r3: the unbounded key overflowed beyond sf0.01) and whose group
    * totals exceed anything decimal(18,2) could hold must still come out
    * exact. The avg is
    * decimal-division with explicit casts so both engines round identically.
    * Same text runs on DuckDB (which promotes to decimal(38,2) — wider, same
    * values). */
  val aggDecimalSum = QueryDef.sqlSame(
    "q_agg_decimal_sum",
    // outputs go through STRING: the exact decimal digits are the assertion
    // (a raw decimal column degrades to float64 in the compare harness's
    // pandas frame once DuckDB promotes the sum to DECIMAL(38,2))
    """SELECT o_orderstatus,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
                AS sum_price,
              CAST(sum(CAST(o_orderkey % 100000 * 100000000000
                            AS DECIMAL(18,2)))
                   AS STRING) AS sum_big,
              CAST(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS DECIMAL(38,6))
                        / CAST(count(*) AS DECIMAL(19,0)) AS DECIMAL(22,6))
                   AS STRING) AS avg_price,
              CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
                AS min_price,
              CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
                AS max_price
       FROM orders
       GROUP BY o_orderstatus""")

  /** ObjectHashAggregate path: collect_set (a TypedImperativeAggregate with
    * an object buffer — a physically different aggregate exec from the
    * row-buffer HashAggregate every other query uses) plus max_by/min_by.
    * The set is emitted sorted+joined so the oracle is order-free; the
    * argmax keys are unique per group in the fixture (checked), so
    * max_by/min_by are deterministic. */
  val aggCollect = QueryDef(
    "q_agg_collect",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
            .as("prios"),
          max_by(col("o_custkey"), col("o_totalprice")).as("best_cust"),
          min_by(col("o_custkey"), col("o_totalprice")).as("worst_cust"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT o_orderstatus,
             string_agg(DISTINCT o_orderpriority, ','
                        ORDER BY o_orderpriority) AS prios,
             arg_max(o_custkey, o_totalprice) AS best_cust,
             arg_min(o_custkey, o_totalprice) AS worst_cust,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus"""))

  /** EXACT distinct counting via mergeable roaring-style bitmaps (Spark
    * 3.5+ bitmap family) — the scale path for COUNT(DISTINCT key) over a
    * huge integer domain: keys hash-route to 32k-bit buckets, each bucket
    * aggregates to one fixed-size bitmap (`bitmap_construct_agg` of
    * `bitmap_bit_position`), and the final count is a popcount sum. Unlike
    * the planner's distinct Expand rewrite this never carries raw keys past
    * the first shuffle — per (group, bucket) the shuffled payload is a
    * constant ≤4 KB bitmap regardless of row count, and bitmaps OR-merge
    * associatively, so the same plan serves incremental/rollup re-merge
    * (the `bitmap_or_agg` path the spec pins). The oracle is plain
    * count(DISTINCT): the bitmap path must be bit-exact, not approximate. */
  val aggBitmapDistinct = QueryDef(
    "q_agg_bitmap_distinct",
    (spark, dir) => {
      // spread view under its own name: shadowing "lineitem" would leak a
      // repartitioned plan into every later SQL-text query (registerAll
      // re-registers only on dir change)
      Tables.spread(spark, dir, "lineitem")
        .createOrReplaceTempView("lineitem_spread_bm")
      // pre-reduce to DISTINCT (flag, key) pairs first: bitmaps are
      // set-semantic so the result is identical, but bitmap_construct_agg
      // plans as a SortAggregate (object buffer) — feeding it the narrow
      // distinct-pair hash aggregate instead of raw lineitem keeps the
      // sort off the corpus (same rewrite as q_agg_kmv_sketch)
      spark.sql("""
        SELECT l_returnflag,
               CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_orders
        FROM (SELECT l_returnflag,
                     bitmap_bucket_number(l_orderkey) AS bkt,
                     bitmap_construct_agg(bitmap_bit_position(l_orderkey))
                       AS bm
              FROM (SELECT DISTINCT l_returnflag, l_orderkey
                    FROM lineitem_spread_bm)
              GROUP BY 1, 2)
        GROUP BY l_returnflag""")
    },
    Some("""
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY 1"""))

  /** Approximate distinct via Apache-DataSketches-compatible HLL (Spark
    * 3.5+ `hll_sketch_agg`) — the OTHER mergeable-sketch distinct path:
    * where the bitmap family is exact but domain-bounded (int keys), HLL is
    * fixed 2^lgK bytes for ANY key type and cardinality. The estimate is
    * engine-specific (HIP is insertion-order dependent — NOT bit-stable
    * across partitionings), so the registry row emits the DERIVED fact
    * instead: the estimate lands inside the ±5% envelope of the exact
    * count, which the oracle checks as envelope=1 per group — the driver
    * gate now sees the sketch's accuracy claim directly. Raw estimates +
    * union-agg mergeability stay pinned in HllSpec; when the pipeline
    * needs a deterministic, cross-engine-replayable sketch, that is what
    * `kmv_distinct_det` (q_agg_kmv_sketch) is for. */
  val aggHllDistinct = QueryDef(
    "q_agg_hll_distinct",
    (spark, dir) => {
      Tables.spread(spark, dir, "lineitem")
        .createOrReplaceTempView("lineitem_spread_hll")
      // sketch over pre-distinct pairs (set-semantic, estimate-identical)
      // — avoids the mixed distinct/sketch Expand rewrite over the raw
      // corpus, the same pre-aggregate lever as q_agg_kmv_sketch
      spark.sql("""
        SELECT l_returnflag,
               count(l_orderkey) AS exact_orders,
               CAST(abs(CAST(hll_sketch_estimate(hll_sketch_agg(l_orderkey))
                             AS BIGINT) - count(l_orderkey)) * 100
                    <= count(l_orderkey) * 5 AS INT) AS within_5pct
        FROM (SELECT DISTINCT l_returnflag, l_orderkey
              FROM lineitem_spread_hll)
        GROUP BY l_returnflag""")
    },
    Some("""
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
             1 AS within_5pct
      FROM lineitem GROUP BY l_returnflag"""))

  val all: Seq[QueryDef] = Seq(
    q1Agg, aggDistinct, aggMinMax, aggStddev, rollup, cube, groupingSets,
    aggGlobal, having, pivot, percentile, aggApproxPercentile,
    aggKllQuantile, aggKllRollup, aggNulls, aggTyped, aggDecimalSum,
    aggCollect, aggBitmapDistinct, aggHllDistinct)
}
