package graft.operators

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** Join capability surface.
  *
  * The reference ships three columnar equi-join operators — broadcast hash,
  * shuffled hash, sort-merge — each accepting Inner/LeftSemi/LeftOuter/
  * RightOuter/LeftAnti/Existence (+ null-aware anti), with FullOuter and theta
  * joins falling back to row execution
  * (reference: core/com/intel/oap/execution/ColumnarBroadcastHashJoinExec.scala:93-99,
  * ColumnarShuffledHashJoinExec.scala:105-121, ColumnarSortMergeJoinExec.scala:340-347,
  * ColumnarGuardRule.scala:170, docs/operators.md #22-23).
  *
  * We exercise each physical strategy explicitly via join hints so the bench
  * measures all three, and support FullOuter natively (a free win over the
  * reference). Scale notes: dimension tables (region/nation/customer/supplier)
  * are broadcast — at 100 TB the fact tables (orders/lineitem) shuffle on
  * their join keys only where a shuffle is genuinely required; AQE converts
  * to broadcast at runtime when a filtered side turns out small.
  */
object Joins {

  /** Inner equi-join, broadcast build side (dimension table), then aggregate.
    * Mirrors ColumnarBroadcastHashJoinExec: build customer, stream orders. */
  val innerBhj = QueryDef(
    "q_join_inner_bhj",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val c = Tables(spark, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sumd(col("o_totalprice")).as("revenue"),
          countDistinct(col("c_custkey")).as("n_custs"))
    },
    Some(s"""
      SELECT c_mktsegment, count(*) AS n_orders,
             ${sumdSql("o_totalprice")} AS revenue,
             count(DISTINCT c_custkey) AS n_custs
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment"""))

  /** Same join forced through shuffled-hash (ColumnarShuffledHashJoinExec).
    * At scale this is the choice when both sides are large but one partition's
    * build side fits in memory; co-partitions both sides on the key. */
  val innerShj = QueryDef(
    "q_join_inner_shj",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val c = Tables(spark, dir, "customer").hint("shuffle_hash")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumd(col("c_acctbal")).as("sum_bal"))
    },
    Some(s"""
      SELECT o_orderstatus, count(*) AS n, ${sumdSql("c_acctbal")} AS sum_bal
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY o_orderstatus"""))

  /** Same join forced through sort-merge (ColumnarSortMergeJoinExec) — the
    * scale-safe default when both sides are huge: sort-based, fully spillable. */
  val innerSmj = QueryDef(
    "q_join_inner_smj",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders").hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sumd(col("l_quantity")).as("sum_qty"))
    },
    Some(s"""
      SELECT o_orderpriority, count(*) AS n_items,
             ${sumdSql("l_quantity")} AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  /** TPC-H Q3 shape: 3-way join, filter on both fact sides, top-k by computed
    * revenue (tie-broken on the unique key for cross-engine determinism). */
  val q3TopK = QueryDef(
    "q_join_q3_topk",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sumProdD(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .select(
          col("l_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, epoch_ms(o_orderdate) AS odate_ms,
             ${sumProdDSql("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  /** TPC-H Q5 shape: 6-way snowflake join — region/nation/customer/supplier
    * broadcast, orders/lineitem shuffle once on orderkey. */
  val q5Snowflake = QueryDef(
    "q_join_q5_snowflake",
    (spark, dir) => {
      val r = Tables(spark, dir, "region")
      val n = Tables(spark, dir, "nation")
      val c = Tables(spark, dir, "customer")
      val s = Tables(spark, dir, "supplier")
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables(spark, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
        .join(broadcast(c),
          o("o_custkey") === c("c_custkey") &&
            s("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sumProdD(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""
      SELECT n_name,
             ${sumProdDSql("l_extendedprice", "l_discount")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name"""))

  /** LEFT OUTER join: every customer, order count + spend (0 for orderless). */
  val leftOuter = QueryDef(
    "q_join_left_outer",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sumd(col("o_totalprice")), lit(0.0)).as("spend"))
    },
    Some(s"""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             coalesce(${sumdSql("o_totalprice")}, 0.0) AS spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey"""))

  /** RIGHT OUTER join (probe side preserved). */
  val rightOuter = QueryDef(
    "q_join_right_outer",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 10000.0)
      val c = Tables(spark, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT c_mktsegment, count(o_orderkey) AS n_big_orders,
             count(*) AS n_rows
      FROM (SELECT * FROM orders WHERE o_totalprice > 10000.0) o
      RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment"""))

  /** FULL OUTER join — row-fallback in the reference (ColumnarGuardRule.scala:170),
    * native here. Per-customer open-vs-finished order counts. */
  val fullOuter = QueryDef(
    "q_join_full_outer",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("k_open"))
        .agg(count(lit(1)).as("n_open"))
      val b = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("k_fin"))
        .agg(count(lit(1)).as("n_fin"))
      a.join(b, a("k_open") === b("k_fin"), "full_outer")
        .select(
          coalesce(col("k_open"), col("k_fin")).as("custkey"),
          coalesce(col("n_open"), lit(0L)).as("n_open"),
          coalesce(col("n_fin"), lit(0L)).as("n_fin"))
    },
    Some("""
      SELECT coalesce(k_open, k_fin) AS custkey,
             coalesce(n_open, 0) AS n_open,
             coalesce(n_fin, 0) AS n_fin
      FROM (SELECT o_custkey AS k_open, count(*) AS n_open FROM orders
            WHERE o_orderstatus = 'O' GROUP BY o_custkey) a
      FULL JOIN (SELECT o_custkey AS k_fin, count(*) AS n_fin FROM orders
            WHERE o_orderstatus = 'F' GROUP BY o_custkey) b
      ON k_open = k_fin"""))

  /** LEFT SEMI join (EXISTS): customers with at least one urgent order. */
  val semi = QueryDef(
    "q_join_semi",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"), sumd(col("c_acctbal")).as("sum_bal"))
    },
    Some(s"""
      SELECT c_mktsegment, count(*) AS n_custs,
             ${sumdSql("c_acctbal")} AS sum_bal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment"""))

  /** LEFT ANTI join (NOT EXISTS): customers with no 1998 orders. (The
    * original "no orders at all" predicate matched nothing at sf0.01 —
    * every customer has orders — certifying the anti join on two empty
    * sets; the year restriction keeps ~350 survivor rows.) */
  val anti = QueryDef(
    "q_join_anti",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === 1998)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orderless"))
    },
    Some("""
      SELECT c_nationkey, count(*) AS n_orderless
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND year(o_orderdate) = 1998)
      GROUP BY c_nationkey"""))

  /** Null-aware anti join (NOT IN) — kernel `conditionedProbeArraysAnti_true`
    * in the reference (ColumnarConditionedProbeJoin.scala:151). */
  val antiNullAware = QueryDef.sqlSame(
    "q_join_anti_nullaware",
    """SELECT c_mktsegment, count(*) AS n
       FROM customer
       WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
       GROUP BY c_mktsegment""")

  /** Existence join: IN-subquery under OR forces ExistenceJoin planning. */
  val existence = QueryDef.sqlSame(
    "q_join_existence",
    """SELECT c_mktsegment, count(*) AS n
       FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')
          OR c_acctbal > 9000.0
       GROUP BY c_mktsegment""")

  /** Cross join (CartesianProductExec fallback in the reference). */
  val cross = QueryDef(
    "q_join_cross",
    (spark, dir) => {
      val n = Tables(spark, dir, "nation")
      val r = Tables(spark, dir, "region")
      n.crossJoin(r)
        .select(col("n_name"), col("r_name"))
    },
    Some("SELECT n_name, r_name FROM nation CROSS JOIN region"))

  /** Theta (non-equi band) join — BroadcastNestedLoopJoin fallback in the
    * reference; here the small side is broadcast so the 100 TB plan never
    * shuffles the big side. */
  val thetaBand = QueryDef(
    "q_join_theta_band",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
      val s = Tables(spark, dir, "supplier")
      p.join(broadcast(s),
          p("p_retailprice") >= s("s_acctbal") - 5.0 &&
            p("p_retailprice") <= s("s_acctbal") + 5.0)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some("""
      SELECT p_brand, count(*) AS n_pairs
      FROM part JOIN supplier
        ON p_retailprice >= s_acctbal - 5.0
       AND p_retailprice <= s_acctbal + 5.0
      GROUP BY p_brand"""))

  /** Range join via bucketized equi-join (graft.ops.rangeBucketJoin) — the
    * scale path for interval predicates: one hash shuffle on the bucket id
    * instead of the nested loop the raw theta join [[thetaBand]] plans.
    * Customers counted into per-nation acctbal bands; the oracle is the
    * plain theta join, so the rewrite is verified semantics-preserving. */
  val rangeBucket = QueryDef(
    "q_join_range_bucket",
    (spark, dir) => {
      val bands = Tables(spark, dir, "nation").select(
        col("n_nationkey"),
        (col("n_nationkey") * 400 - 500).cast("double").as("lo"),
        (col("n_nationkey") * 400 + 100).cast("double").as("hi"))
      val c = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      graft.ops.rangeBucketJoin(c, "c_acctbal", bands, "lo", "hi", 500L)
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_custs"))
    },
    Some("""
      SELECT n_nationkey, count(*) AS n_custs
      FROM nation JOIN customer
        ON c_acctbal >= n_nationkey * 400 - 500
       AND c_acctbal <= n_nationkey * 400 + 100
      GROUP BY n_nationkey"""))

  /** NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM): null keys match
    * each other instead of dropping out — the join-side counterpart of the
    * null-aware anti join. Spark plans EqualNullSafe as a hash-join key
    * (coalesced), so this stays a single-shuffle equi-join, not a filter
    * over a cross product. */
  val nullSafeJoin = QueryDef.sql(
    "q_join_nullsafe",
    """WITH a AS (SELECT nullif(o_orderkey % 97, 0) AS k, count(*) AS na
                  FROM orders GROUP BY nullif(o_orderkey % 97, 0)),
            b AS (SELECT nullif(o_orderkey % 97, 0) AS k,
                         CAST(sum(CAST(round(o_totalprice * 100, 0)
                                       AS BIGINT)) AS BIGINT) AS pc
                  FROM orders GROUP BY nullif(o_orderkey % 97, 0))
       SELECT a.k, na, pc FROM a JOIN b ON a.k <=> b.k""",
    """WITH a AS (SELECT nullif(o_orderkey % 97, 0) AS k, count(*) AS na
                  FROM orders GROUP BY nullif(o_orderkey % 97, 0)),
            b AS (SELECT nullif(o_orderkey % 97, 0) AS k,
                         CAST(sum(CAST(round(o_totalprice * 100, 0)
                                       AS BIGINT)) AS BIGINT) AS pc
                  FROM orders GROUP BY nullif(o_orderkey % 97, 0))
       SELECT a.k, na, pc FROM a JOIN b
       ON a.k IS NOT DISTINCT FROM b.k""")

  val all: Seq[QueryDef] = Seq(
    innerBhj, innerShj, innerSmj, q3TopK, q5Snowflake, leftOuter, rightOuter,
    fullOuter, semi, anti, antiNullAware, existence, cross, thetaBand,
    rangeBucket, nullSafeJoin)
}
