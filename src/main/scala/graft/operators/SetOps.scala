package graft.operators

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** Set-operation + partition-management capability surface.
  *
  * Reference: `ColumnarUnionExec` implements UNION ALL batch-wise; INTERSECT/
  * EXCEPT rewrite to left-semi/left-anti joins + distinct (Catalyst built-in);
  * `ColumnarCoalesceExec` merges partitions without shuffle
  * (reference: core/com/intel/oap/execution/ColumnarBasicPhysicalOperators.scala:271-310,
  * ColumnarCoalesceExec.scala:35-88).
  *
  * Scale notes: UNION ALL is partition concatenation (zero shuffle); UNION/
  * INTERSECT/EXCEPT add one hash-distinct shuffle on the full row — at
  * 100 TB prefer UNION ALL + explicit dedup on a key. `coalesce(n)` narrows
  * without shuffle; `repartition(n, key)` is the explicit-shuffle escape
  * hatch for skew/bucketing.
  */
object SetOps {

  /** UNION ALL — partition concat, no shuffle. */
  val unionAll = QueryDef(
    "q_union_all",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderstatus"), col("o_totalprice"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderstatus"), col("o_totalprice"))
      hi.union(urgent)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("sum_price"))
    },
    Some(s"""
      SELECT o_orderstatus, count(*) AS n,
             ${sumdSql("o_totalprice")} AS sum_price
      FROM (
        SELECT o_orderstatus, o_totalprice FROM orders
        WHERE o_totalprice > 100000.0
        UNION ALL
        SELECT o_orderstatus, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT')
      GROUP BY o_orderstatus"""))

  /** UNION DISTINCT — union + hash-distinct shuffle. */
  val unionDistinct = QueryDef.sqlSame(
    "q_union_distinct",
    """SELECT count(*) AS n_custs FROM (
         SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION
         SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW')""")

  /** INTERSECT — rewritten by Catalyst to left-semi join + distinct. */
  val intersectQ = QueryDef(
    "q_intersect",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val b = o.filter(col("o_totalprice") > 100000.0)
        .select(col("o_custkey"))
      a.intersect(b).agg(count(lit(1)).as("n_both"))
    },
    Some("""
      SELECT count(*) AS n_both FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)"""))

  /** EXCEPT — rewritten to left-anti join + distinct. */
  val exceptQ = QueryDef(
    "q_except",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer").select(col("c_custkey"))
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      c.except(o).agg(count(lit(1)).as("n_no_f"))
    },
    Some("""
      SELECT count(*) AS n_no_f FROM (
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"""))

  /** INTERSECT ALL / EXCEPT ALL (multiset semantics). */
  val intersectAll = QueryDef.sqlSame(
    "q_intersect_all",
    """SELECT count(*) AS n FROM (
         SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
         INTERSECT ALL
         SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')""")

  /** coalesce(n): narrow partition merge, no shuffle
    * (ColumnarCoalesceExec parity). Values unchanged — oracle is the plain
    * aggregate. */
  val coalescePartitions = QueryDef(
    "q_coalesce_partitions",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .coalesce(4)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
    },
    Some(s"""
      SELECT l_linestatus, count(*) AS n, ${sumdSql("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_linestatus"""))

  /** repartition(n, key): explicit hash-shuffle (ColumnarShuffleExchange
    * parity — "hash" splitter, splitter.cc:245-254). */
  val repartitionByKey = QueryDef(
    "q_repartition_hash",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .repartition(16, col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
    },
    Some("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"))

  /** repartitionByRange: range splitter parity (splitter.cc:1215). */
  val repartitionByRangeQ = QueryDef(
    "q_repartition_range",
    (spark, dir) => {
      Tables(spark, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    },
    Some("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"))

  /** unpivot/melt (Dataset.unpivot, Expand-based — the wide→long reshape;
    * the inverse of q_pivot). Each lineitem money column becomes a
    * (measure, cents-sum) row pair per return flag. */
  val unpivotQ = QueryDef(
    "q_unpivot",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sumd(col("l_quantity")).as("qty"),
          sumd(col("l_extendedprice")).as("price"),
          sumd(col("l_discount")).as("disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "v")
    },
    Some(s"""
      SELECT l_returnflag, m.measure, m.v
      FROM (SELECT l_returnflag,
                   ${sumdSql("l_quantity")} AS qty,
                   ${sumdSql("l_extendedprice")} AS price,
                   ${sumdSql("l_discount")} AS disc
            FROM lineitem GROUP BY l_returnflag) t
      CROSS JOIN LATERAL (VALUES ('qty', t.qty), ('price', t.price),
                                 ('disc', t.disc)) m(measure, v)"""))

  /** EXCEPT ALL — bag-semantics difference (multiplicity-aware, unlike
    * EXCEPT's set semantics); summarized to a count so the nondeterministic
    * bag order never reaches the compare. */
  val exceptAll = QueryDef.sqlSame(
    "q_except_all",
    """SELECT count(*) AS n FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""")

  val all: Seq[QueryDef] = Seq(
    unionAll, unionDistinct, intersectQ, exceptQ, intersectAll,
    coalescePartitions, repartitionByKey, repartitionByRangeQ, unpivotQ,
    exceptAll)
}
