package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert) semantics expressed Spark-first: a parquet lake has
  * no transactional merge, so the canonical batch pattern is ONE full-outer
  * join of base vs. change-set on the key, classifying every row as
  * keep / update / insert and coalescing the payload — exactly what table
  * formats (Delta/Iceberg) execute under the hood for copy-on-write merge.
  * At 100 TB both sides hash-shuffle once on the key (or zero shuffles if
  * both are bucketed on it — ScalePatternsSpec pins that layout); the
  * change-set is usually broadcast-sized, which AQE demotes to BHJ
  * automatically. Money stays in exact int64 cents.
  */
object Mutations {

  val mergeUpsert = QueryDef(
    "q_merge_upsert",
    (spark, dir) => {
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("pc"))
      // change-set: a 10% price bump on every 13th order, plus brand-new
      // orders derived from every 31st key (disjoint id space)
      val upd = base.filter(col("k") % 13 === 0)
        .select(col("k"), col("st"), expr("pc * 110 div 100").as("pc"))
        .unionAll(base.filter(col("k") % 31 === 0)
          .select((col("k") + lit(100000000L)).as("k"), lit("N").as("st"),
            col("pc")))
      val merged = base.as("b")
        .join(upd.as("u"), col("b.k") === col("u.k"), "full_outer")
        .select(
          when(col("u.k").isNull, "keep")
            .when(col("b.k").isNull, "insert")
            .otherwise("update").as("action"),
          coalesce(col("u.st"), col("b.st")).as("status"),
          coalesce(col("u.pc"), col("b.pc")).as("pc"))
      merged.groupBy(col("action"), col("status"))
        .agg(count(lit(1)).as("n"),
          (sum(col("pc")).cast("double") / lit(100.0)).as("total_price"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc
        FROM orders),
      upd AS (
        SELECT k, st, pc * 110 // 100 AS pc FROM base WHERE k % 13 = 0
        UNION ALL
        SELECT k + 100000000, 'N', pc FROM base WHERE k % 31 = 0),
      m AS (
        SELECT CASE WHEN u.k IS NULL THEN 'keep'
                    WHEN b.k IS NULL THEN 'insert'
                    ELSE 'update' END AS action,
               coalesce(u.st, b.st) AS status,
               coalesce(u.pc, b.pc) AS pc
        FROM base b FULL OUTER JOIN upd u ON b.k = u.k)
      SELECT action, status, count(*) AS n,
             CAST(sum(pc) AS DOUBLE) / 100.0 AS total_price
      FROM m GROUP BY action, status"""))

  /** Library API: generic SCD-Type-2 merge of a change-set into a history
    * table. `hist` carries (keyCol, payload…, version BIGINT, is_current
    * BOOLEAN); `changes` carries (keyCol, payload…) with at most one row
    * per key (dedup upstream — [[graft.ops.dedupKeepBest]] if the stream
    * can repeat keys). Changed keys close their current version
    * (is_current=false) and open version max+1; new keys open at
    * version 1; untouched keys pass through.
    *
    * Scale shape: ONE left join of history against the (typically small,
    * broadcastable) change key set to flip is_current, one join of changes
    * against current versions for the version counter, one union — no
    * iteration, no window over history. This is the per-microbatch MERGE a
    * streaming foreachBatch sink runs (StreamingSpec pins exactly-once
    * across a checkpoint restart). */
  def scd2Merge(hist: org.apache.spark.sql.DataFrame,
      changes: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame = {
    val payload = changes.columns.filterNot(_ == keyCol)
    val chKeys = changes.select(col(keyCol)).distinct()
      .withColumn("sc_ch", lit(1))
    val closed = hist.join(broadcast(chKeys), Seq(keyCol), "left")
      .withColumn("is_current", col("is_current") && col("sc_ch").isNull)
      .drop("sc_ch")
    val curVer = hist.filter(col("is_current"))
      .select(col(keyCol), col("version").as("sc_cur_ver"))
    val opened = changes.join(curVer, Seq(keyCol), "left")
      .select(col(keyCol) +: payload.map(col) :+
        coalesce(col("sc_cur_ver") + 1, lit(1L)).as("version") :+
        lit(true).as("is_current"): _*)
    closed.unionByName(opened.select(hist.columns.map(col): _*))
  }

  /** SCD-Type-2 history build from the same change-set, THROUGH the
    * generic [[scd2Merge]] operator (the oracle replays the close/open
    * semantics directly): updated keys close their current version and
    * open version 2; untouched keys stay current. */
  val scd2 = QueryDef(
    "q_merge_scd2",
    (spark, dir) => {
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("pc"))
      val hist = base.select(col("k"), col("st"), col("pc"),
        lit(1L).as("version"), lit(true).as("is_current"))
      val changes = base.filter(col("k") % 13 === 0)
        .select(col("k"), col("st"), expr("pc * 110 div 100").as("pc"))
      scd2Merge(hist, changes, "k")
        .groupBy(col("is_current"), col("version"), col("st").as("status"))
        .agg(count(lit(1)).as("n"),
          (sum(col("pc")).cast("double") / lit(100.0)).as("total_price"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc
        FROM orders),
      hist AS (
        SELECT k, st, pc, 1 AS version, false AS is_current
        FROM base WHERE k % 13 = 0
        UNION ALL
        SELECT k, st, pc * 110 // 100, 2, true FROM base WHERE k % 13 = 0
        UNION ALL
        SELECT k, st, pc, 1, true FROM base WHERE k % 13 <> 0)
      SELECT is_current, CAST(version AS BIGINT) AS version, st AS status,
             count(*) AS n,
             CAST(sum(pc) AS DOUBLE) / 100.0 AS total_price
      FROM hist GROUP BY is_current, version, st"""))

  /** Incremental materialized-view refresh — the maintenance pattern for a
    * 100 TB rollup: the standing view stores ALGEBRAIC partials
    * (count + exact cents sum per key), a new data slice aggregates to the
    * same partial shape, and refresh = union + re-aggregate of partials —
    * touching only the delta, never rescanning history. Derived metrics
    * (avg) come from the merged partials at read time. The ORACLE is the
    * full recompute over all rows: incremental must equal full, exactly. */
  val mvRefresh = QueryDef(
    "q_mv_refresh",
    (spark, dir) => {
      val orders = Tables(spark, dir, "orders")
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_orderstatus").as("status"),
          year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("pc"))
      val standing = partial(orders.filter(col("o_orderdate") < "1999-01-01"))
      val delta = partial(orders.filter(col("o_orderdate") >= "1999-01-01"))
      standing.unionAll(delta)
        .groupBy(col("status"), col("yr"))
        .agg(sum(col("n")).as("n_orders"),
          (sum(col("pc")).cast("double") / lit(100.0)).as("total_price"))
        .withColumn("avg_price",
          col("total_price") / col("n_orders").cast("double"))
    },
    Some("""
      SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0 AS total_price,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0
               / CAST(count(*) AS DOUBLE) AS avg_price
      FROM orders GROUP BY o_orderstatus, year(o_orderdate)"""))

  /** Right-to-be-forgotten cascade census: for each child table, the rows
    * a purge of `rootKeys` would delete (left-semi against the key set)
    * plus an fk-sum checksum pinning exact membership. One semi-join per
    * table, each keyed on its own fk — at 100 TB every leg is one keyed
    * shuffle (or a broadcast when the deletion batch is small, the usual
    * case), nothing driver-side. */
  def purgeCascade(rootKeys: DataFrame, keyCol: String,
      children: Seq[(String, DataFrame, String)]): DataFrame = {
    val keys = rootKeys.select(col(keyCol).as("graft_pk")).distinct()
    children.map { case (name, df, fk) =>
      df.join(keys, df(fk) === col("graft_pk"), "left_semi")
        .agg(count(lit(1)).as("n_purged"),
          coalesce(sum(col(fk)), lit(0L)).as("fk_sum"))
        .select(lit(name).as("table_name"), col("n_purged"), col("fk_sum"))
    }.reduce(_ unionAll _)
  }

  /** GDPR deletion propagation: customers whose md5(c_name) starts with
    * nibble '0' request erasure; the census walks the fk graph — their
    * customer rows, their orders, those orders' lineitems (second hop),
    * and their events — reporting per-table purge counts + fk-sum
    * checksums. The oracle replays the same semi-join cascade. */
  val purge = QueryDef(
    "q_mutation_purge",
    (spark, dir) => {
      val customer = Tables(spark, dir, "customer")
      val orders = Tables(spark, dir, "orders")
      val lineitem = Tables(spark, dir, "lineitem")
      val events = Tables(spark, dir, "events")
      val flagged = customer
        .filter(substring(md5(col("c_name").cast("binary")), 1, 1) === "0")
        .select(col("c_custkey"))
      val purgedOrders = orders.join(
        flagged.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left_semi")
      purgeCascade(flagged, "c_custkey", Seq(
        ("customer", customer, "c_custkey"),
        ("orders", orders, "o_custkey"),
        ("events", events, "user_id")))
        .unionAll(purgeCascade(purgedOrders, "o_orderkey", Seq(
          ("lineitem", lineitem, "l_orderkey"))))
    },
    Some("""
      WITH flagged AS (
        SELECT c_custkey FROM customer WHERE substr(md5(c_name), 1, 1) = '0'),
      po AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM flagged))
      SELECT 'customer' AS table_name, count(*) AS n_purged,
             CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS fk_sum
      FROM customer WHERE c_custkey IN (SELECT c_custkey FROM flagged)
      UNION ALL
      SELECT 'orders', count(*),
             CAST(coalesce(sum(o_custkey), 0) AS BIGINT)
      FROM orders WHERE o_custkey IN (SELECT c_custkey FROM flagged)
      UNION ALL
      SELECT 'events', count(*),
             CAST(coalesce(sum(user_id), 0) AS BIGINT)
      FROM events WHERE user_id IN (SELECT c_custkey FROM flagged)
      UNION ALL
      SELECT 'lineitem', count(*),
             CAST(coalesce(sum(l_orderkey), 0) AS BIGINT)
      FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM po)"""))

  /** Library API: point-in-time (temporal) join — every fact row picks the
    * dimension version whose validity interval `[fromCol, toCol)` covers
    * the fact timestamp. The consumer side of [[scd2Merge]]: the merge
    * writes the history, this reads it "as of" each fact's own clock,
    * which is what makes an SCD2 table useful at all (joining on
    * is_current silently rewrites history under old facts).
    *
    * Scale shape: an EQUI-join on the dimension key — the interval check
    * rides along as a join post-condition, so the planner still hashes /
    * broadcasts on the key and never degrades to a range join. Version
    * fan-out per key is the dimension's change count (tiny by
    * construction: SCD2 dims grow by versions, not by facts), so the
    * dimension side stays broadcast-sized at any fact scale. */
  def pitJoin(fact: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame, factKey: String, dimKey: String,
      tsCol: String, fromCol: String, toCol: String)
      : org.apache.spark.sql.DataFrame =
    fact.join(broadcast(dim),
      fact(factKey) === dim(dimKey) &&
        fact(tsCol) >= dim(fromCol) && fact(tsCol) < dim(toCol))

  /** Point-in-time revenue census over a two-version customer-segment
    * history: each customer's segment flips to its lowercase form at an
    * md5-derived switch date, and every order is attributed to the segment
    * that was true ON ITS ORDER DATE. The deterministic history makes the
    * whole temporal join replayable in DuckDB. */
  val pitJoinQ = QueryDef(
    "q_scd2_pit_join",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
      val switch = expr("TIMESTAMP '1996-01-01 00:00:00' + " +
        "make_interval(0, 0, 0, CAST(conv(substr(md5(CAST(c_custkey AS " +
        "STRING)), 1, 6), 16, 10) % 1500 AS INT), 0, 0, 0)")
      val lo = expr("TIMESTAMP '1990-01-01 00:00:00'")
      val hi = expr("TIMESTAMP '2099-01-01 00:00:00'")
      val dim = cust.select(col("c_custkey"), col("c_mktsegment")
            .as("segment"), lo.as("valid_from"), switch.as("valid_to"))
        .unionAll(cust.select(col("c_custkey"),
          lower(col("c_mktsegment")).as("segment"),
          switch.as("valid_from"), hi.as("valid_to")))
      val orders = Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"),
          graft.Exact.cents(col("o_totalprice")).as("pc"))
      pitJoin(orders, dim, "o_custkey", "c_custkey",
          "o_orderdate", "valid_from", "valid_to")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("pc")).as("rev_cents"))
    },
    Some("""
      WITH sw AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '1996-01-01' + INTERVAL (('0x' ||
                 substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT
                 % 1500) DAY AS switch_ts
        FROM customer),
      dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1990-01-01' AS valid_from, switch_ts AS valid_to
        FROM sw
        UNION ALL
        SELECT c_custkey, lower(c_mktsegment), switch_ts,
               TIMESTAMP '2099-01-01'
        FROM sw)
      SELECT d.segment, count(*) AS n_orders,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS rev_cents
      FROM orders o JOIN dim d
        ON o.o_custkey = d.c_custkey
       AND o.o_orderdate >= d.valid_from AND o.o_orderdate < d.valid_to
      GROUP BY d.segment"""))

  val all: Seq[QueryDef] = Seq(mergeUpsert, scd2, mvRefresh, purge, pitJoinQ)
}
