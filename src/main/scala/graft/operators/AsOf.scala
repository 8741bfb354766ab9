package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — a time-series operator the reference does
  * not have at all (SURVEY §2.3: "No range/as-of/interval join exists").
  *
  * Implementation is the scale-correct union+window composition rather than
  * a range cross-join: tag left/right rows, union, and for each left row
  * take the last right payload at-or-before it via `last(..., ignoreNulls)`
  * over (key ORDER BY ts, tag). Cost at 100 TB: ONE shuffle on the key —
  * never the O(|L|·|R|) blowup of an inequality join, and never a
  * per-key collect. DuckDB's native ASOF JOIN is the oracle.
  */
object AsOf {

  /** Generic as-of left join: for each row of `left`, attach `payload` from
    * the latest `right` row with right.ts <= left.ts on the same key. */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      payload: Column, payloadName: String): DataFrame = {
    val l = left.withColumn("_tag", lit(1))
      .withColumn("_payload", lit(null).cast("double"))
    val r = right.withColumn("_tag", lit(0))
      .withColumn("_payload", payload.cast("double"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(l.columns.map(col): _*)
      .unionByName(r.select(l.columns.map(col): _*))
      .withColumn(payloadName, last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_payload")
  }

  /** Each click joined to the user's latest at-or-prior purchase value. */
  val clickToPurchase = QueryDef(
    "q_asof_join",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      asOfJoin(clicks, purchases, "user_id", "ts",
          col("value"), "last_purchase_value")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("last_purchase_value")).as("n_with_prior_purchase"),
          sum(col("last_purchase_value").cast("decimal(18,6)")).cast("double")
            .as("sum_last_values"))
    },
    Some("""
      SELECT user_id, count(*) AS n_clicks,
             count(last_purchase_value) AS n_with_prior_purchase,
             CAST(sum(CAST(last_purchase_value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_last_values
      FROM (
        SELECT c.user_id, p.value AS last_purchase_value
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts)
      GROUP BY user_id"""))

  val all: Seq[QueryDef] = Seq(clickToPurchase)
}
