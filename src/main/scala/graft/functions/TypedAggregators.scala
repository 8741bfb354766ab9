package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` example (SURVEY §7 step 6 — the
  * Dataset-native UDAF surface the reference lacks entirely; its aggregate
  * whitelist is the six functions in ColumnarHashAggregation.scala:101-196).
  *
  * Exact money sum over a keyed tuple stream: accumulates int64 cents
  * (lossless for the 2-dp fixture columns, same fixed-point discipline as
  * [[graft.Exact]]) and converts to double once at finish — so the typed API
  * result hash-matches the SQL oracle bit-for-bit.
  */
object CentsSumAgg extends Aggregator[(String, Double), Long, Double] {
  override def zero: Long = 0L
  override def reduce(buf: Long, row: (String, Double)): Long =
    buf + math.round(row._2 * 100)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(cents: Long): Double = cents.toDouble / 100.0
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
