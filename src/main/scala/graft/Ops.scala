package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.Bridge

/** Library-level operator API built on the custom Catalyst machinery. */
object ops {

  /** Cosine top-k join: for each row of `queries` (id, embedding), the k
    * nearest rows of `candidates` (id, embedding) by cosine similarity.
    * Plans via [[graft.plans.CosineTopKJoin]] → broadcast cross + codegen'd
    * score + per-query window (see ResolveCosineTopK). `queries` must be
    * broadcast-sized; `candidates` streams at any scale. */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    Bridge.ofRows(
      queries.sparkSession,
      graft.plans.CosineTopKJoin(
        queries.queryExecution.analyzed,
        candidates.queryExecution.analyzed,
        k))

  /** As-of (nearest-prior) join — see [[graft.operators.AsOf.asOfJoin]]:
    * union + last-ignoring-nulls window, ONE shuffle on the key, never an
    * inequality-join blowup. */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      payload: org.apache.spark.sql.Column, payloadName: String): DataFrame =
    graft.operators.AsOf.asOfJoin(left, right, key, ts, payload, payloadName)

  /** Interval (range) join at scale: rows of `points` whose `ptCol` falls in
    * `[loCol, hiCol]` of `intervals`. A naive theta join plans as a nested
    * loop (O(|L|·|R|)); this composes existing operators instead: bucketize
    * the point, explode each interval into every bucket it overlaps, equi-
    * join on the bucket (ONE shuffle, hash-partitioned), then apply the
    * exact predicate. Interval rows replicate once per overlapped bucket —
    * choose `bucketWidth` near the typical interval length so replication
    * stays O(1) per row. Column names must be distinct across the inputs. */
  def rangeBucketJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    import org.apache.spark.sql.functions._
    val b = "__graft_bucket"
    val lb = points.withColumn(b,
      floor(col(ptCol) / bucketWidth).cast("long"))
    val rb = intervals.withColumn(b, explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq(b))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop(b)
  }
}
