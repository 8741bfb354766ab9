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
}
