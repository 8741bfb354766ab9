package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Normalized physical-plan signatures — the repo's plan-stability gate
  * (reference: PlanStabilitySuite.scala + resources/tpcds-plan-stability/,
  * which pins every TPC-DS query's plan and fails on drift).
  *
  * A signature is the operator TREE minus everything run-dependent: no
  * expression ids, no statistics, no partition counts, no codegen stage
  * ids. AQE wrappers (query stages, shuffle reads) and codegen collapse
  * nodes are transparent — the signature records which operators run in
  * which order, which is exactly what a planner regression changes.
  * ReusedExchange expands to its referenced subtree — AQE stage reuse is
  * timing-dependent, so a reused and a recomputed twin sign identically
  * (the reuse property is pinned separately in PlanAuditSpec).
  */
object PlanSignature {

  def signature(plan: SparkPlan): String = {
    def walk(n: SparkPlan, d: Int): Seq[String] = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, d)
      case q: QueryStageExec => walk(q.plan, d)
      case w: WholeStageCodegenExec => walk(w.child, d)
      case i: InputAdapter => walk(i.child, d)
      case r: ReusedExchangeExec =>
        // whether AQE reuses a twin exchange or recomputes it is a RACE
        // (two identical stages submitted concurrently may both run before
        // reuse registration) — expand to the referenced subtree so either
        // outcome signs identically; the reuse property itself is asserted
        // separately (PlanAuditSpec's q2 ReusedExchange pin)
        walk(r.child, d)
      case other if other.nodeName == "AQEShuffleRead" =>
        // partition coalescing/skew splitting is a runtime stat decision,
        // not a plan shape — transparent for stability purposes
        other.children.flatMap(walk(_, d))
      case other if other.children.length == 2 &&
          other.nodeName.contains("Join") =>
        // join children sort lexicographically by subtree: when both sides
        // have equal stats (e.g. two probes of one cached table) the
        // planner's build-side pick races on which side's cache stats
        // materialize first — a flip that changes nothing semantic here
        val blocks = other.children.map(c => walk(c, d + 1)).sortBy(_.mkString("\n"))
        (("  " * d) + other.nodeName) +: blocks.flatten
      case other =>
        (("  " * d) + other.nodeName) +: other.children.flatMap(walk(_, d + 1))
    }
    walk(plan, 0).mkString("\n") + "\n"
  }

  /** Execute the frame (so AQE finalizes) and return the signature of the
    * final plan. */
  def executedSignature(df: DataFrame): String = {
    df.collect()
    signature(df.queryExecution.executedPlan)
  }
}
