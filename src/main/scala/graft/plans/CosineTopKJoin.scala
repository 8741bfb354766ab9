package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Custom logical operator: cosine top-k join (ANN primitive).
  *
  * The SURVEY §7 step (c) machinery — custom `LogicalPlan` node + injected
  * `Rule[LogicalPlan]` via `SparkSessionExtensions` — demonstrated on an
  * operator Spark lacks and the reference lacks (its ARRAY columns
  * row-fallback). The node declares the *semantics* ("for each left row,
  * the k nearest right rows by cosine"); the resolution rule lowers it to
  * the scale-correct composition: broadcast the (small) query side, cross
  * join streaming the candidate side, native codegen'd CosineSim score, and
  * a per-query row_number window — so Catalyst/Tungsten plan the physical
  * execution and AQE still applies.
  *
  * Convention: each side's first two columns are (id, embedding).
  * Consumed immediately via graft.ops.cosineTopK (the node is rewritten
  * during analysis; output attribute ids are minted per instance).
  */
case class CosineTopKJoin(
    left: LogicalPlan, right: LogicalPlan, k: Int,
    cosAttr: AttributeReference = AttributeReference("cos", DoubleType)(),
    rnAttr: AttributeReference = AttributeReference("rn", IntegerType,
      nullable = false)())
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output :+ cosAttr :+ rnAttr

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): CosineTopKJoin =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[CosineTopKJoin]] during analysis. */
object ResolveCosineTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j: CosineTopKJoin if j.childrenResolved =>
        val qId = j.left.output.head
        val eq = j.left.output(1)
        val cId = j.right.output.head
        val ec = j.right.output(1)
        val cos = Alias(CosineSim(eq, ec), "cos")(exprId = j.cosAttr.exprId)
        val joined = Join(
          ResolvedHint(j.left, HintInfo(strategy = Some(BROADCAST))),
          j.right, Cross, None, JoinHint.NONE)
        val projected =
          Project(j.left.output ++ j.right.output :+ cos, joined)
        val frame =
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
        val order = Seq(
          SortOrder(j.cosAttr, Descending), SortOrder(cId, Ascending))
        val spec = WindowSpecDefinition(Seq(qId), order, frame)
        val rn = Alias(WindowExpression(RowNumber(), spec), "rn")(
          exprId = j.rnAttr.exprId)
        val win = Window(Seq(rn), Seq(qId), order, projected)
        val filtered = Filter(LessThanOrEqual(j.rnAttr, Literal(j.k)), win)
        Project(j.output, filtered)
    }
}
