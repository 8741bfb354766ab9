package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding vectors (`array<float>`).
  *
  * The reference has no vector kernels at all — ARRAY is columnar-unsupported
  * and falls back to row execution (reference: core/com/intel/oap/expression/
  * ConverterUtils.scala:494-508, docs/operators.md type matrix). These are the
  * "custom Expression with doGenCode" extension path from SURVEY §7: a tight
  * primitive loop inside whole-stage codegen, no UDF serialization boundary —
  * the Spark-idiomatic equivalent of the reference's Gandiva SIMD kernels.
  *
  * Both accumulate in double, strictly left-to-right, so results are
  * bit-identical to any oracle that folds the same order (DuckDB
  * `list_reduce`). Null-element-free arrays are assumed (embedding fixtures
  * are dense); mismatched lengths use the common prefix.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** dot(a, b) — plain inner product. */
case class VecDot(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int n = Math.min($a.numElements(), $b.numElements());
      double dot = 0.0;
      for (int i = 0; i < n; i++) {
        dot += (double) $a.getFloat(i) * (double) $b.getFloat(i);
      }
      ${ev.value} = dot;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** cosine_sim(a, b) = dot / (|a|·|b|); 0.0 when either norm is zero. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int n = Math.min($a.numElements(), $b.numElements());
      double dot = 0.0, na = 0.0, nb = 0.0;
      for (int i = 0; i < n; i++) {
        double x = (double) $a.getFloat(i);
        double y = (double) $b.getFloat(i);
        dot += x * y; na += x * x; nb += y * y;
      }
      ${ev.value} = (na == 0.0 || nb == 0.0)
        ? 0.0 : dot / (Math.sqrt(na) * Math.sqrt(nb));
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
