package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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
  * `list_reduce`). Null elements count as 0.0 (the guard is only emitted
  * when the array type declares containsNull, so dense embeddings pay
  * nothing); mismatched lengths use the common prefix.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def anyNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

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
      if (!anyNullable || (!a.isNullAt(i) && !b.isNullAt(i))) {
        dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      }
      i += 1
    }
    dot
  }

  // all locals via ctx.freshName: with a non-nullable child the snippet is
  // emitted unscoped, so two vector kernels in one WSCG scope would
  // otherwise declare duplicate locals → Janino failure + interpreted
  // fallback (ADVICE r3)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
    val i = ctx.freshName("i")
    val guard = if (anyNullable)
      (a: String, b: String, i: String) =>
        s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) "
    else (_: String, _: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        ${guard(a, b, i)}$dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
      }
      ${ev.value} = $dot;
    """)
  }

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
      if (!anyNullable || (!a.isNullAt(i) && !b.isNullAt(i))) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val guard = if (anyNullable)
      (a: String, b: String, ii: String) =>
        s"if ($a.isNullAt($ii) || $b.isNullAt($ii)) continue;"
    else (_: String, _: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0, $na = 0.0, $nb = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        ${guard(a, b, i)}
        double $x = (double) $a.getFloat($i);
        double $y = (double) $b.getFloat($i);
        $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      }
      ${ev.value} = ($na == 0.0 || $nb == 0.0)
        ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** sign_proj(v) — nBits-bit sign-random-projection LSH bucket id.
  *
  * Bit i is set iff Σ_j v[j]·h(i,j) > 0, with hyperplane coefficient
  * h(i,j) = ((i·P1 XOR j·P2) mod 2001 − 1000) / 1000 ∈ [−1, 1] — pure
  * integer arithmetic, so any engine (the DuckDB oracle included)
  * reproduces the bucket ids bit-for-bit; no engine-specific RNG. The XOR
  * mix matters: an additive mix (i·P1 + j·P2) makes every bit's coefficient
  * sequence a SHIFT of the same mod-2001 progression, so bits — and any
  * multi-table split of them — correlate strongly (measured: two 6-bit
  * tables agreed on nearly every pair's hamming distance, and buckets
  * clustered into half the space); XOR breaks the linearity, giving
  * independent bits and full bucket spread. The double accumulation is
  * strictly j-ascending, matching DuckDB's `list_reduce` fold order.
  *
  * This is the codegen'd version of the interpreted
  * `aggregate(transform(sequence(...)))` lambda chain previously in
  * operators/Similarity.scala (VERDICT r2 perf-weak #3): one JIT-compiled
  * nBits×dims loop per row inside whole-stage codegen.
  */
case class SignProjection(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits out of range: $nBits")

  override def prettyName: String = "sign_proj"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        if (!elemNullable || !a.isNullAt(j)) {
          val coef = (((i * SignProjection.P1) ^ (j * SignProjection.P2))
            % 2001L - 1000L).toDouble / 1000.0
          dot += a.getFloat(j).toDouble * coef
        }
        j += 1
      }
      if (dot > 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
    val dot = ctx.freshName("dot"); val coef = ctx.freshName("coef")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val guard = if (elemNullable)
      (a: String, j: String) => s"if ($a.isNullAt($j)) continue;"
    else (_: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, a => s"""
      int $n = $a.numElements();
      long $sig = 0L;
      for (int $i = 0; $i < $nBits; $i++) {
        double $dot = 0.0;
        for (int $j = 0; $j < $n; $j++) {
          ${guard(a, j)}
          double $coef = (double) ((($i * ${SignProjection.P1}L) ^
            ($j * ${SignProjection.P2}L)) % 2001L - 1000L) / 1000.0;
          $dot += (double) $a.getFloat($j) * $coef;
        }
        if ($dot > 0.0) $sig |= (1L << $i);
      }
      ${ev.value} = $sig;
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignProjection = copy(child = newChild)
}

object SignProjection {
  val P1 = 73856093L
  val P2 = 19349663L
}

/** Static loops for the int8 quantization kernels (called from codegen). */
object VectorKernels {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** Symmetric per-vector int8 quantization: q_i = floor(x_i·127/m + 0.5)
    * with m = max|x_i| (all-zero in, all-zero out). floor(v+0.5) — not
    * Math.round via any other path — because DuckDB `floor(v + 5e-1)`
    * reproduces it exactly, making the quantized index oracle-checkable. */
  def quantizeI8(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(arr.getFloat(i).toDouble)
        if (v > m) m = v
      }
      i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0.0) {
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          out(i) = math.floor(
            arr.getFloat(i).toDouble * 127.0 / m + 0.5).toByte
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact integer dot product of two int8 vectors. Mismatched lengths are
    * data corruption for quantized embeddings (fixed dims), not a
    * truncation opportunity — fail loudly. */
  def vecDotI8(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vec_dot_i8: vector length mismatch ($n vs ${b.numElements()})")
    var dot = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        dot += a.getByte(i).toLong * b.getByte(i).toLong
      }
      i += 1
    }
    dot
  }
}

/** quantize_i8(vec) — symmetric per-vector int8 quantization of an
  * embedding: 4× smaller than float32 in every shuffle/cache/index, with
  * EXACT-integer downstream scoring (vec_dot_i8). The 100 TB lever: ANN
  * candidate generation over a quantized index, full-precision re-rank only
  * for survivors. */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_i8"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.quantizeI8(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.quantizeI8($c)")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeI8 = copy(child = newChild)
}

/** vec_dot_i8(a, b) — exact BIGINT inner product of int8 vectors. */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "vec_dot_i8"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<tinyint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.vecDotI8(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.vecDotI8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)
}
