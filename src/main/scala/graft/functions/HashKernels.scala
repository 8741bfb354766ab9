package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native hash kernels for the dedup pipelines.
  *
  * Spark's higher-order functions (transform/aggregate) interpret their
  * lambdas per element — fine for small arrays, but a 64-bit×n_tokens
  * SimHash vote loop or a 32-permutation MinHash pass over shingles is
  * exactly the hot loop the reference hands to Gandiva kernels
  * (reference: cpp/codegen/arrow_compute/ext/actions_impl.cc). These
  * expressions keep the loop in one JIT-compiled JVM method reachable from
  * whole-stage codegen via the object's static forwarders.
  *
  * Hashing is Spark's own xxhash64 (seed 42) so `simhash64(toks)` is
  * bit-identical to the equivalent higher-order-function formulation.
  */
object HashKernels {

  /** 64-bit SimHash: per-token xxhash64, per-bit majority vote. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Murmur3 finalizer — the per-permutation mix for MinHash. */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  /** Distinct word n-grams in one pass (insertion order preserved) —
    * replaces a transform(sequence…concat_ws) interpreted-lambda chain. */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i + n <= len) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Rolling polynomial hash of token character-lengths mod 1e9+7 —
    * the document length-fingerprint. Matches the interpreted
    * aggregate(toks, 0L, (acc, t) -> (acc*31 + length(t)) % p) fold and
    * DuckDB's list_reduce mirror exactly (length = characters). */
  def lenPolyHash(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        acc = (acc * 31L + arr.getUTF8String(i).numChars()) % 1000000007L
      }
      i += 1
    }
    acc
  }

  /** Tokens present in a fixed word set — one hash-set probe per token.
    * Replaces `size(filter(toks, t => t.isin(...)))`: the higher-order
    * lambda evaluates interpreted per element AND knocks the whole
    * projection out of whole-stage codegen; this stays a codegen'd call. */
  def countInSet(
      arr: ArrayData,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Long = {
    val len = arr.numElements()
    var n = 0L
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  /** k-permutation MinHash signature: one xxhash64 per element, k cheap
    * mixes — O(n·k) mixes instead of O(n·k) string hashes. */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 }
      else {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < k) {
        val v = mix(h ^ (j.toLong * 0x9e3779b97f4a7c15L))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

abstract class StringArrayKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
}

/** simhash64(tokens) — 64-bit SimHash of a token array. */
case class SimHash64(child: Expression) extends StringArrayKernelExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** word_ngrams(tokens, n) — distinct word n-grams, insertion-ordered. */
case class WordNgrams(child: Expression, n: Int)
    extends StringArrayKernelExpression {
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.wordNgrams(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** len_poly_hash(tokens) — rolling polynomial hash of token lengths. */
case class LenPolyHash(child: Expression) extends StringArrayKernelExpression {
  override def prettyName: String = "len_poly_hash"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.lenPolyHash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.lenPolyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): LenPolyHash =
    copy(child = newChild)
}

/** count_in_set(tokens, 'w1,w2,…') — tokens matching a fixed word set.
  * The set is a query-constant reference object, probed in one codegen'd
  * loop (the stopword-score hot path of q_text_langid / q_text_quality). */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends StringArrayKernelExpression {
  override def prettyName: String = "count_in_set"
  override def dataType: DataType = LongType

  @transient private lazy val set = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    words.foreach(w =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.countInSet(input.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.countInSet($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetCount = copy(child = newChild)
}

/** minhash_sig(shingles) — 32-permutation MinHash signature (array<long>). */
case class MinHashSig(child: Expression, k: Int = 32)
    extends StringArrayKernelExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
