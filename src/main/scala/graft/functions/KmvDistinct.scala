package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType}

/** Primitive buffer for the KMV sketch: the (≤k) smallest *distinct* unsigned
  * hash values seen so far. Appends go to a 2k scratch array; when it fills,
  * one unsigned sort + dedup + trim keeps the k smallest and tightens the
  * admission threshold (amortized O(1) per row, zero boxing — the reason this
  * replaced a mutable.TreeSet[Long]). Set semantics make the final state (and
  * so the estimate) independent of row order and partitioning.
  */
final class KmvBuffer(val k: Int) {
  // starts tiny and grows geometrically to the 2k cap: high-cardinality
  // grouping (e.g. the Expand stage of a mixed distinct aggregate) creates
  // one buffer per group, so an eager 2k allocation per buffer is ruinous
  private var arr = new Array[Long](16)
  private var n = 0
  private var saturated = false
  private var thresh = 0L // max kept hash (unsigned) once saturated

  @inline private def ult(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  def add(h: Long): Unit = {
    if (saturated && !ult(h, thresh)) return // not among k smallest, skip
    arr(n) = h
    n += 1
    if (n == arr.length) {
      if (arr.length < 2 * k) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      else compact()
    }
  }

  /** unsigned sort + dedup in place; keep the k smallest. */
  def compact(): Unit = {
    if (n == 0) return
    // flip the sign bit so signed sort orders unsigned
    var i = 0
    while (i < n) { arr(i) ^= Long.MinValue; i += 1 }
    java.util.Arrays.sort(arr, 0, n)
    var m = 1
    i = 1
    while (i < n && m < k) {
      if (arr(i) != arr(m - 1)) { arr(m) = arr(i); m += 1 }
      i += 1
    }
    // count one more distinct past k to know saturation exactly
    n = m
    i = 0
    while (i < n) { arr(i) ^= Long.MinValue; i += 1 }
    if (n == k) { saturated = true; thresh = arr(n - 1) }
  }

  /** distinct hash count if below k, else the k-th smallest (unsigned). */
  def sizeAndKth: (Int, Long) = {
    compact()
    (n, if (n > 0) arr(n - 1) else 0L)
  }

  def foreachKept(f: Long => Unit): Unit = {
    compact()
    var i = 0
    while (i < n) { f(arr(i)); i += 1 }
  }

  def keptCount: Int = { compact(); n }
}

/** K-minimum-values (KMV) distinct-count sketch as a
  * [[TypedImperativeAggregate]] — the custom-UDAF extension pattern from
  * SURVEY §7 step 6 (the reference ships only six built-in aggregates,
  * ColumnarHashAggregation.scala:101-196, and no UDAF surface at all).
  *
  * The buffer is the k smallest distinct xxhash64 values of the group;
  * buffers merge by set-union-and-trim, so the aggregate has genuine
  * partial/merge/final phases and scales like any Spark partial aggregation
  * (map-side combine → one shuffle of ≤k longs per group). Estimator: with
  * the k-th smallest of n uniform hashes at unsigned position u,
  * distinct ≈ (k-1)·2⁶⁴/u. Deterministic for a fixed dataset (hash-based,
  * order-free).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 512,
    det: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def prettyName: String =
    if (det) "kmv_distinct_det" else "kmv_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (det && child.dataType != org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName hashes the exact string bytes (oracle-replayable); " +
          s"cast the column to string, got ${child.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(
      if (det) KmvCodec.md5Hash48(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      else XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    b.foreachKept(a.add)
    a
  }

  override def eval(buf: KmvBuffer): Any = {
    if (det) KmvCodec.estimateDet(buf, k)
    else {
      val (size, kth) = buf.sizeAndKth
      if (size < k) size.toLong
      else {
        // unsigned position of the k-th minimum in [0, 2^64)
        val u = if (kth >= 0) kth.toDouble
                else kth.toDouble + 1.8446744073709552e19
        math.round((k - 1).toDouble * 1.8446744073709552e19 / u)
      }
    }
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.keptCount)
    bb.putInt(buf.keptCount)
    buf.foreachKept(bb.putLong(_))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

/** Shared KMV wire format + estimator (used by the three aggregate forms). */
object KmvCodec {
  /** DETERMINISTIC 48-bit hash: the integer value of the first 12 hex chars
    * of md5 over the UTF-8 bytes — i.e. `conv(substr(md5(x),1,12),16,10)`,
    * the same replayable construction as the md5-arithmetic MinHash/SimHash
    * twins (operators/Dedup.scala), so ANY ANSI engine reproduces the sketch
    * and its estimate bit-for-bit. 48 bits keeps `(k-1)·2^48` inside signed
    * int64 for the integer-division estimator below (no floating point in
    * the estimate path at all); hash collisions at 48 bits (~n²/2^49) are
    * ~4 expected at 1.5M distinct and replay identically in the oracle. */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Hash48(bytes: Array[Byte]): Long = {
    val dig = md.get()
    dig.reset()
    val d = dig.digest(bytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Estimate for the deterministic 48-bit hash domain: pure int64
    * arithmetic, `(k-1)·2^48 div kth` (floor division, positives only) —
    * replayed verbatim in DuckDB as `(k-1)*281474976710656 // kth`. */
  def estimateDet(buf: KmvBuffer, k: Int): Long = {
    val (size, kth) = buf.sizeAndKth
    if (size < k) size.toLong
    // kth == 0 (a value whose md5 prefix is all-zero is the k-th minimum,
    // ~2^-48 per distinct) would divide by zero: treat the hash floor as 1
    // — a bounded estimator error instead of a crash.
    else ((k - 1).toLong << 48) / math.max(kth, 1L)
  }
  def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.keptCount)
    bb.putInt(buf.keptCount)
    buf.foreachKept(bb.putLong(_))
    bb.array()
  }

  def deserializeInto(bytes: Array[Byte], buf: KmvBuffer): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  def estimate(buf: KmvBuffer, k: Int): Long = {
    val (size, kth) = buf.sizeAndKth
    if (size < k) size.toLong
    else {
      val u = if (kth >= 0) kth.toDouble
              else kth.toDouble + 1.8446744073709552e19
      math.round((k - 1).toDouble * 1.8446744073709552e19 / u)
    }
  }
}

/** Set algebra over serialized KMV states (Beyer et al. 2007, "On Synopses
  * for Distinct-Value Estimation"): the k smallest of the UNION of two
  * sketches is exactly the k-min sketch of the union, and the fraction of
  * that merged sketch present in BOTH inputs is an unbiased Jaccard
  * estimator; intersection cardinality falls out as jaccard x union.
  * Scalar (not aggregate) — it runs on already-aggregated sketch rows
  * (one per group), never in a per-row hot path, so CodegenFallback costs
  * nothing measurable. */
object KmvSetOps {
  private def parse(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = bb.getLong; i += 1 }
    a
  }

  @inline private def ult(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** (jaccard, unionEstimate) from two serialized states (ascending
    * unsigned hash arrays) under sketch size k. Both-empty → (0.0, 0).
    * `det = true` switches the union estimator to the deterministic 48-bit
    * integer-division form (states built by `kmv_state_det`). */
  def mergeStats(l: Array[Byte], r: Array[Byte], k: Int,
      det: Boolean = false): (Double, Long) = {
    val la = parse(l)
    val lb = parse(r)
    var i = 0; var j = 0; var taken = 0; var both = 0; var last = 0L
    while (taken < k && (i < la.length || j < lb.length)) {
      if (i < la.length && j < lb.length && la(i) == lb(j)) {
        both += 1; last = la(i); i += 1; j += 1
      } else if (j >= lb.length || (i < la.length && ult(la(i), lb(j)))) {
        last = la(i); i += 1
      } else {
        last = lb(j); j += 1
      }
      taken += 1
    }
    if (taken == 0) return (0.0, 0L)
    val jac = both.toDouble / taken.toDouble
    val unionEst =
      if (taken < k) taken.toLong // both sketches exhausted: exact hash count
      else if (det) ((k - 1).toLong << 48) / math.max(last, 1L)
      else {
        val u = if (last >= 0) last.toDouble
                else last.toDouble + 1.8446744073709552e19
        math.round((k - 1).toDouble * 1.8446744073709552e19 / u)
      }
    (jac, unionEst)
  }
}

abstract class KmvBinarySetOp
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  def k: Int

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two binary kmv_state columns, got " +
            s"${l.catalogString}, ${r.catalogString}")
    }
}

/** kmv_jaccard(stateA, stateB[, k]) — Jaccard similarity estimate of the
  * two sketched sets. */
case class KmvJaccard(left: Expression, right: Expression, k: Int = 512)
  extends KmvBinarySetOp {
  override def prettyName: String = "kmv_jaccard"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    KmvSetOps.mergeStats(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Array[Byte]], k)._1
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvJaccard =
    copy(left = newLeft, right = newRight)
}

/** kmv_intersect(stateA, stateB[, k]) — intersection-cardinality estimate
  * (jaccard x union estimate, rounded). */
case class KmvIntersect(left: Expression, right: Expression, k: Int = 512,
    det: Boolean = false)
  extends KmvBinarySetOp {
  override def prettyName: String =
    if (det) "kmv_intersect_det" else "kmv_intersect"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (jac, union) = KmvSetOps.mergeStats(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Array[Byte]], k, det)
    math.round(jac * union.toDouble)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}

/** kmv_state(col[, k]) — the SKETCH STATE as a binary column instead of the
  * estimate: the materialized-sketch-table pattern for incremental
  * profiling at 100 TB. Write one ≤(4+8k)-byte state per (partition, day);
  * any later window re-aggregates STATES with [[KmvMerge]] — no raw
  * re-scan — and because the state is the exact set of the k smallest
  * distinct hashes, two-level aggregation is LOSSLESS: merged estimates
  * equal the direct single-pass estimate bit-for-bit (pinned in KmvSpec). */
case class KmvState(
    child: Expression,
    k: Int = 512,
    det: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def prettyName: String = if (det) "kmv_state_det" else "kmv_state"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (det && child.dataType != org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName hashes the exact string bytes (oracle-replayable); " +
          s"cast the column to string, got ${child.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(
      if (det) KmvCodec.md5Hash48(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      else XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    b.foreachKept(a.add)
    a
  }

  override def eval(buf: KmvBuffer): Any = KmvCodec.serialize(buf)

  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvCodec.deserializeInto(bytes, createAggregationBuffer())

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvState =
    copy(child = newChildren.head)
}

/** kmv_merge(state[, k]) / kmv_merge_state(state[, k]) — re-aggregate
  * binary sketch STATES (produced by [[KmvState]] with the same k):
  * union-and-trim of the hash sets, then either the estimate (`asState =
  * false`) or a further-mergeable state (`asState = true`, for rollup
  * hierarchies: day → month → quarter without touching raw data). */
case class KmvMerge(
    child: Expression,
    k: Int = 512,
    asState: Boolean = false,
    det: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def prettyName: String =
    if (asState) "kmv_merge_state" else if (det) "kmv_merge_det" else "kmv_merge"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (asState) org.apache.spark.sql.types.BinaryType else LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary kmv_state column, got " +
            other.catalogString)
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) KmvCodec.deserializeInto(v.asInstanceOf[Array[Byte]], buf)
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    b.foreachKept(a.add)
    a
  }

  override def eval(buf: KmvBuffer): Any =
    if (asState) KmvCodec.serialize(buf)
    else if (det) KmvCodec.estimateDet(buf, k)
    else KmvCodec.estimate(buf, k)

  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvCodec.deserializeInto(bytes, createAggregationBuffer())

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMerge =
    copy(child = newChildren.head)
}
