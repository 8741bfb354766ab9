package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, Decimal, DoubleType, NumericType}

/** KLL-style mergeable quantile sketch buffer.
  *
  * Levels of capacity-`k` double arrays; level `i` items each stand for
  * 2^i input values. When a level fills, it is sorted and every other
  * element is promoted to the next level (classic KLL compaction). The
  * promotion offset alternates with that level's compaction count instead
  * of a random coin — DETERMINISTIC for a fixed dataset+partitioning (the
  * registry's reproducibility requirement; the alternation keeps the
  * rank bias oscillating around zero rather than compounding).
  * Space: O(k·log(n/k)); rank error ~1.5/k of N (KllSpec pins ≤3% at
  * k=256 on the fixtures).
  */
final class KllBuffer(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(new ArrayBuffer[Double](k))
  private[functions] val compactions = ArrayBuffer(0)
  var count: Long = 0L

  def add(v: Double): Unit = {
    levels(0) += v
    count += 1
    var i = 0
    while (i < levels.length && levels(i).length > k) {
      compactLevel(i)
      i += 1
    }
  }

  private def compactLevel(i: Int): Unit = {
    if (i + 1 == levels.length) { levels += new ArrayBuffer[Double](k); compactions += 0 }
    val lv = levels(i).sorted
    val off = compactions(i) & 1
    compactions(i) += 1
    var j = off
    while (j < lv.length) { levels(i + 1) += lv(j); j += 2 }
    levels(i).clear()
    // an odd survivor is dropped with its weight folded into the
    // alternation; KLL's bound absorbs this
  }

  def merge(other: KllBuffer): Unit = {
    while (levels.length < other.levels.length) {
      levels += new ArrayBuffer[Double](k); compactions += 0
    }
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      var j = i
      while (j < levels.length && levels(j).length > k) { compactLevel(j); j += 1 }
      i += 1
    }
    count += other.count
  }

  /** value whose weighted rank first reaches q·N (q in [0,1]). */
  def quantile(q: Double): Double = {
    if (count == 0L) return Double.NaN
    val weighted = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => weighted += ((v, w)))
      i += 1
    }
    val sorted = weighted.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var acc = 0L
    var idx = 0
    while (idx < sorted.length) {
      acc += sorted(idx)._2
      if (acc >= target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }
}

object KllBuffer {
  /** Leading magic+version word. kll_state is documented as a column that
    * rollup tables MATERIALIZE, so the wire format is a persistence
    * format: any layout change must bump the version so a stale blob
    * fails with "format changed, rebuild" instead of decoding the old
    * layout's bytes into a bogus field (the pre-k layout's count high
    * bytes read back as k=0). 'KLL' + version byte. */
  val Magic: Int = 0x4B4C4C00 | 2 // "KLL" v2 (v2 = k-prefixed payload)

  /** wire format shared by kll_quantile's shuffle buffers and the
    * MATERIALIZED kll_state column: magic, k, count, nLevels, then each
    * level's length + doubles. k travels IN the state so a rollup can't
    * silently reinterpret a sketch under a different compaction
    * parameter. */
  def toBytes(buf: KllBuffer): Array[Byte] = {
    val n = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(
      4 + 4 + 8 + 4 + buf.levels.length * 4 + n * 8)
    bb.putInt(Magic)
    bb.putInt(buf.k)
    bb.putLong(buf.count)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lv =>
      bb.putInt(lv.length)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], k: Int): KllBuffer = {
    // a truncated/empty blob must get the same "rebuild" diagnostic as a
    // bad magic, not a raw BufferUnderflowException from getInt
    require(bytes.length >= 4,
      s"kll state blob is ${bytes.length} bytes — too short to carry the" +
        " magic+version word; not a kll_state column (or a truncated" +
        " one): rebuild the sketches")
    val bb = ByteBuffer.wrap(bytes)
    val magic = bb.getInt
    require(magic == Magic, {
      val ver = magic & 0xFF
      if ((magic & 0xFFFFFF00) == (Magic & 0xFFFFFF00))
        s"kll state has wire-format version $ver, this build reads" +
          s" version ${Magic & 0xFF} — rebuild the persisted sketches"
      else
        "not a kll state (bad magic) — the blob predates the versioned" +
          " wire format or is not a kll_state column; rebuild the sketches"
    })
    val encodedK = bb.getInt
    // a k mismatch would silently degrade the documented 1.5/k rank-error
    // guarantee (the state's levels were compacted under encodedK) — fail
    // loudly instead: kll_merge over kll_state(col, 64) states must be
    // called as kll_merge(st, q, 64)
    require(encodedK == k,
      s"kll state was built with k=$encodedK but is being read with k=$k" +
        " — pass the state's own k to kll_merge/kll_merge_state")
    val buf = new KllBuffer(k)
    val count = bb.getLong
    val nLevels = bb.getInt
    // rebuild level structure verbatim (no re-adding: weights must stay);
    // grow levels and compaction counters in LOCKSTEP — a deserialized
    // buffer that later becomes a merge target or receives add() compacts
    // at i >= 1 and indexes compactions(i)
    while (buf.levels.length < nLevels) {
      buf.levels += new ArrayBuffer[Double](k)
      buf.compactions += 0
    }
    (0 until nLevels).foreach { i =>
      val m = bb.getInt
      (0 until m).foreach(_ => buf.levels(i) += bb.getDouble)
    }
    buf.count = count
    buf
  }
}

/** kll_quantile(col, q[, k]) — approximate quantile via a mergeable
  * KLL-style sketch with deterministic compaction. Genuine
  * partial/merge/final aggregation: each partition keeps O(k·log n)
  * doubles, the shuffle moves one sketch per group, and the estimate is
  * computed once at final. Complements the other sketch UDAFs
  * (kmv_distinct for cardinality, freq_sketch for heavy hitters) — the
  * sketch family the reference lacks entirely (its aggregate list is six
  * built-ins, ColumnarHashAggregation.scala:101-196). */
case class KllQuantile(
    child: Expression,
    q: Double,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")

  override def prettyName: String = "kll_quantile"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  // Fail at analysis, not with a MatchError on executors: the sketch only
  // holds doubles, so the child must be numeric (Decimal included — it is
  // not a java.lang.Number, hence the explicit update() branch).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires a numeric column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: Decimal => d.toDouble
      case n: Number => n.doubleValue()
    })
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = { a.merge(b); a }

  override def eval(buf: KllBuffer): Any = buf.quantile(q)

  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantile =
    copy(child = newChildren.head)
}

/** kll_state(col[, k]) — the MATERIALIZED form of [[KllQuantile]]'s
  * buffer: a per-group binary KLL sketch column (O(k·log n) doubles) a
  * rollup table can store per period and re-aggregate to ANY coarser
  * window via [[KllMerge]] without rescanning raw data — the quantile
  * member of the materialized-sketch-table family beside `kmv_state`
  * (cardinality) and the exact bitmaps. */
case class KllState(
    child: Expression,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  override def prettyName: String = "kll_state"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_state requires a numeric column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: Decimal => d.toDouble
      case n: Number => n.doubleValue()
    })
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = { a.merge(b); a }
  override def eval(buf: KllBuffer): Any = KllBuffer.toBytes(buf)
  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllState =
    copy(child = newChildren.head)
}

/** kll_merge(state, q[, k]) / kll_merge_state(state[, k]) — re-aggregate
  * materialized [[KllState]] columns: merge the per-period sketches and
  * either answer a quantile (`emitState = false`) or re-emit the merged
  * binary for a further rollup level (`emitState = true`, day→month→
  * quarter). Merging is mergeable-but-not-lossless (compaction order
  * shifts which samples survive) — the rank-error guarantee is what
  * merges, pinned in KllSpec and by q_agg_kll_rollup's rank envelope. */
case class KllMerge(
    child: Expression,
    q: Double,
    k: Int = 256,
    emitState: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")

  override def prettyName: String =
    if (emitState) "kll_merge_state" else "kll_merge"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitState) org.apache.spark.sql.types.BinaryType else DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a kll_state BINARY column, got " +
        other.catalogString)
  }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllBuffer.fromBytes(v.asInstanceOf[Array[Byte]], k))
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = { a.merge(b); a }
  override def eval(buf: KllBuffer): Any =
    if (emitState) KllBuffer.toBytes(buf) else buf.quantile(q)
  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMerge =
    copy(child = newChildren.head)
}
