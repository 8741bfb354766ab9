package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType}

import scala.collection.mutable

/** K-minimum-values (KMV) distinct-count sketch as a
  * [[TypedImperativeAggregate]] — the custom-UDAF extension pattern from
  * SURVEY §7 step 6 (the reference ships only six built-in aggregates,
  * ColumnarHashAggregation.scala:101-196, and no UDAF surface at all).
  *
  * The buffer is the k smallest xxhash64 values of the group; buffers merge
  * by set-union-and-trim, so the aggregate has genuine partial/merge/final
  * phases and scales like any Spark partial aggregation (map-side combine →
  * one shuffle of ≤k longs per group). Estimator: with the k-th smallest of
  * n uniform hashes at unsigned position u, distinct ≈ (k-1)·2⁶⁴/u.
  * Deterministic for a fixed dataset (hash-based, order-free).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 512,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def prettyName: String = "kmv_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    // order by unsigned interpretation so "smallest hash" is well-defined
    mutable.TreeSet.empty[Long](Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      buf += h
      if (buf.size > k) buf -= buf.lastKey
    }
    buf
  }

  override def merge(
      a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach { h =>
      a += h
      if (a.size > k) a -= a.lastKey
    }
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    if (buf.size < k) buf.size.toLong
    else {
      // unsigned position of the k-th minimum in [0, 2^64)
      val kth = buf.lastKey
      val u = if (kth >= 0) kth.toDouble
              else kth.toDouble + 1.8446744073709552e19
      math.round((k - 1).toDouble * 1.8446744073709552e19 / u)
    }
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
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
