package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters summary: at most `k` (item → (count, err))
  * counters. `count` overestimates the item's true frequency by at most
  * `err`; any item with true frequency > n/k is guaranteed to be present
  * (Metwally et al.'s Space-Saving; merge per Agarwal et al.'s mergeable
  * summaries: sum counters pointwise, keep the k largest).
  */
final class FreqBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  val errs = new java.util.HashMap[String, Long]()

  def add(item: String): Unit = {
    if (counts.containsKey(item)) {
      counts.put(item, counts.get(item) + 1L)
    } else if (counts.size < k) {
      counts.put(item, 1L); errs.put(item, 0L)
    } else {
      // evict the minimum counter: the newcomer inherits its count as error
      var minItem: String = null
      var minCount = Long.MaxValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue < minCount ||
          (e.getValue == minCount && (minItem == null ||
            e.getKey.compareTo(minItem) < 0))) {
          minCount = e.getValue; minItem = e.getKey
        }
      }
      counts.remove(minItem); errs.remove(minItem)
      counts.put(item, minCount + 1L); errs.put(item, minCount)
    }
  }

  def merge(other: FreqBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val item = e.getKey
      counts.put(item,
        (if (counts.containsKey(item)) counts.get(item) else 0L) + e.getValue)
      errs.put(item,
        (if (errs.containsKey(item)) errs.get(item) else 0L) +
          other.errs.get(item))
    }
    trim()
  }

  /** keep the k largest counters (count desc, item asc tie-break). */
  def trim(): Unit = if (counts.size > k) {
    val entries = new java.util.ArrayList(counts.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    var i = k
    while (i < entries.size()) {
      counts.remove(entries.get(i).getKey)
      errs.remove(entries.get(i).getKey)
      i += 1
    }
  }

  /** (item, estimate) sorted by estimate desc then item asc — stable. */
  def top: Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq
      .sortBy { case (item, c) => (-c, item) }
  }
}

/** `freq_sketch(col, k)` — approximate top-k frequent items as a
  * `map<string,bigint>` of item → estimated count. A
  * [[TypedImperativeAggregate]] with genuine partial/merge/final phases:
  * each partition keeps ≤k counters, merge sums and re-trims, so at most
  * k (string, long, long) triples shuffle per group regardless of input
  * size — the frequency-estimation counterpart of [[KmvDistinct]] (the
  * reference has no UDAF surface at all). Guarantee (pinned in
  * FreqSketchSpec): any item with true frequency > n/k survives, and
  * estimates bound the true count from above by at most the tracked error.
  */
case class FreqSketch(
    child: Expression,
    k: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {

  require(k >= 1, s"k must be positive: $k")

  override def prettyName: String = "freq_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(a: FreqBuffer, b: FreqBuffer): FreqBuffer = {
    a.merge(b); a
  }

  override def eval(buf: FreqBuffer): Any = {
    val top = buf.top
    new ArrayBasedMapData(
      ArrayData.toArrayData(
        top.map(t => UTF8String.fromString(t._1)).toArray[Any]),
      ArrayData.toArrayData(top.map(_._2).toArray[Any]))
  }

  override def serialize(buf: FreqBuffer): Array[Byte] = {
    val items = buf.top
    val payload = items.map { case (s, _) =>
      s.getBytes(StandardCharsets.UTF_8)
    }
    val size = 8 + payload.map(_.length + 20).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.k)
    bb.putInt(items.size)
    items.zip(payload).foreach { case ((item, c), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
      bb.putLong(buf.errs.get(item))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val item = new String(arr, StandardCharsets.UTF_8)
      buf.counts.put(item, bb.getLong)
      buf.errs.put(item, bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}
