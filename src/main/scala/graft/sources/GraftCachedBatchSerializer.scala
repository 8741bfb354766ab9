package graft.sources

import net.jpountz.lz4.LZ4Factory

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.columnar.{CachedBatch, CachedBatchSerializer}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.storage.StorageLevel

/** One cached batch: LZ4-compressed concatenation of length-prefixed
  * UnsafeRows. The Spark-native analogue of the reference's compressed
  * Arrow-IPC cached batches (reference:
  * core/org/apache/spark/sql/execution/ColumnarInMemoryRelation.scala:62-150,
  * ArrowColumnarBatchSerializer — Arrow buffers + codec; here: Tungsten rows
  * + lz4, the layout Spark's executors already operate on).
  */
case class GraftCachedBatch(
    numRows: Int,
    uncompressedLen: Int,
    bytes: Array[Byte]) extends CachedBatch {
  override def sizeInBytes: Long = bytes.length.toLong
}

/** Pluggable `df.cache()` storage — mount with
  * `spark.sql.cache.serializer=graft.sources.GraftCachedBatchSerializer`
  * (static conf, set at session build). Row path only: batches of
  * `spark.sql.inMemoryColumnarStorage.batchSize` rows are length-prefixed and
  * lz4-compressed; reads decompress per batch and project straight to the
  * requested attribute subset (cache-side column pruning). No per-batch
  * min/max pruning — buildFilter is identity, AQE + scan pushdown upstream
  * already bound what reaches the cache.
  */
class GraftCachedBatchSerializer extends CachedBatchSerializer {

  override def supportsColumnarInput(schema: Seq[Attribute]): Boolean = false
  override def supportsColumnarOutput(schema: StructType): Boolean = false

  override def convertColumnarBatchToCachedBatch(
      input: RDD[ColumnarBatch],
      schema: Seq[Attribute],
      storageLevel: StorageLevel,
      conf: SQLConf): RDD[CachedBatch] =
    throw new UnsupportedOperationException(
      "GraftCachedBatchSerializer caches the row representation")

  override def convertInternalRowToCachedBatch(
      input: RDD[InternalRow],
      schema: Seq[Attribute],
      storageLevel: StorageLevel,
      conf: SQLConf): RDD[CachedBatch] = {
    val batchSize = conf.columnBatchSize
    val fields = schema.length
    val dataTypes = schema.map(_.dataType)
    input.mapPartitions { rows =>
      new Iterator[CachedBatch] {
        private val toUnsafe = UnsafeProjection.create(dataTypes.toArray)
        private val compressor = LZ4Factory.fastestInstance().fastCompressor()
        private val copyBuf = new Array[Byte](1 << 13) // off-heap row staging
        override def hasNext: Boolean = rows.hasNext
        override def next(): CachedBatch = {
          val out = new java.io.ByteArrayOutputStream(1 << 16)
          val sizeBuf = new Array[Byte](4)
          var n = 0
          while (rows.hasNext && n < batchSize) {
            val row = rows.next() match {
              case u: UnsafeRow if u.numFields == fields => u
              case other => toUnsafe(other)
            }
            val len = row.getSizeInBytes
            sizeBuf(0) = (len >>> 24).toByte
            sizeBuf(1) = (len >>> 16).toByte
            sizeBuf(2) = (len >>> 8).toByte
            sizeBuf(3) = len.toByte
            out.write(sizeBuf)
            row.writeToStream(out, copyBuf)
            n += 1
          }
          val raw = out.toByteArray
          GraftCachedBatch(n, raw.length, compressor.compress(raw))
        }
      }
    }
  }

  override def buildFilter(
      predicates: Seq[Expression],
      cachedAttributes: Seq[Attribute])
      : (Int, Iterator[CachedBatch]) => Iterator[CachedBatch] =
    (_, it) => it

  override def convertCachedBatchToColumnarBatch(
      input: RDD[CachedBatch],
      cacheAttributes: Seq[Attribute],
      selectedAttributes: Seq[Attribute],
      conf: SQLConf): RDD[ColumnarBatch] =
    throw new UnsupportedOperationException(
      "GraftCachedBatchSerializer caches the row representation")

  override def convertCachedBatchToInternalRow(
      input: RDD[CachedBatch],
      cacheAttributes: Seq[Attribute],
      selectedAttributes: Seq[Attribute],
      conf: SQLConf): RDD[InternalRow] = {
    val fields = cacheAttributes.length
    val pruned = selectedAttributes != cacheAttributes
    input.mapPartitions { batches =>
      val project =
        if (pruned) UnsafeProjection.create(selectedAttributes, cacheAttributes)
        else null
      val decompressor = LZ4Factory.fastestInstance().fastDecompressor()
      batches.flatMap { cb =>
        val b = cb.asInstanceOf[GraftCachedBatch]
        val raw = decompressor.decompress(b.bytes, b.uncompressedLen)
        new Iterator[InternalRow] {
          private var off = 0
          private var emitted = 0
          private val row = new UnsafeRow(fields)
          override def hasNext: Boolean = emitted < b.numRows
          override def next(): InternalRow = {
            val len = ((raw(off) & 0xff) << 24) | ((raw(off + 1) & 0xff) << 16) |
              ((raw(off + 2) & 0xff) << 8) | (raw(off + 3) & 0xff)
            row.pointTo(raw,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off + 4, len)
            off += 4 + len
            emitted += 1
            if (pruned) project(row) else row
          }
        }
      }
    }
  }
}
