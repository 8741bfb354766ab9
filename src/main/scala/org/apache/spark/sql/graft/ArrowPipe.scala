package org.apache.spark.sql.graft

import org.apache.arrow.vector.VectorSchemaRoot

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch}

/** Arrow-batched map over a DataFrame — the Scala-library analogue of the
  * reference's `ColumnarArrowEvalPythonExec` (reference: core/.../python/
  * ColumnarArrowEvalPythonExec.scala:51,204-340, which ships Arrow batches
  * to a Python worker and reads Arrow batches back). Here the "worker" is a
  * JVM function over Arrow `VectorSchemaRoot`s: each partition is staged
  * into Arrow batches of `batchSize` rows, `fn` consumes the populated
  * input root and fills the output root (vectorized, columnar — zero
  * per-row boxing), and the output batches stream back as rows.
  *
  * This is the mount point a Python/pandas UDF runner would use: swap `fn`
  * for an IPC round-trip to an external process and the Spark-side plumbing
  * (batching, schema mapping, memory management, unsafe-row rehydration) is
  * unchanged. Lives in the bridge namespace because batch staging reuses
  * Spark's own `ArrowWriter`/`ArrowUtils` (`private[sql]`) rather than
  * re-implementing the Spark↔Arrow type mapping.
  *
  * Scale shape: purely partition-local (no shuffle, no driver data path);
  * memory is bounded by `batchSize` rows per concurrent task, and allocator
  * children are closed per partition via the task-completion listener.
  */
object ArrowPipe {

  def mapArrowBatches(
      df: DataFrame,
      outSchema: StructType,
      batchSize: Int = 4096)(
      fn: (VectorSchemaRoot, VectorSchemaRoot) => Unit): DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val inSchema = df.schema
    val tz = session.sessionState.conf.sessionLocalTimeZone
    val rdd = df.queryExecution.toRdd.mapPartitionsInternal { rows =>
      val allocator = ArrowUtils.rootAllocator
        .newChildAllocator(s"graft-arrow-pipe", 0, Long.MaxValue)
      val inRoot = VectorSchemaRoot.create(
        ArrowUtils.toArrowSchema(inSchema, tz, true, false), allocator)
      val outRoot = VectorSchemaRoot.create(
        ArrowUtils.toArrowSchema(outSchema, tz, true, false), allocator)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
        _ => inRoot.close(); outRoot.close(); allocator.close()
      })
      val writer = ArrowWriter.create(inRoot)
      val toUnsafe = UnsafeProjection.create(outSchema)
      // rows are written into the ArrowWriter as they stream off the scan —
      // NO buffering of InternalRow references (the scan reuses one mutable
      // UnsafeRow, so a collected chunk would alias its last row)
      val batches = new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = rows.hasNext
        override def next(): Iterator[InternalRow] = {
          writer.reset()
          var n = 0
          while (rows.hasNext && n < batchSize) {
            writer.write(rows.next())
            n += 1
          }
          writer.finish()
          outRoot.clear()
          fn(inRoot, outRoot)
          val cols = (0 until outRoot.getFieldVectors.size()).map(i =>
            new ArrowColumnVector(outRoot.getVector(i))).toArray
          val batch = new ColumnarBatch(
            cols.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]],
            outRoot.getRowCount)
          // materialize before the next chunk resets the vectors
          val outRows = new Array[InternalRow](outRoot.getRowCount)
          val it = batch.rowIterator()
          var i = 0
          while (it.hasNext) { outRows(i) = toUnsafe(it.next()).copy(); i += 1 }
          outRows.iterator
        }
      }
      batches.flatten
    }
    session.internalCreateDataFrame(rdd, outSchema)
  }
}
