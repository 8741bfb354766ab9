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

  /** Grouped Arrow-batch map — the analogue of the reference's
    * `WindowInPandasExec` / pandas GROUPED_MAP contract (reference:
    * operators.md #27; the Python runner feeds ONE group per Arrow batch).
    * Rows are hash-partitioned on `groupCols` and sorted within partitions,
    * so each group arrives contiguous; `fn` sees exactly one group per
    * input root and may emit any number of output rows for it (aggregate,
    * normalize, resample...).
    *
    * Scale shape: ONE shuffle on the group keys (identical to what any
    * window/grouped-agg needs), then partition-local batch staging. Like
    * the pandas contract, a single GROUP must fit one Arrow batch — bound
    * group cardinality upstream (this is the documented constraint of the
    * reference path too, not an extra one). */
  def mapGroupedArrowBatches(
      df: DataFrame,
      groupCols: Seq[String],
      outSchema: StructType)(
      fn: (VectorSchemaRoot, VectorSchemaRoot) => Unit): DataFrame = {
    require(groupCols.nonEmpty, "mapGroupedArrowBatches needs group columns")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val parted = df.repartition(groupCols.map(col): _*)
      .sortWithinPartitions(groupCols.map(col): _*)
    val inSchema = parted.schema
    val keyRefs = groupCols.map { c =>
      val i = inSchema.fieldIndex(c)
      BoundReference(i, inSchema(i).dataType, inSchema(i).nullable)
    }
    val tz = session.sessionState.conf.sessionLocalTimeZone
    val rdd = parted.queryExecution.toRdd.mapPartitionsInternal { rows =>
      val allocator = ArrowUtils.rootAllocator
        .newChildAllocator(s"graft-arrow-grouped", 0, Long.MaxValue)
      val inRoot = VectorSchemaRoot.create(
        ArrowUtils.toArrowSchema(inSchema, tz, true, false), allocator)
      val outRoot = VectorSchemaRoot.create(
        ArrowUtils.toArrowSchema(outSchema, tz, true, false), allocator)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
        _ => inRoot.close(); outRoot.close(); allocator.close()
      })
      val writer = ArrowWriter.create(inRoot)
      val toUnsafe = UnsafeProjection.create(outSchema)
      val keyProj = UnsafeProjection.create(keyRefs)
      // one copied row+key held across group boundaries (scan rows are a
      // reused mutable UnsafeRow — never retained without copy())
      var pendingRow: InternalRow = null
      var pendingKey: InternalRow = null
      if (rows.hasNext) {
        val r = rows.next()
        pendingKey = keyProj(r).copy()
        pendingRow = r.copy()
      }
      val groups = new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = pendingRow != null
        override def next(): Iterator[InternalRow] = {
          writer.reset()
          outRoot.clear()
          val curKey = pendingKey
          writer.write(pendingRow)
          pendingRow = null
          pendingKey = null
          var boundary = false
          while (!boundary && rows.hasNext) {
            val r = rows.next()
            val k = keyProj(r)
            if (k == curKey) writer.write(r)
            else { pendingKey = k.copy(); pendingRow = r.copy(); boundary = true }
          }
          writer.finish()
          fn(inRoot, outRoot)
          val cols = (0 until outRoot.getFieldVectors.size()).map(i =>
            new ArrowColumnVector(outRoot.getVector(i))).toArray
          val batch = new ColumnarBatch(
            cols.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]],
            outRoot.getRowCount)
          val outRows = new Array[InternalRow](outRoot.getRowCount)
          val it = batch.rowIterator()
          var i = 0
          while (it.hasNext) { outRows(i) = toUnsafe(it.next()).copy(); i += 1 }
          outRows.iterator
        }
      }
      groups.flatten
    }
    session.internalCreateDataFrame(rdd, outSchema)
  }
}
