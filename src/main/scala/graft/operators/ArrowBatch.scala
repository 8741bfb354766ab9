package graft.operators

import org.apache.arrow.vector.{BigIntVector, IntVector, VarCharVector}

import graft.{QueryDef, Tables}
import org.apache.spark.sql.graft.ArrowPipe
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Arrow-batch "UDF" surface (SURVEY §2.10 ColumnarArrowEvalPythonExec row):
  * a vectorized transform that runs on Arrow `VectorSchemaRoot` batches via
  * [[ArrowPipe.mapArrowBatches]] — the same batch shape the reference ships
  * to Python workers, minus the worker process. The kernel below reads the
  * UTF-8 byte length of each document straight from the VarCharVector's
  * offset buffer: O(1) per row, no string materialization at all — the kind
  * of win columnar UDFs exist for.
  */
object ArrowBatch {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text_bytes", IntegerType, nullable = true)))

  val arrowUdf = QueryDef(
    "q_arrow_udf",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      ArrowPipe.mapArrowBatches(docs, outSchema) { (in, out) =>
        val n = in.getRowCount
        val docId = in.getVector("doc_id").asInstanceOf[BigIntVector]
        val text = in.getVector("text").asInstanceOf[VarCharVector]
        val outId = out.getVector("doc_id").asInstanceOf[BigIntVector]
        val outLen = out.getVector("text_bytes").asInstanceOf[IntVector]
        outId.allocateNew(n)
        outLen.allocateNew(n)
        var i = 0
        while (i < n) {
          if (docId.isNull(i)) outId.setNull(i) else outId.set(i, docId.get(i))
          if (text.isNull(i)) outLen.setNull(i)
          else outLen.set(i, text.getEndOffset(i) - text.getStartOffset(i))
          i += 1
        }
        out.setRowCount(n)
      }
    },
    // DuckDB strlen == byte length, same as the offset-buffer difference
    Some("""
      SELECT doc_id, CAST(strlen(text) AS INT) AS text_bytes
      FROM documents"""))

  /** Grouped Arrow-batch transform (SURVEY §2.10 WindowInPandasExec /
    * pandas GROUPED_MAP row): one source per Arrow batch via
    * [[ArrowPipe.mapGroupedArrowBatches]], the kernel aggregating the
    * group inside the batch (doc count + total UTF-8 bytes straight off
    * the offset buffer). Oracle is the plain SQL group-by — the grouped
    * batch contract must reproduce it exactly. */
  val arrowGrouped = QueryDef(
    "q_arrow_grouped",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents").select("source", "text")
      val out = StructType(Seq(
        StructField("source", org.apache.spark.sql.types.StringType,
          nullable = true),
        StructField("n_docs", LongType, nullable = true),
        StructField("total_bytes", LongType, nullable = true)))
      ArrowPipe.mapGroupedArrowBatches(docs, Seq("source"), out) {
        (in, o) =>
          val n = in.getRowCount
          val src = in.getVector("source").asInstanceOf[VarCharVector]
          val text = in.getVector("text").asInstanceOf[VarCharVector]
          val oSrc = o.getVector("source").asInstanceOf[VarCharVector]
          val oN = o.getVector("n_docs").asInstanceOf[BigIntVector]
          val oB = o.getVector("total_bytes").asInstanceOf[BigIntVector]
          oSrc.allocateNew(1); oN.allocateNew(1); oB.allocateNew(1)
          oSrc.setSafe(0, src.get(0))
          oN.set(0, n.toLong)
          var bytes = 0L
          var i = 0
          while (i < n) {
            if (!text.isNull(i))
              bytes += text.getEndOffset(i) - text.getStartOffset(i)
            i += 1
          }
          oB.set(0, bytes)
          o.setRowCount(1)
      }
    },
    Some("""
      SELECT source, count(*) AS n_docs,
             CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
      FROM documents GROUP BY source"""))

  val all: Seq[QueryDef] = Seq(arrowUdf, arrowGrouped)
}
