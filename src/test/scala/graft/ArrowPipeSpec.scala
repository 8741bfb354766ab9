package graft

import org.apache.arrow.vector.{BigIntVector, IntVector, VarCharVector}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Coverage for the Arrow-batch map surface (org.apache.spark.sql.graft
  * .ArrowPipe + operators.ArrowBatch): batch boundaries, null carriage, and
  * agreement with the row-at-a-time built-in on the same computation. */
class ArrowPipeSpec extends GraftSpecBase {

  test("arrow pipe output equals octet_length over the documents fixture") {
    val got = operators.ArrowBatch.arrowUdf.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), octet_length(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == want.size && got == want)
  }

  test("multiple small batches cover the partition without loss or dup") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val n = docs.count()
    val out = org.apache.spark.sql.graft.ArrowPipe.mapArrowBatches(
      docs,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text_bytes", IntegerType))),
      batchSize = 7) { (in, outRoot) =>
      val rows = in.getRowCount
      val id = in.getVector("doc_id").asInstanceOf[BigIntVector]
      val text = in.getVector("text").asInstanceOf[VarCharVector]
      val oid = outRoot.getVector("doc_id").asInstanceOf[BigIntVector]
      val ob = outRoot.getVector("text_bytes").asInstanceOf[IntVector]
      oid.allocateNew(rows); ob.allocateNew(rows)
      (0 until rows).foreach { i =>
        oid.set(i, id.get(i))
        ob.set(i, text.getEndOffset(i) - text.getStartOffset(i))
      }
      outRoot.setRowCount(rows)
    }
    assert(out.count() == n)
    assert(out.select(countDistinct(col("doc_id"))).head.getLong(0) == n)
  }

  test("nulls ride through the arrow batch in both directions") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "ab"), (2L, null), (3L, "xyz"))
      .toDF("doc_id", "text").repartition(2)
    val out = org.apache.spark.sql.graft.ArrowPipe.mapArrowBatches(
      df,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text_bytes", IntegerType)))) { (in, outRoot) =>
      val rows = in.getRowCount
      val id = in.getVector("doc_id").asInstanceOf[BigIntVector]
      val text = in.getVector("text").asInstanceOf[VarCharVector]
      val oid = outRoot.getVector("doc_id").asInstanceOf[BigIntVector]
      val ob = outRoot.getVector("text_bytes").asInstanceOf[IntVector]
      oid.allocateNew(rows); ob.allocateNew(rows)
      (0 until rows).foreach { i =>
        oid.set(i, id.get(i))
        if (text.isNull(i)) ob.setNull(i)
        else ob.set(i, text.getEndOffset(i) - text.getStartOffset(i))
      }
      outRoot.setRowCount(rows)
    }
    val rows = out.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(rows == Map(1L -> 2, 2L -> -1, 3L -> 3))
  }
}
