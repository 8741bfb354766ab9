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

  test("grouped arrow map: one group per batch, matches the window twin") {
    // pandas-GROUPED_MAP analogue: per-group normalization (v - group min)
    // computed inside the Arrow batch must equal the window formulation
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => (i % 7, i * 31 % 101))
      .toDF("g", "v").repartition(5)
    val out = org.apache.spark.sql.graft.ArrowPipe.mapGroupedArrowBatches(
      df, Seq("g"),
      StructType(Seq(StructField("g", LongType),
        StructField("centered", LongType)))) { (in, outRoot) =>
      val rows = in.getRowCount
      val g = in.getVector("g").asInstanceOf[BigIntVector]
      val v = in.getVector("v").asInstanceOf[BigIntVector]
      // the grouped contract: every row in this batch has the SAME key
      val keys = (0 until rows).map(g.get).toSet
      assert(keys.size == 1, s"batch must be one group, saw $keys")
      val mn = (0 until rows).map(v.get).min
      val og = outRoot.getVector("g").asInstanceOf[BigIntVector]
      val oc = outRoot.getVector("centered").asInstanceOf[BigIntVector]
      og.allocateNew(rows); oc.allocateNew(rows)
      (0 until rows).foreach { i =>
        og.set(i, g.get(i)); oc.set(i, v.get(i) - mn)
      }
      outRoot.setRowCount(rows)
    }
    val got = out.groupBy("g")
      .agg(sum("centered").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val want = df.withColumn("centered", col("v") - min(col("v")).over(w))
      .groupBy("g").agg(sum("centered").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("grouped arrow map: fn may emit fewer rows than the group (aggregate)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L), (2L, 7L), (3L, 9L))
      .toDF("g", "v")
    val out = org.apache.spark.sql.graft.ArrowPipe.mapGroupedArrowBatches(
      df, Seq("g"),
      StructType(Seq(StructField("g", LongType),
        StructField("vsum", LongType)))) { (in, outRoot) =>
      val rows = in.getRowCount
      val g = in.getVector("g").asInstanceOf[BigIntVector]
      val v = in.getVector("v").asInstanceOf[BigIntVector]
      val og = outRoot.getVector("g").asInstanceOf[BigIntVector]
      val ov = outRoot.getVector("vsum").asInstanceOf[BigIntVector]
      og.allocateNew(1); ov.allocateNew(1)
      og.set(0, g.get(0))
      ov.set(0, (0 until rows).map(v.get).sum)
      outRoot.setRowCount(1)
    }
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 30L, 2L -> 12L, 3L -> 9L))
  }
}
