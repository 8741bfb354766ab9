package graft

import graft.sources.{GraftCachedBatch, GraftCachedBatchSerializer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.storage.StorageLevel

/** Round-trip coverage for the pluggable cache serializer (the analogue of
  * the reference's ArrowColumnarBatchSerializer + ColumnarInMemoryRelation).
  * `spark.sql.cache.serializer` is a static conf, so the conversion RDDs are
  * exercised directly rather than through a second SparkContext. */
class CachedBatchSerializerSpec extends GraftSpecBase {

  private val ser = new GraftCachedBatchSerializer
  private def conf = SQLConf.get

  test("row batches round-trip losslessly (all types of the fixture)") {
    val df = Tables(spark, sfDir, "orders")
    val qe = df.queryExecution
    val attrs = qe.executedPlan.output
    val cached = ser.convertInternalRowToCachedBatch(
      qe.toRdd, attrs, StorageLevel.MEMORY_ONLY, conf)
    val back = ser.convertCachedBatchToInternalRow(cached, attrs, attrs, conf)
    val schema = df.schema
    val gotRows = back.mapPartitions { it =>
      it.map(r => r.copy().toSeq(schema).mkString("|"))
    }.collect().sorted
    val wantRows = qe.toRdd.mapPartitions { it =>
      it.map(r => r.copy().toSeq(schema).mkString("|"))
    }.collect().sorted
    assert(gotRows.length == wantRows.length && gotRows.sameElements(wantRows))
  }

  test("pruned read projects to the selected attribute subset") {
    val df = Tables(spark, sfDir, "customer")
    val qe = df.queryExecution
    val attrs = qe.executedPlan.output
    val selected = Seq(attrs(0), attrs(attrs.length - 1))
    val cached = ser.convertInternalRowToCachedBatch(
      qe.toRdd, attrs, StorageLevel.MEMORY_ONLY, conf)
    val back = ser.convertCachedBatchToInternalRow(cached, attrs, selected, conf)
    val first = back.mapPartitions(it => it.map(_.copy())).collect()
    assert(first.forall(_.numFields == 2))
    assert(first.length == df.count())
  }

  test("batches respect the configured batch size and actually compress") {
    val df = Tables(spark, sfDir, "lineitem").limit(5000).coalesce(1)
    val qe = df.queryExecution
    val attrs = qe.executedPlan.output
    val cached = ser.convertInternalRowToCachedBatch(
        qe.toRdd, attrs, StorageLevel.MEMORY_ONLY, conf)
      .collect().map(_.asInstanceOf[GraftCachedBatch])
    assert(cached.map(_.numRows.toLong).sum == 5000L)
    assert(cached.forall(_.numRows <= conf.columnBatchSize))
    // fixture rows are repetitive; lz4 must buy a real reduction
    val raw = cached.map(_.uncompressedLen.toLong).sum
    val comp = cached.map(_.sizeInBytes).sum
    assert(comp < raw, s"expected compression, got $comp >= $raw")
  }
}
