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

  test("selective predicate skips batches via min/max stats (buildFilter)") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, LessThan, Literal}
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "1000")
    try {
      val df = spark.range(10000).toDF("id").coalesce(1)
      val qe = df.queryExecution
      val attrs = qe.executedPlan.output
      val cached = ser.convertInternalRowToCachedBatch(
        qe.toRdd, attrs, StorageLevel.MEMORY_ONLY, conf).collect()
      assert(cached.length == 10, "expected 10 batches of 1000")
      // range(10000) in one partition is ascending → batch k holds
      // [1000k, 1000k+999]; id < 500 can only live in batch 0
      val lt = ser.buildFilter(Seq(LessThan(attrs.head, Literal(500L))), attrs)
      assert(lt(0, cached.iterator).size == 1)
      val eq = ser.buildFilter(Seq(EqualTo(attrs.head, Literal(7777L))), attrs)
      val kept = eq(0, cached.iterator).toSeq
      assert(kept.size == 1)
      // the surviving batch must still decode to the right rows
      val n0 = sources.GraftCachedBatchSerializer.decompressedBatches.get()
      val rows = ser.convertCachedBatchToInternalRow(
        spark.sparkContext.parallelize(kept, 1), attrs, attrs, conf)
        .map(_.getLong(0)).collect()
      assert(rows.contains(7777L) && rows.length == 1000)
      assert(sources.GraftCachedBatchSerializer.decompressedBatches.get() == n0 + 1)
    } finally {
      spark.conf.unset("spark.sql.inMemoryColumnarStorage.batchSize")
    }
  }

  test("all-null and complex columns keep conservative (null) bounds") {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, IsNull, Literal}
    val df = spark.sql(
      """SELECT CAST(NULL AS INT) AS all_null, array(id) AS arr, id
         FROM range(100)""").coalesce(1)
    val qe = df.queryExecution
    val attrs = qe.executedPlan.output
    val cached = ser.convertInternalRowToCachedBatch(
      qe.toRdd, attrs, StorageLevel.MEMORY_ONLY, conf).collect()
    // all-null column: a > 5 cannot match → batch skipped
    val gt = ser.buildFilter(
      Seq(GreaterThan(attrs.head, Literal(5))), attrs)
    assert(gt(0, cached.iterator).isEmpty)
    // IS NULL keeps it (nullCount > 0)
    val nn = ser.buildFilter(Seq(IsNull(attrs.head)), attrs)
    assert(nn(0, cached.iterator).nonEmpty)
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

  test("zero-column schema caches without dividing by zero (ADVICE r3)") {
    // df.select().cache().count() produces rows with no fields; the stats
    // size computation must not divide by the field count
    val df = spark.range(100).toDF().select()
    val qe = df.queryExecution
    val attrs = qe.executedPlan.output
    assert(attrs.isEmpty)
    val cached = ser.convertInternalRowToCachedBatch(
      qe.toRdd, attrs, StorageLevel.MEMORY_ONLY, conf).collect()
    assert(cached.map(_.numRows.toLong).sum == 100L)
    val back = ser.convertCachedBatchToInternalRow(
      spark.sparkContext.parallelize(cached, 1), attrs, attrs, conf)
    assert(back.map(_ => 1L).reduce(_ + _) == 100L)
  }
}
