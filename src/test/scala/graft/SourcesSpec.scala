package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink round-trips: parquet (native path), csv/json/orc (inherited
  * row sources in the reference — SURVEY §2.1 "JDBC/CSV/JSON/ORC"), and the
  * "arrow" alias write+read. */
class SourcesSpec extends GraftSpecBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString + "/out"

  private def sample = Tables(spark, sfDir, "orders")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  test("parquet round-trip preserves rows and schema") {
    val p = tmp("parquet")
    sample.write.parquet(p)
    val back = spark.read.parquet(p)
    assert(back.schema == sample.schema)
    assert(back.count() == sample.count())
  }

  test("arrow alias writes and reads (parquet under the hood)") {
    val p = tmp("arrow")
    sample.write.format("arrow").save(p)
    val back = spark.read.format("arrow").load(p)
    assert(back.count() == sample.count())
    // and plain parquet can read what "arrow" wrote
    assert(spark.read.parquet(p).count() == sample.count())
  }

  test("arrow alias reads CSV via originalFormat=csv (reference ArrowUtils csv branch)") {
    val p = tmp("arrowcsv")
    sample.write.option("header", "true").csv(p)
    val back = spark.read.format("arrow")
      .option("originalFormat", "csv")
      .option("header", "true").option("inferSchema", "true")
      .load(p)
    assert(back.count() == sample.count())
    assert(back.columns.toSeq == sample.columns.toSeq)
    // unknown format names are rejected with the supported pair listed
    val err = intercept[Exception] {
      spark.read.format("arrow").option("originalFormat", "orc").load(p)
    }
    assert(err.getMessage.contains("originalFormat"))
  }

  test("csv round-trip with header") {
    val p = tmp("csv")
    sample.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(p)
    assert(back.count() == sample.count())
    assert(back.columns.toSeq == sample.columns.toSeq)
  }

  test("json round-trip") {
    val p = tmp("json")
    sample.write.json(p)
    val back = spark.read.json(p)
    assert(back.count() == sample.count())
  }

  test("orc round-trip") {
    val p = tmp("orc")
    sample.write.orc(p)
    assert(spark.read.orc(p).count() == sample.count())
  }

  test("text source round-trips lines; wholetext reads one row per file") {
    val p = tmp("text")
    Tables(spark, sfDir, "documents").limit(50)
      .select(col("text")).write.text(p)
    val back = spark.read.text(p)
    assert(back.count() == 50)
    assert(back.schema.fieldNames.toSeq == Seq("value"))
    val whole = spark.read.option("wholetext", "true").text(p)
    // one row per part-file, each holding that file's full contents
    assert(whole.count() < 50 || whole.count() == 50)
    assert(whole.agg(sum(length(col("value")))).head.getLong(0) >=
      back.agg(sum(length(col("value")))).head.getLong(0))
  }

  test("binaryFile source ingests raw files with metadata (multimodal)") {
    // the ingestion edge of the multimodal pipeline: opaque bytes + typed
    // metadata (path, length) land in a DataFrame without decoding
    val dir = Files.createTempDirectory("graft-bin")
    (0 until 3).foreach { i =>
      Files.write(dir.resolve(s"blob_$i.bin"),
        Array.tabulate[Byte](100 + i)(j => (i * 31 + j).toByte))
    }
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.count() == 3)
    val cols = df.schema.fieldNames.toSet
    assert(Set("path", "length", "content").subsetOf(cols), cols.toString)
    val lens = df.select(col("length"),
        length(col("content")).cast("long").as("clen"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lens.forall { case (l, c) => l == c })
    assert(lens.map(_._1).sorted.toSeq == Seq(100L, 101L, 102L))
  }

  test("partitioned write prunes partitions on read") {
    val p = tmp("part")
    Tables(spark, sfDir, "orders")
      .write.partitionBy("o_orderstatus").parquet(p)
    val one = spark.read.parquet(p).filter(col("o_orderstatus") === "F")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing:\n$plan")
  }
}
