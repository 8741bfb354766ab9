package graft

import org.apache.spark.sql.functions._

/** The §2.10 extension surface: custom Generator (UDTF) + typed Aggregator. */
class UdfSurfaceSpec extends GraftSpecBase {
  import org.apache.spark.sql.Row

  private lazy val ss = spark

  test("word_chunks splits into ragged 1-based chunks") {
    import ss.implicits._
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "x"),
      (3L, "")).toDF("doc_id", "text")
    val out = df
      .select(col("doc_id"), expr("word_chunks(text, 2)").as(Seq("i", "c")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, 1, "a b"), (1L, 2, "c d"), (1L, 3, "e"),
      (2L, 1, "x"),
      (3L, 1, ""))) // empty text -> one empty chunk (str_split parity)
  }

  test("word_chunks keeps consecutive-space empties (str_split parity)") {
    import ss.implicits._
    val out = Seq("a  b").toDF("text")
      .select(expr("word_chunks(text, 2)").as(Seq("i", "c")))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "a "), (2, "b")))
  }

  test("typed CentsSumAgg matches the built-in exact sum") {
    val byAggregator = SparkEntry.queries("q_agg_typed")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byBuiltin = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(Exact.sumd(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byAggregator == byBuiltin)
  }

  test("generator query returns one row per chunk") {
    val docs = Tables(spark, sfDir, "documents")
    val expected = docs
      .select(ceil(size(split(col("text"), " ")) / lit(8.0)).cast("long").as("m"))
      .agg(sum(col("m"))).collect().head.getLong(0)
    val got = SparkEntry.queries("q_generate_chunks")(spark, sfDir).count()
    assert(got == expected)
  }
}
