package graft

import org.apache.spark.sql.functions._

/** Z-order layout: interleave semantics (vs a bit-by-bit reference fold),
  * null handling, codegen-scope hygiene, and the actual payoff — per-file
  * min-max tightness and file-count pruning for a box predicate, z-order
  * vs single-column layout on the same data. */
class LayoutSpec extends GraftSpecBase {
  private val s = spark
  import s.implicits._

  /** Straight-line reference: bit i of column c → output bit i*n+(n-1-c). */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (c <- 0 until n; i <- 0 until bits) {
      val bit = (vals(c) >>> i) & 1L
      z |= bit << (i * n + (n - 1 - c))
    }
    z
  }

  test("zvalue matches the bit-by-bit reference on random inputs") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = rows.toDF("x", "y")
      .select(expr("zvalue(x, y, 8)")).collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((x, y), z) =>
      assert(z == refZ(Seq(x, y), 8), s"($x,$y)")
    }
  }

  test("zvalue three-column interleave and masking of out-of-range inputs") {
    val got = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
      .select(expr("zvalue(a, b, c, 4)"), expr("zvalue(a + 16, b, c, 4)"))
      .collect()(0)
    assert(got.getLong(0) == refZ(Seq(5L, 3L, 6L), 4))
    // 4-bit mask: a+16 ≡ a (mod 16) — bucketization bugs degrade, not crash
    assert(got.getLong(1) == got.getLong(0))
  }

  test("zvalue is null-preserving and monotone in each column's buckets") {
    val r = Seq((Option(3L), Option.empty[Long])).toDF("x", "y")
      .select(expr("zvalue(x, y, 8)")).collect()(0)
    assert(r.isNullAt(0))
    // same y-bucket: increasing x must increase z (prefix property)
    val zs = (0L until 16L).map(x => refZ(Seq(x, 7L), 4))
    assert(zs == zs.sorted && zs.distinct.size == 16)
  }

  test("two zvalue calls share one codegen scope without collisions") {
    val prev = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = Seq((9L, 4L)).toDF("x", "y")
        .select(expr("zvalue(x, y, 8)"), expr("zvalue(y, x, 6)"))
        .collect()(0)
      assert(r.getLong(0) == refZ(Seq(9L, 4L), 8))
      assert(r.getLong(1) == refZ(Seq(4L, 9L), 6))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("zorder layout tightens per-file ranges and prunes a box query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val grid = spark.range(0, 64L * 64L)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"),
        col("id").as("payload"))

    // single-column layout: range-partition by x — every file spans all of y
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/by_x")
    operators.Layout.zorderWrite(grid, Seq("x", "y"), s"$dir/zorder",
      files = 16, bits = 6)

    def spanByFile(path: String): Seq[Long] =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max("y") - min("y")).as("span"))
        .collect().map(_.getLong(1)).toSeq
    val naiveSpans = spanByFile(s"$dir/by_x")
    val zSpans = spanByFile(s"$dir/zorder")
    assert(naiveSpans.forall(_ == 63), "x-sorted files each span all of y")
    // 16 files over a 64x64 z-curve = 16x16 tiles; range-boundary sampling
    // can merge two adjacent tiles, but nothing close to the full span
    assert(zSpans.max <= 32,
      s"z-ordered files must have bounded y-spans, got ${zSpans.max}")

    def filesTouched(path: String): Long =
      spark.read.parquet(path).filter(col("y") < 8)
        .select(input_file_name()).distinct().count()
    val naiveFiles = filesTouched(s"$dir/by_x")
    val zFiles = filesTouched(s"$dir/zorder")
    assert(naiveFiles == 16, "box query hits every x-sorted file")
    assert(zFiles <= 8, s"z-order confines y<8 to few files, got $zFiles")

    // layout must not lose or duplicate rows
    assert(spark.read.parquet(s"$dir/zorder").count() == 64L * 64L)
  }
}
