package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit coverage for the native vector expressions (graft.functions.CosineSim
  * / VecDot): interpreted vs codegen parity, reference-math agreement, edge
  * cases (zero vector, mismatched lengths, nulls). */
class VectorFunctionsSpec extends GraftSpecBase {

  private def df(rows: Seq[(Array[Float], Array[Float])]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1.toSeq, r._2.toSeq))),
      schema)
  }

  private def refCosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until n).foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches reference math on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val got = df(rows).select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((a, b), g) =>
      assert(g == refCosine(a, b), "bit-exact double expected")
    }
  }

  test("interpreted and codegen paths agree") {
    val rows = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
    val d = df(rows)
    val withCodegen = d.select(expr("cosine_sim(a, b)")).head.getDouble(0)
    val session = spark
    session.conf.set("spark.sql.codegen.wholeStage", "false")
    session.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = d.select(expr("cosine_sim(a, b)")).head.getDouble(0)
      assert(withCodegen == interpreted)
    } finally {
      session.conf.set("spark.sql.codegen.wholeStage", "true")
      session.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("zero vector yields 0.0, not NaN") {
    val v = df(Seq((Array(0f, 0f), Array(1f, 1f))))
      .select(expr("cosine_sim(a, b)")).head.getDouble(0)
    assert(v == 0.0)
  }

  test("mismatched lengths use common prefix") {
    val v = df(Seq((Array(1f, 0f, 9f), Array(1f, 0f))))
      .select(expr("vec_dot(a, b)")).head.getDouble(0)
    assert(v == 1.0)
  }

  test("null input propagates null") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null, Seq(1f)))), schema)
    assert(d.select(expr("cosine_sim(a, b)")).head.isNullAt(0))
  }

  test("vec_dot identity: dot(v, v) == |v|^2") {
    val v = Array(3f, 4f)
    val got = df(Seq((v, v))).select(expr("vec_dot(a, b)")).head.getDouble(0)
    assert(got == 25.0)
  }

  /** Reference model of sign_proj: the interpreted HOF formulation the
    * kernel replaced (operators/Similarity.scala pre-r3). */
  private def refSignProj(v: Array[Float], nBits: Int): Long = {
    val P1 = graft.functions.SignProjection.P1
    val P2 = graft.functions.SignProjection.P2
    (0 until nBits).map { i =>
      var dot = 0.0
      v.indices.foreach { j =>
        dot += v(j).toDouble *
          ((((i * P1) ^ (j * P2)) % 2001L - 1000L).toDouble / 1000.0)
      }
      if (dot > 0.0) 1L << i else 0L
    }.sum
  }

  test("sign_proj matches the integer-hyperplane reference model") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(40)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.empty[Float]))
    val got = df(rows).select(expr("sign_proj(a, 6)"))
      .collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((v, _), g) =>
      assert(g == refSignProj(v, 6), "bucket id must be bit-exact")
    }
    assert(got.toSet.size > 1, "fixture should spread across buckets")
  }

  test("multiple vector kernels share one codegen scope (fresh locals)") {
    // ADVICE r3: fixed local names made two kernels in one generated
    // function declare duplicate variables → Janino failure + silent
    // interpreted fallback. CODEGEN_ONLY turns that failure into a hard
    // error, so this test fails loudly if local names regress.
    val rows = Seq((Array.tabulate(64)(i => (i % 5 - 2).toFloat),
      Array.tabulate(64)(i => (i % 3 - 1).toFloat)))
    val d = df(rows)
    val session = spark
    session.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = d.select(
        expr("sign_proj(a, 6)"), expr("sign_proj(b, 6)"),
        expr("cosine_sim(a, b)"), expr("cosine_sim(b, a)"),
        expr("vec_dot(a, b)"), expr("vec_dot(a, a)")).head
      assert(r.getLong(0) == d.select(expr("sign_proj(a, 6)")).head.getLong(0))
      assert(r.getDouble(2) == r.getDouble(3), "cosine is symmetric")
      assert(r.getDouble(4) ==
        d.select(expr("vec_dot(a, b)")).head.getDouble(0))
    } finally {
      session.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("quantize_i8 matches reference math, bounds, and zero vector") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(30)(Array.fill(64)(rnd.nextFloat() * 2 - 1)) :+
      Array.fill(64)(0.0f)
    val d = df(vecs.map(v => (v, Array.empty[Float])))
    val got = d.select(expr("quantize_i8(a)")).collect()
      .map(_.getSeq[Byte](0).toArray)
    vecs.zip(got).foreach { case (v, q) =>
      val m = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
      val want =
        if (m == 0.0) Array.fill(v.length)(0.toByte)
        else v.map(x => math.floor(x.toDouble * 127.0 / m + 0.5).toByte)
      assert(q.toSeq == want.toSeq)
      assert(q.forall(b => b >= -127 && b <= 127))
    }
  }

  test("vec_dot_i8 is the exact integer dot; codegen/interpreted agree") {
    val d = df(Seq((Array.fill(64)(0.5f), Array.fill(64)(-0.25f))))
      .select(expr("quantize_i8(a)").as("qa"), expr("quantize_i8(b)").as("qb"))
    def run() = d.select(expr("vec_dot_i8(qa, qb)")).head.getLong(0)
    val expected = run()
    // constant vectors quantize to 127 and -127: dot = 64 * 127 * -127
    assert(expected == 64L * 127 * -127)
    val session = spark
    session.conf.set("spark.sql.codegen.wholeStage", "false")
    session.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == expected)
    finally {
      session.conf.set("spark.sql.codegen.wholeStage", "true")
      session.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("sign_proj interpreted and codegen paths agree") {
    val rows = Seq((Array.tabulate(64)(i => (i % 7 - 3).toFloat),
      Array.empty[Float]))
    val d = df(rows)
    val withCodegen = d.select(expr("sign_proj(a)")).head.getLong(0)
    val session = spark
    session.conf.set("spark.sql.codegen.wholeStage", "false")
    session.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = d.select(expr("sign_proj(a)")).head.getLong(0)
      assert(withCodegen == interpreted)
    } finally {
      session.conf.set("spark.sql.codegen.wholeStage", "true")
      session.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
