package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests standing in for the reference's native kernel unit tests
  * (SURVEY §5 layer 5 — cpp/src/tests): algebraic invariants of the custom
  * expressions evaluated through the engine. Raw ScalaCheck driven from
  * funsuite (scalatestplus bridge is not on the offline classpath). */
class PropertySpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](16, Gen.chooseNum(-10f, 10f))
      .suchThat(v => v.exists(_ != 0f))

  private val pairsGen = Gen.nonEmptyListOf(Gen.zip(vecGen, vecGen))
    .map(_.take(8))

  private def cosOf(pairs: Seq[(Array[Float], Array[Float])]): Seq[Double] = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        pairs.map(p => Row(p._1.toSeq, p._2.toSeq))),
      schema)
      .select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0)).toSeq
  }

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"$name: $res")
  }

  test("cosine_sim bounded in [-1,1], symmetric, self=1, scale-invariant") {
    check("bounded", Prop.forAll(pairsGen) { pairs =>
      cosOf(pairs).forall(c => c >= -1.0000001 && c <= 1.0000001)
    })
    check("symmetric", Prop.forAll(pairsGen) { pairs =>
      cosOf(pairs) == cosOf(pairs.map(_.swap))
    })
    check("self-similarity", Prop.forAll(Gen.nonEmptyListOf(vecGen).map(_.take(6))) {
      vs => cosOf(vs.map(v => (v, v))).forall(c => math.abs(c - 1.0) < 1e-12)
    })
    check("scale-invariant", Prop.forAll(pairsGen) { pairs =>
      val scaled = pairs.map { case (a, b) => (a, b.map(_ * 2f)) }
      cosOf(pairs).zip(cosOf(scaled)).forall {
        case (c1, c2) => math.abs(c1 - c2) < 1e-9
      }
    })
  }

  test("vec_dot linearity: dot(a, b+c) == dot(a,b) + dot(a,c)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType)),
      StructField("c", ArrayType(FloatType))))
    check("linearity", Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(vecGen, vecGen, vecGen)).map(_.take(6))) {
      triples =>
        val rows = spark.createDataFrame(
          spark.sparkContext.parallelize(triples.map(t =>
            Row(t._1.toSeq, t._2.toSeq, t._3.toSeq))),
          schema)
          .select(
            expr("vec_dot(a, zip_with(b, c, (x, y) -> x + y))").as("lhs"),
            (expr("vec_dot(a, b)") + expr("vec_dot(a, c)")).as("rhs"))
          .collect()
        rows.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-3)
    })
  }

  test("quantize_i8: bounds, max-magnitude hits ±127, positive-scale invariance") {
    val schema = StructType(Seq(StructField("a", ArrayType(FloatType))))
    def quant(vs: Seq[Array[Float]]): Seq[Seq[Byte]] =
      spark.createDataFrame(
        spark.sparkContext.parallelize(vs.map(v => Row(v.toSeq))), schema)
        .select(expr("quantize_i8(a)")).collect().map(_.getSeq[Byte](0)).toSeq
    check("bounds+extremes", Prop.forAll(Gen.nonEmptyListOf(vecGen).map(_.take(6))) {
      vs =>
        quant(vs).zip(vs).forall { case (q, v) =>
          q.forall(b => b >= -127 && b <= 127) &&
            // the max-|x| coordinate quantizes to exactly ±127
            q.zip(v).exists { case (b, x) =>
              math.abs(x.toDouble) == v.map(x2 => math.abs(x2.toDouble)).max &&
                math.abs(b.toInt) == 127
            }
        }
    })
    check("scale-invariance-pow2", Prop.forAll(Gen.nonEmptyListOf(vecGen).map(_.take(4))) {
      vs =>
        // scaling by a power of two is exact in binary fp → identical codes
        quant(vs) == quant(vs.map(_.map(x => x * 4.0f)))
    })
  }

  test("count_in_set: bounded by size, exact on membership, empty set is 0") {
    val tokGen = Gen.listOf(Gen.oneOf("the", "a", "of", "zz", "qq", "ww"))
    val schema = StructType(Seq(StructField("t", ArrayType(StringType))))
    check("membership", Prop.forAll(Gen.nonEmptyListOf(tokGen).map(_.take(8))) {
      ts =>
        val rows = spark.createDataFrame(
          spark.sparkContext.parallelize(ts.map(t => Row(t))), schema)
          .select(size(col("t")).cast("long").as("n"),
            expr("count_in_set(t, 'the,a,of')").as("c"))
          .collect()
        rows.zip(ts).forall { case (r, t) =>
          r.getLong(1) == t.count(Set("the", "a", "of")) &&
            r.getLong(1) <= r.getLong(0)
        }
    })
  }

  // ---- pure-JVM properties (no Spark job per sample) ----

  private def kmvState(values: Seq[Long], k: Int = 512): Array[Byte] = {
    val buf = new functions.KmvBuffer(k)
    values.foreach(v => buf.add(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, org.apache.spark.sql.types.LongType, 42L)))
    functions.KmvCodec.serialize(buf)
  }

  test("kmv set algebra: jaccard in [0,1], symmetric, self=1, disjoint=0") {
    val setGen = Gen.chooseNum(1, 1500).flatMap(n =>
      Gen.chooseNum(0L, 100000L).map(off => (off until off + n)))
    check("bounded+symmetric", Prop.forAll(Gen.zip(setGen, setGen)) {
      case (a, b) =>
        val (j1, u1) = functions.KmvSetOps.mergeStats(
          kmvState(a), kmvState(b), 512)
        val (j2, u2) = functions.KmvSetOps.mergeStats(
          kmvState(b), kmvState(a), 512)
        j1 >= 0.0 && j1 <= 1.0 && j1 == j2 && u1 == u2 && u1 >= 0
    })
    check("self-is-one", Prop.forAll(setGen) { a =>
      functions.KmvSetOps.mergeStats(kmvState(a), kmvState(a), 512)._1 == 1.0
    })
    check("disjoint-is-zero", Prop.forAll(setGen) { a =>
      val b = a.map(_ + 1000000L)
      functions.KmvSetOps.mergeStats(kmvState(a), kmvState(b), 512)._1 == 0.0
    })
  }

  test("bpe encode concatenation identity under arbitrary learned merges") {
    val wordGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val corpusGen = Gen.nonEmptyListOf(Gen.zip(wordGen,
      Gen.chooseNum(1L, 20L))).map(_.take(12))
    check("round-trip", Prop.forAll(Gen.zip(corpusGen, wordGen,
      Gen.chooseNum(0, 10))) { case (corpus, w, n) =>
      val merges = operators.Bpe.trainOnCounts(corpus.toArray, n)
      operators.Bpe.encodeWord(w, merges).mkString("") == w + "</w>"
    })
  }

  test("oversampleMix: exact budgets, dense copy indices, determinism " +
      "for arbitrary group sizes and budget regimes") {
    val caseGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1, 12),     // group size
      Gen.chooseNum(0L, 40L))   // budget (sub-, exact-, over-sampling)
    ).map(_.take(4))
    check("oversample", Prop.forAll(caseGen) { cases =>
      val rows = cases.zipWithIndex.flatMap { case ((n, _), g) =>
        (0 until n).map(i =>
          Row(s"g$g", (g * 1000 + i).toLong, s"text $g $i payload"))
      }
      val schema = StructType(Seq(
        StructField("grp", StringType),
        StructField("doc_id", LongType),
        StructField("text", StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      val budgets = spark.createDataFrame(
        spark.sparkContext.parallelize(
          cases.zipWithIndex.map { case ((_, b), g) => Row(s"g$g", b) }),
        StructType(Seq(StructField("grp", StringType),
          StructField("budget", LongType))))
      val out = operators.Sampling
        .oversampleMix(df, "grp", "text", "doc_id", budgets)
        .select("grp", "doc_id", "copy_n").collect()
      val byGroup = out.groupBy(_.getString(0))
      cases.zipWithIndex.forall { case ((_, b), g) =>
        byGroup.getOrElse(s"g$g", Array.empty).length.toLong == b
      } && byGroup.values.flatten.groupBy(r => (r.getString(0), r.getLong(1)))
        .forall { case (_, copies) =>
          // per doc: copy_n is exactly 1..k
          copies.map(_.getLong(2)).toSet == (1L to copies.size).toSet
        }
    })
  }
}
