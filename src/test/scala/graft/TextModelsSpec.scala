package graft

import org.apache.spark.sql.functions._

/** Behavior pins for the integer-bits probabilistic text models
  * (operators.LmScore) and semantic decontamination (operators.Dedup):
  * the oracle proves cross-engine exactness; these prove the MODELS do
  * what their names claim on held-out structure the oracle can't see. */
class TextModelsSpec extends GraftSpecBase {

  private def docs = Tables(spark, sfDir, "documents")

  test("fluencyScores: every multi-token doc scored, gate is the mean rule") {
    val scored = ops.fluencyScores(docs).collect()
    val expected = docs
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(scored.length == expected.toInt,
      s"scored ${scored.length} docs, corpus has $expected multi-token docs")
    scored.foreach { r =>
      val (n, s, avg, fl) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(n > 0 && s >= 0, "surprise bits are non-negative")
      assert(avg == s.toDouble / n.toDouble, "avg is the one double division")
      assert(fl == (if (avg <= 6.0) 1L else 0L), "gate == mean rule")
    }
  }

  test("fluencyScores: scrambled text scores worse under a natural-text LM") {
    // a corpus with REAL bigram structure (stock phrases — the fixture's
    // text is near-iid, so it can't carry this pin), half of it scrambled
    // by sorting tokens: same unigrams, garbage transitions. Train the LM
    // on the phrase corpus only (the CCNet setup: curated reference corpus
    // via modelDocs); phrase docs ride high-count transitions, scrambled
    // docs' surviving pairs are the model's rare ones.
    val s = spark; import s.implicits._
    val phrases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a stitch in time saves nine every single day",
      "early to bed and early to rise makes sense",
      "all that glitters is not gold they say")
    val nat = (0 until 80).map { i =>
      val t = phrases(i % phrases.length) + " " + phrases((i + 1) % phrases.length)
      (i.toLong, t, "en")
    }.toDF("doc_id", "text", "lang")
    val scr = nat.select((col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", array_sort(split(col("text"), " "))).as("text"),
      col("lang"))
    // under the integer-bits quantization, "scores worse" surfaces as model
    // COVERAGE collapse: transitions absent from the model are dropped by
    // the inner join (the documented semantics), so a scrambled doc keeps
    // only its accidentally-natural pairs. Natural docs must retain every
    // pair; scrambled docs must lose most of theirs.
    val all = nat.unionByName(scr)
    val cov = ops.fluencyScores(all, modelDocs = nat)
      .join(all.select(col("doc_id"),
        (size(split(col("text"), " ")) - 1).as("total_pairs")), "doc_id")
      .withColumn("grp", when(col("doc_id") >= 100000, "scr").otherwise("nat"))
      .groupBy("grp").agg(
        (sum(col("n_pairs")).cast("double") /
          sum(col("total_pairs")).cast("double")).as("coverage"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cov("nat") == 1.0,
      s"self-covered natural corpus, got ${cov("nat")}")
    assert(cov.getOrElse("scr", 0.0) < 0.5,
      s"scrambled transitions should mostly miss the model: ${cov.get("scr")}")
  }

  test("nbClassify: every doc classified exactly once on the fixture") {
    // the fixture's five langs share one vocabulary (synthetic text), so
    // language identity is NOT separable here — the oracle pins the exact
    // confusion matrix; this pins only the output contract.
    val m = ops.nbClassify(docs).collect()
    assert(m.length == docs.count().toInt, "one prediction row per doc")
    assert(m.map(_.getLong(0)).distinct.length == m.length)
  }

  test("nbClassify: diagonal-dominant on a separable synthetic corpus") {
    // three classes with disjoint content vocabularies plus shared filler —
    // the structure the fixture lacks; NB must recover the labels.
    val s = spark; import s.implicits._
    val vocab = Map(
      "red"  -> Seq("crimson", "scarlet", "ruby", "maroon", "cherry"),
      "blue" -> Seq("azure", "cobalt", "navy", "teal", "sapphire"),
      "grn"  -> Seq("olive", "emerald", "lime", "forest", "jade"))
    val filler = Seq("the", "a", "of", "and", "to")
    val rows = for {
      (cls, words) <- vocab.toSeq
      i <- 0 until 40
    } yield {
      val toks = (0 until 12).map { j =>
        if (j % 3 == 2) filler((i + j) % filler.length)
        else words((i * 7 + j * 3) % words.length)
      }
      (cls.hashCode.toLong * 100 + i, toks.mkString(" "), cls)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val m = ops.nbClassify(df).collect()
    val correct = m.count(r => r.getString(1) == r.getString(2))
    assert(m.length == rows.length)
    assert(correct.toDouble / m.length >= 0.95,
      s"NB should separate disjoint vocabularies: $correct/${m.length}")
  }

  test("nbClassify: deterministic across partitionings") {
    val a = ops.nbClassify(docs).collect()
      .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    val b = ops.nbClassify(docs.repartition(7, col("source"))).collect()
      .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b), "argmin must not depend on partitioning")
  }

  test("perceptronTrain: converges on a separable set, matches hand math") {
    val sp = TestSpark.spark
    import sp.implicits._
    // 1-D separable around the origin: y = sign(x)
    val f = Seq((1L, 1L, 2L), (1L, 1L, 3L),
      (-1L, 1L, -2L), (-1L, 1L, -3L)).toDF("y", "b", "x").persist()
    val (w, miss) = ops.perceptronTrain(f, Seq("b", "x"), "y", rounds = 3)
    // round 1: w=0, all 4 misclassified -> w = (sum y*b, sum y*x) = (0, 10)
    assert(miss.head == 4L)
    assert(w == Seq(0L, 10L), w.toString)
    // separable: later rounds must reach zero misclassifications and then
    // stop changing the weights (update sum over an empty set)
    assert(miss.last == 0L, s"did not converge: $miss")
    val (w2, _) = ops.perceptronTrain(f, Seq("b", "x"), "y", rounds = 5)
    assert(w == w2, s"converged weights drifted: $w vs $w2")
    // the learned rule actually separates the training set
    val errs = f.selectExpr(s"y * (${w.head} * b + ${w(1)} * x) AS m")
      .filter(col("m") <= 0).count()
    assert(errs == 0L)
    f.unpersist()
  }

  test("semanticDecontaminate: one best row per flagged eval, cos >= tau") {
    val e = Tables(spark, sfDir, "embeddings")
    val train = e.filter(col("label") =!= 0)
    val eval = e.filter(col("label") === 0)
    val flagged = ops.semanticDecontaminate(train, eval).collect()
    assert(flagged.map(_.getLong(0)).distinct.length == flagged.length,
      "one row per contaminated eval item")
    flagged.foreach(r => assert(r.getDouble(2) >= 0.4))
  }

  test("semanticDecontaminate: recall vs brute-force truth") {
    val e = Tables(spark, sfDir, "embeddings")
    val train = e.filter(col("label") =!= 0)
    val eval = e.filter(col("label") === 0)
    val truth = eval.select(col("vec_id").as("eval_id"),
        col("embedding").as("ea"))
      .crossJoin(train.select(col("vec_id").as("train_id"),
        col("embedding").as("eb")))
      .withColumn("cos", expr("cosine_sim(ea, eb)"))
      .filter(col("cos") >= 0.4)
      .select("eval_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val got = ops.semanticDecontaminate(train, eval)
      .collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(truth), "precision is exact (true cosine verified)")
    if (truth.nonEmpty)
      assert(got.size.toDouble / truth.size >= 0.8,
        s"LSH recall ${got.size}/${truth.size} below 0.8")
  }

  test("piiFlags: Luhn gate accepts real cards, rejects 16-digit decoys") {
    val sp = TestSpark.spark
    import sp.implicits._
    val in = Seq(
      (1L, "contact user@example.com or 555-867-5309 now"),
      (2L, "card 4111111111111111 on file"),          // Luhn-valid
      (3L, "order 4111111111111112 confirmed"),       // Luhn-INVALID decoy
      (4L, "server at 10.0.42.7 responded"),
      (5L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = ops.piiFlags(in).collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6))).toMap
    assert(out(1L) == ((1L, 1L, 0L, 0L, true)))
    assert(out(2L) == ((0L, 0L, 0L, 1L, true)), "valid card must flag")
    assert(out(3L) == ((0L, 0L, 0L, 0L, false)),
      "Luhn-invalid 16-digit run must NOT flag")
    assert(out(4L) == ((0L, 0L, 1L, 0L, true)))
    assert(out(5L) == ((0L, 0L, 0L, 0L, false)))
  }

  test("removeBoilerplate: shared chunks cut, unique docs untouched, order kept") {
    val sp = TestSpark.spark
    import sp.implicits._
    val banner = (1 to 8).map(i => s"cookie$i").mkString(" ")  // one chunk
    val bodyA = (1 to 8).map(i => s"alpha$i").mkString(" ")
    val bodyB = (1 to 8).map(i => s"beta$i").mkString(" ")
    val bodyC = (1 to 8).map(i => s"gamma$i").mkString(" ")
    val in = Seq(
      (1L, s"$banner $bodyA"),          // banner + unique body
      (2L, s"$bodyB $banner"),          // banner at the END (order check)
      (3L, s"$banner $bodyC"),
      (4L, "short unique doc"))         // < 1 full chunk, untouched
      .toDF("doc_id", "text")
    val out = ops.removeBoilerplate(in, "doc_id", "text", 8, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // banner appears in 3 docs > maxDf=2 -> cut everywhere; bodies survive
    assert(out(1L) == ((bodyA, 2L, 1L)))
    assert(out(2L) == ((bodyB, 2L, 1L)), "surviving chunk keeps its position")
    assert(out(3L) == ((bodyC, 2L, 1L)))
    assert(out(4L) == (("short unique doc", 1L, 0L)), "unique doc untouched")
    // a doc that is ONLY boilerplate reassembles to the empty string
    val all = ops.removeBoilerplate(
      in.union(Seq((5L, banner)).toDF("doc_id", "text")),
      "doc_id", "text", 8, 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(5L) == "")
  }
}
