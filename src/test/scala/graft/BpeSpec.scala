package graft

import org.apache.spark.sql.functions._

import TestSpark.spark.implicits._

/** BPE tokenizer training (operators.Bpe): the classic fixture's expected
  * merges, determinism across partitionings, and the encode round-trip. */
class BpeSpec extends GraftSpecBase {

  // Sennrich et al.'s walkthrough corpus: low x5, lower x2, newest x6,
  // widest x3 — the first merges must fuse the 'est</w>' suffix family.
  private val corpus: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("first merges learn the est</w> suffix family from the fixture") {
    val docs = corpus.toDF("text")
    val merges = operators.Bpe.train(docs, "text", nMerges = 4)
    val asPairs = merges.map(m => (m.left, m.right))
    // pair mass: (e,s) = 9, (s,t</w>) = 9 -> tie broken pair-ASC: (e,s)
    // first; then (es,t</w>) = 9; then the l/o family (lo appears 7x)
    assert(asPairs.take(2) == Seq(("e", "s"), ("es", "t</w>")),
      s"unexpected merge order: $asPairs")
    assert(asPairs(2) == ("l", "o"), s"third merge should be (l,o): $asPairs")
  }

  test("training is deterministic across partitionings") {
    val a = operators.Bpe.train(corpus.toDF("text").repartition(1),
      "text", 6)
    val b = operators.Bpe.train(corpus.toDF("text").repartition(13),
      "text", 6)
    assert(a == b)
  }

  test("encodeWord applies merges in training order") {
    val merges = operators.Bpe.trainOnCounts(
      Array("newest" -> 6L, "widest" -> 3L, "low" -> 5L, "lower" -> 2L), 3)
    // after (e,s), (es,t</w>), (l,o): 'newest' ends in the fused est</w>
    val toks = operators.Bpe.encodeWord("newest", merges)
    assert(toks.last == "est</w>", s"got $toks")
    assert(toks.mkString("") == "newest</w>")
    // unseen word still round-trips through characters
    val cold = operators.Bpe.encodeWord("zap", merges)
    assert(cold.mkString("") == "zap</w>")
  }

  test("distributed encode matches the driver function and counts tokens") {
    val docs = corpus.toDF("text")
    val merges = operators.Bpe.train(docs, "text", 4)
    val out = operators.Bpe.encoded(
      Seq("low newest", "wider").toDF("text"), "text", merges)
    val rows = out.select(col("text"), col("bpe_tokens"), col("n_bpe_tokens"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getLong(2))).toMap
    val expect1 = operators.Bpe.encodeWord("low", merges) ++
      operators.Bpe.encodeWord("newest", merges)
    assert(rows("low newest")._1 == expect1)
    assert(rows("low newest")._2 == expect1.length.toLong)
    assert(rows("wider")._1.mkString("") == "wider</w>")
  }

  test("vocabulary cap keeps the most frequent words deterministically") {
    val docs = (Seq.fill(10)("aa") ++ Seq.fill(10)("bb") ++ Seq("rare"))
      .toDF("text")
    val counts = operators.Bpe.wordCounts(docs, "text", maxVocab = 2)
    assert(counts.map(_._1).toSeq == Seq("aa", "bb"))
  }
}
