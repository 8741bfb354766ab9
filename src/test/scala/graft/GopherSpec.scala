package graft

import org.apache.spark.sql.functions._

import TestSpark.spark.implicits._

/** Gopher-style quality flags (TextAnalysis.gopherFlags): each rule
  * exercised by a crafted document that violates exactly that rule, plus a
  * clean document and the one-word degenerate case (no bigrams). */
class GopherSpec extends GraftSpecBase {

  private val clean =
    "the cat and dog runs over hill with big red fox near tall tree then " +
      "bird flies past open door into warm home"

  private def flags(docs: (Long, String)*): Map[Long, Map[String, Int]] = {
    plans.GraftFunctions.ensureRegistered(spark)
    ops.gopherFlags(docs.toSeq.toDF("doc_id", "text"))
      .collect()
      .map { r =>
        r.getAs[Long]("doc_id") -> Seq("f_words", "f_meanlen", "f_dup",
          "f_top2", "f_stop").map(f => f -> r.getAs[Int](f)).toMap
      }.toMap
  }

  test("clean document passes every rule") {
    val f = flags(1L -> clean)(1L)
    assert(f.values.forall(_ == 1), s"expected all-pass, got $f")
  }

  test("word-count bound: a 5-word doc fails f_words only") {
    val f = flags(1L -> "the cat and dog runs")(1L)
    assert(f("f_words") == 0 && f("f_meanlen") == 1 && f("f_dup") == 1)
  }

  test("mean word length: long jargon fails f_meanlen") {
    val longWords = (1 to 25).map(i => s"interminable$i").mkString(" ")
    val f = flags(1L -> longWords)(1L)
    assert(f("f_meanlen") == 0 && f("f_words") == 1)
  }

  test("repetition: one word repeated fails f_dup AND f_top2") {
    val rep = Seq.fill(30)("spam").mkString(" ")
    val f = flags(1L -> rep)(1L)
    assert(f("f_dup") == 0 && f("f_top2") == 0)
  }

  test("stopword presence: stopword-free text fails f_stop") {
    val noStop = (1 to 25).map(i => s"tok$i").mkString(" ")
    val f = flags(1L -> noStop)(1L)
    assert(f("f_stop") == 0)
  }

  test("degenerate one-word doc: no bigrams, f_top2 passes via coalesce(0)") {
    val f = flags(1L -> "word")(1L)
    assert(f("f_top2") == 1)
  }

  test("is_clean is the conjunction of all five flags") {
    plans.GraftFunctions.ensureRegistered(spark)
    val out = ops.gopherFlags(Seq(
      1L -> clean, 2L -> Seq.fill(30)("spam").mkString(" "))
      .toDF("doc_id", "text"))
      .select("doc_id", "is_clean").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) && !out(2L))
  }
}
