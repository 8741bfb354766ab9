package graft

import org.apache.spark.sql.functions._

/** Pins for the unicode_norm kernel beyond what the DuckDB-checked golden
  * covers: all four forms, null flow, and the ASCII zero-copy fast path
  * returning the SAME object (no String round-trip on the hot path). */
class UnicodeNormSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  private def norm(s: String, form: String): String =
    sp.range(1).select(expr(s"unicode_norm('$s', '$form')")).head.getString(0)

  test("all four forms map the canonical examples") {
    val decomposed = "café"
    val composed = "café"
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    assert(norm("ﬁle", "NFKC") == "file")   // ﬁ ligature folds
    assert(norm("ﬁle", "NFC") == "ﬁle") // …but NFC keeps it
    assert(norm("ﬁle", "NFKD") == "file")
    assert(norm("Ａ１", "NFKC") == "A1")  // full-width forms
    // NFKC of a composed char stays composed; NFKD decomposes it
    assert(norm(composed, "NFKC") == composed)
    assert(norm(composed, "NFKD") == decomposed)
  }

  test("null propagates, unknown form rejects, ascii is identity") {
    val r = Seq((Option.empty[String], "x"), (Some("plain"), "y"))
      .toDF("s", "k")
      .selectExpr("unicode_norm(s, 'NFKC') AS n").collect()
    assert(r.map(x => Option(x.getString(0))).toSet ==
      Set(None, Some("plain")))
    intercept[Exception] {
      sp.range(1).selectExpr("unicode_norm('x', 'NFX')").collect()
    }
    // fast path: the kernel returns the input object untouched on ASCII
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("ascii only")
    assert(functions.UnicodeNormKernel.normalize(
      in, functions.UnicodeNormKernel.NFKC) eq in)
  }

  test("idempotence on the corpus: normalizing twice equals once") {
    val docs = Tables(sp, sfDir, "documents").limit(200)
    val bad = docs.selectExpr(
        "unicode_norm(text, 'NFKC') AS once",
        "unicode_norm(unicode_norm(text, 'NFKC'), 'NFKC') AS twice")
      .filter(col("once") =!= col("twice")).count()
    assert(bad == 0)
  }
}
