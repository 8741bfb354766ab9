package graft

import org.apache.spark.sql.functions._

/** Invariants of the end-to-end curation pipeline (q_docs_pipeline is
  * rows-only for the driver — the near-dup stage is xxhash-derived — so the
  * correctness story lives here). Fixture + hash seeds are fixed, making
  * every assertion exact. */
class DocPipelineSpec extends GraftSpecBase {

  private lazy val input = Tables(spark, sfDir, "documents")
  private lazy val kept = operators.DocPipeline.curatedDocs(input)

  test("pipeline output is a curated subset with all stages applied") {
    val nIn = input.count()
    val nKept = kept.count()
    assert(nKept > 0, "pipeline must keep documents")
    assert(nKept < nIn, "pipeline must drop documents (gate + dedup)")
  }

  test("every survivor passed the quality and language gate") {
    assert(kept.filter(col("quality") < 0.7).count() == 0)
    assert(kept.filter(!col("lang").isin("en", "fr", "es", "de")).count() == 0)
  }

  test("no two survivors share an exact text fingerprint") {
    val dupFps = kept.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupFps == 0)
  }

  test("no near-dup candidate pair survives the cluster stage") {
    // any pair among survivors would mean both endpoints were kept from one
    // connected component — impossible when only each component's label
    // representative survives
    val residual = operators.Dedup.minHashNearDup(
      kept.select(col("doc_id"), col("text")),
      "doc_id", "text", threshold = 0.5)
    assert(residual.count() == 0)
  }

  test("cleaning pipeline leaves zero PII-shaped bytes in the corpus") {
    // q_docs_pipeline_clean's oracle pins the checksums; this pins the
    // SEMANTIC claim those checksums encode: after salt -> scrub ->
    // boilerplate -> dedup, no surviving text contains an email shape or
    // a digit (every injected email/phone/card was masked before the
    // boilerplate and dedup stages ever saw the text)
    val docs = input
    val cls = expr(
      "CAST(conv(substr(md5(text), 30, 1), 16, 10) AS BIGINT) % 5")
    val salted = docs.select(col("doc_id"), col("source"),
      concat(col("text"), lit(" "),
        when(cls === 0, concat(lit("user"), col("doc_id"),
          lit("@example.com")))
          .when(cls === 1, lit("555-867-5309"))
          .when(cls === 2, lit("4111111111111111"))
          .when(cls === 3, lit("4111111111111112"))
          .otherwise(lit("clean"))).as("salted"))
    val scrubbed = salted.select(col("doc_id"), col("source"),
      operators.Sampling.scrubbed(col("salted")).as("clean0"))
    val cleaned = operators.TextAnalysis
      .removeBoilerplate(scrubbed, "doc_id", "clean0")
    val dirty = cleaned.filter(
      col("clean_text").rlike("@") || col("clean_text").rlike("[0-9]"))
    assert(dirty.count() == 0,
      s"PII-shaped bytes survived: ${dirty.take(3).mkString("; ")}")
    // and the salt really was there before cleaning
    assert(salted.filter(col("salted").rlike("[0-9]|@")).count() > 0)
  }

  test("exact dedup keeps the smallest doc_id of each fingerprint group") {
    val gatedIds = operators.DocPipeline
      .curatedDocs(input, jaccard = 1.1) // disable near-dup drops (no pairs)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val minPerFp = gatedIds.groupBy(col("fp")).agg(min(col("doc_id")).as("mn"))
    val offenders = gatedIds.join(minPerFp, "fp")
      .filter(col("doc_id") =!= col("mn")).count()
    assert(offenders == 0)
  }
}
