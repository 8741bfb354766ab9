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
