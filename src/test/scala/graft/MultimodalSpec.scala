package graft

import org.apache.spark.sql.functions._

/** Verifies the byte-level parts of the multimodal decode stub that the
  * DuckDB oracle can't reach (blob folding). */
class MultimodalSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  test("decode stub byte_sum matches local byte arithmetic") {
    val docs = Tables(sp, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().take(20).toMap
    val decoded = operators.Multimodal.pipeline.run(sp, sfDir)
    assert(decoded.columns.toSeq ==
      Seq("doc_id", "n_bytes", "n_frames", "feat0", "fp"))
    // recompute through a typed pipeline including byte sums:
    val blobs = Tables(sp, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        (id, blob.map(b => (b & 0xff).toLong).sum, blob.length.toLong)
      }
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val (gotSum, gotLen) = blobs(id)
      assert(gotLen == bytes.length.toLong)
      assert(gotSum == bytes.map(b => (b & 0xff).toLong).sum)
    }
  }

  test("frame sampling emits only full 64-byte frames") {
    val frames = operators.Multimodal.frameSample.run(sp, sfDir)
    val n = frames.count()
    assert(n > 0)
    assert(frames.select(countDistinct(col("frame_id"))).head.getLong(0) <= 3)
  }
}
