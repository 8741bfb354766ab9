package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Round-trip + robustness pins for the multimodal container kernels that
  * the in-query synthesis can't prove: (1) blobs that were WRITTEN to
  * parquet as a binary column, committed, and read back parse identically
  * to fresh expression-pipeline bytes; (2) the try-parse path routes
  * truncated/mislabeled containers to a status instead of fabricating
  * metadata; (3) the pure-ASCII fixture property the q_mm_* DuckDB
  * oracles rely on (they index CHARACTERS where Spark indexes BYTES) is
  * asserted per scale factor, so a fixture refresh that introduces
  * multi-byte text fails loudly here rather than silently corrupting
  * oracle-exactness. */
class MultimodalFixtureSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  private val fixPath = "src/test/resources/fixtures/mm_blobs.parquet"
  private def fixture = sp.read.parquet(fixPath)
  private def docs = Tables(sp, sfDir, "documents")

  test("committed parquet blobs are bit-identical to fresh synthesis") {
    // regenerate with: sbt "runMain graft.tools.MmFixtureGen"
    val fresh = Multimodal.blobFixture(docs)
    val j = fixture.select(col("doc_id"), md5(col("bmp")).as("f_bmp"),
        md5(col("wav")).as("f_wav"), md5(col("png")).as("f_png"),
        md5(col("tiff")).as("f_tiff"))
      .join(fresh.select(col("doc_id"), md5(col("bmp")).as("s_bmp"),
        md5(col("wav")).as("s_wav"), md5(col("png")).as("s_png"),
        md5(col("tiff")).as("s_tiff")), "doc_id")
    val n = docs.count()
    assert(fixture.count() == n, "fixture must cover every sf0.001 doc")
    val mismatched = j.filter(
      col("f_bmp") =!= col("s_bmp") || col("f_wav") =!= col("s_wav") ||
      col("f_png") =!= col("s_png") || col("f_tiff") =!= col("s_tiff"))
      .count()
    assert(mismatched == 0,
      s"$mismatched docs changed bytes across the parquet round-trip")
  }

  test("read-back blobs parse to the md5-derived ground truth") {
    // the same claim the q_mm_* oracles check, but over blobs that came
    // off DISK: parse every committed container and compare field-by-
    // field against dimensions recomputed from the document text
    val expect = docs.select(col("doc_id"),
      (expr("CAST(conv(substr(md5(text), 1, 3), 16, 10) AS BIGINT)") % 512
        + 1).as("e_bmp_w"),
      when(expr("CAST(conv(substr(md5(text), 8, 1), 16, 10) AS BIGINT)")
          % 3 === 0, 8000L)
        .when(expr("CAST(conv(substr(md5(text), 8, 1), 16, 10) AS BIGINT)")
          % 3 === 1, 16000L).otherwise(44100L).as("e_rate"),
      (expr("CAST(conv(substr(md5(text), 16, 2), 16, 10) AS BIGINT)") % 64
        + 1).as("e_png_l2"),
      (expr("CAST(conv(substr(md5(text), 1, 3), 16, 10) AS BIGINT)") % 2048
        + 1).as("e_tiff_w"))
    val parsed = fixture.select(col("doc_id"),
      Multimodal.bmpMeta(col("bmp")).getField("width").as("p_bmp_w"),
      Multimodal.wavMeta(col("wav")).getField("sample_rate").as("p_rate"),
      Multimodal.pngChunkWalk(col("png")).getField("l2").as("p_png_l2"),
      Multimodal.tiffMeta(col("tiff")).getField("width").as("p_tiff_w"),
      Multimodal.bmpMeta(col("bmp")).getField("magic_ok").as("bmp_ok"),
      Multimodal.wavMeta(col("wav")).getField("riff_ok").as("wav_ok"))
    val bad = parsed.join(expect, "doc_id").filter(
      !col("bmp_ok") || !col("wav_ok") ||
      col("p_bmp_w") =!= col("e_bmp_w") || col("p_rate") =!= col("e_rate") ||
      col("p_png_l2") =!= col("e_png_l2") ||
      col("p_tiff_w") =!= col("e_tiff_w")).count()
    assert(bad == 0, s"$bad read-back blobs parsed wrong")
  }

  test("try-parse: truncation and dead magic route to statuses, never fields") {
    val cases = fixture.limit(5).select(col("doc_id"), col("bmp"))
    val r = cases.select(
      Multimodal.bmpStatus(col("bmp")).as("intact"),
      Multimodal.bmpStatus(expr("substring(bmp, 1, 20)")).as("trunc"),
      Multimodal.bmpStatus(concat(unhex(lit("00")),
        expr("substring(bmp, 2, octet_length(bmp))"))).as("magic"))
      .collect()
    assert(r.forall(_.getString(0) == "ok"), r.mkString(","))
    assert(r.forall(_.getString(1) == "truncated"), r.mkString(","))
    assert(r.forall(_.getString(2) == "bad_magic"), r.mkString(","))
  }

  test("degenerate payloads: no phantom frames, no null-bucket signatures") {
    // WAV payload shorter than one frame: sequence(0, -1) would DESCEND
    // and read header bytes — the guard drops the doc instead
    val shortWav = Seq((1L, "x")).toDF("doc_id", "t")
      .select(col("doc_id"), concat(
        Multimodal.docWavBlob(col("t")),
        expr("CAST('abc' AS BINARY)")).as("blob")) // 3-byte payload < 8
    assert(Multimodal.audioFrameEnergy(shortWav, "doc_id", "blob")
      .count() == 0)
    // empty blob: sequence(1, 0) would DESCEND and NULL the bucket key —
    // the guard emits no signature row
    val empty = Seq((2L, Array.empty[Byte])).toDF("doc_id", "blob")
    assert(Multimodal.blobHistogramSig(empty, "doc_id", "blob").count() == 0)
  }

  test("documents text is pure ASCII at every scale factor (oracle contract)") {
    // the q_mm_audio_energy / q_mm_blob_histo_neardup oracles index
    // CHARACTERS (DuckDB substring on VARCHAR) while Spark indexes BYTES
    // of the cast binary — equivalent ONLY while the fixture is ASCII
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val nonAscii = Tables(sp, s"/root/testdata/$sf", "documents")
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0,
        s"$sf has $nonAscii non-ASCII docs — byte-indexed q_mm_* oracles " +
          "would silently diverge; respell them byte-wise before refresh")
    }
  }
}
