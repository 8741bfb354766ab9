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

  test("BMP synth+parse roundtrips known dimensions byte-exactly") {
    // a 3x2 24-bit image: the header bytes are the BITMAPFILEHEADER spec
    val df = sp.range(1).select(
      operators.Multimodal.synthBmp(lit(3L), lit(2L), lit(3L),
        lit(Array[Byte](1, 2))).as("blob"))
    val hdr = df.select(hex(col("blob")).as("h")).head.getString(0)
    // 'BM', fileSize=3*2*3+54=72=0x48 LE, reserved, offset 54=0x36, DIB 40
    assert(hdr.startsWith("424D" + "48000000" + "00000000" + "36000000" +
      "28000000" + "03000000" + "02000000" + "0100" + "1800"))
    val m = df.select(operators.Multimodal.bmpMeta(col("blob")).as("m"))
      .select("m.magic_ok", "m.width", "m.height", "m.channels", "m.bpp",
        "m.img_bytes", "m.file_bytes").head
    assert(m.getBoolean(0))
    assert((m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4),
      m.getLong(5), m.getLong(6)) == ((3L, 2L, 3L, 24L, 18L, 72L)))
  }

  test("WAV synth+parse roundtrips a 16-bit stereo 44.1kHz second") {
    val df = sp.range(1).select(
      operators.Multimodal.synthWav(lit(2L), lit(44100L), lit(16L),
        lit(44100L)).as("blob"))
    assert(df.select(length(col("blob"))).head.getInt(0) == 44)
    val m = df.select(operators.Multimodal.wavMeta(col("blob")).as("m"))
      .select("m.riff_ok", "m.n_channels", "m.sample_rate", "m.byte_rate",
        "m.bits", "m.data_bytes").head
    assert(m.getBoolean(0))
    assert((m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4),
      m.getLong(5)) == ((2L, 44100L, 176400L, 16L, 176400L)))
  }

  test("PNG chunk walk parses data-dependent offsets on a known blob") {
    // DATA length 5, fill byte 0xAB: the walk must find chunk 2 and 3 at
    // offsets computed from chunk 1's and 2's parsed lengths
    val df = sp.range(1).select(
      operators.Multimodal.synthPng(lit(5L), lit(0xABL)).as("blob"))
    val blobLen = df.select(length(col("blob"))).head.getInt(0)
    // 8 sig + (12+13) IHDR + (12+5) DATA + 12 IEND = 62
    assert(blobLen == 62)
    val m = df.select(operators.Multimodal.pngChunkWalk(col("blob")).as("m"))
      .select("m.sig_ok", "m.t1", "m.l1", "m.t2", "m.l2", "m.t3", "m.l3",
        "m.total_len").head
    assert(m.getBoolean(0))
    assert((m.getString(1), m.getLong(2)) == (("IHDR", 13L)))
    assert((m.getString(3), m.getLong(4)) == (("DATA", 5L)))
    assert((m.getString(5), m.getLong(6)) == (("IEND", 0L)))
    assert(m.getLong(7) == 62L)
    // the DATA payload really is the fill byte repeated
    val payload = df.select(hex(substring(col("blob"), 42, 5))).head.getString(0)
    assert(payload == "ABABABABAB")
  }

  test("TIFF IFD pointer dereference survives any filler displacement") {
    // same dims behind filler 0 and filler 15: the parse must follow the
    // pointer, not assume a fixed IFD position
    val df = sp.range(2).select(col("id"),
      operators.Multimodal.synthTiff(lit(640L), lit(480L), lit(16L),
        col("id") * 15).as("blob"))
    val rows = df.select(col("id"),
        operators.Multimodal.tiffMeta(col("blob")).as("m"))
      .selectExpr("id", "m.ii_ok", "m.ifd_off", "m.n_entries",
        "m.width", "m.height", "m.bits")
      .collect().sortBy(_.getLong(0))
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getBoolean(1), s"ii_ok row $i")
      assert(r.getLong(2) == 8L + i * 15, s"ifd_off row $i")
      assert(r.getLong(3) == 3L)
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((640L, 480L, 16L)))
    }
  }

  test("patchify: 4x4 image with 2x2 patches assigns quadrants exactly") {
    // payload bytes 0..15 laid out row-major; quadrant sums are known
    val df = sp.range(1).select(col("id").as("doc_id"),
      unhex(lit("000102030405060708090A0B0C0D0E0F")).as("blob"))
    val r = ops.patchify(df, "doc_id", "blob", width = 4, height = 4,
        patch = 2, payloadOff = 1)
      .collect().map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3))).toMap
    // patch 0 = {0,1,4,5}, 1 = {2,3,6,7}, 2 = {8,9,12,13}, 3 = {10,11,14,15}
    assert(r == Map(0L -> ((10L, 5L)), 1L -> ((18L, 7L)),
      2L -> ((42L, 13L)), 3L -> ((50L, 15L))), r.toString)
  }

  test("audioFrameEnergy: hand-built frames census silent runs exactly") {
    // doc 0: silent(0x80*8) | loud(0x00*8) | silent | silent  -> runs 1,2
    // doc 1: all-silent 16 samples -> 2 frames, run 2
    val df = sp.range(2).select(col("id").as("doc_id"),
      concat(
        operators.Multimodal.synthWav(lit(1), lit(8000L), lit(8),
          when(col("id") === 0, 32L).otherwise(16L)),
        when(col("id") === 0,
          unhex(concat(lit("80" * 8), lit("00" * 8), lit("80" * 16))))
          .otherwise(unhex(lit("80" * 16)))).as("blob"))
    val r = ops.audioFrameEnergy(df, "doc_id", "blob")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // loud frame energy: 8 samples of (0-128)^2 = 8*16384
    assert(r(0L) == ((4L, 3L, 8L * 16384L, 2L)), r.toString)
    assert(r(1L) == ((2L, 2L, 0L, 2L)), r.toString)
  }

  test("dedupBlobs keeps exactly one lowest-id row per distinct blob") {
    val df = Seq((5L, "aa", "x"), (3L, "aa", "y"), (7L, "bb", "z"))
      .toDF("id", "payload", "tag")
      .select(col("id"), col("payload").cast("binary").as("blob"), col("tag"))
    val out = operators.Multimodal.dedupBlobs(df, "id", "blob")
      .select(col("id"), col("tag")).as[(Long, String)].collect().sorted
    assert(out.toSeq == Seq((3L, "y"), (7L, "z")))
  }

  test("interleavePack never exceeds the window unless a single item does") {
    val items = Tables(sp, sfDir, "documents").select(col("lang"),
      md5(col("text").cast("binary")).as("h"), col("doc_id"),
      lit(0).as("pos"),
      (length(col("text")) % 700 + 1).cast("long").as("toks"))
    val packed = operators.Multimodal.interleavePack(
      items, "lang", Seq("h", "doc_id", "pos"), "toks", 2048)
    val over = packed.groupBy(col("lang"), col("seq_id"))
      .agg(sum(col("toks")).as("t"), count(lit(1)).as("n"))
      .filter(col("t") > 2048 && col("n") > 1)
    // a window may only overflow via its LAST item straddling the boundary,
    // so overshoot is < one max item size, never a whole extra item chain
    assert(over.filter(col("t") > 2048 + 700).count() == 0)
    // determinism: same input → same packing
    val again = operators.Multimodal.interleavePack(
      items, "lang", Seq("h", "doc_id", "pos"), "toks", 2048)
    assert(packed.exceptAll(again).count() == 0)
  }

  test("blobHistogramSig emits one 16-slot integer signature per doc") {
    val blobs = Tables(sp, sfDir, "documents").limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val sigs = operators.Multimodal.blobHistogramSig(blobs, "doc_id", "blob")
    assert(sigs.count() == 50)
    val sig = sigs.select(col("bh_sig")).head.getString(0)
    assert(sig.split(",").length == 16)
    assert(sig.split(",").forall(s => s.matches("[0-9]+")))
  }
}
