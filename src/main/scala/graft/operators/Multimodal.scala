package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One decoded multimodal record after the (stubbed) decode stage. */
final case class MMFeature(
    doc_id: Long,
    n_bytes: Long,
    n_frames: Long,
    feat0: Long,
    byte_sum: Long,
    fp: String)

/** Multimodal-column operators: opaque `binary` payloads + typed metadata.
  *
  * The pillar has four legs, all pure binary/arithmetic kernels so every
  * query is DuckDB-oracle-checkable without any codec library:
  *
  *  1. container header synth + parse — REAL container layouts (BMP's
  *     BITMAPFILEHEADER+BITMAPINFOHEADER, WAV's RIFF/fmt/data chunks)
  *     assembled byte-for-byte from md5-derived dimensions, then parsed
  *     BACK from the blob via binary slicing + little-endian decode. The
  *     oracle recomputes the dimensions independently, so the checked
  *     claim is parse∘synth ≡ identity on genuine container bytes.
  *  2. blob dedup — exact (md5 fingerprint) and near-dup (quantized
  *     byte-histogram signature blocking) over binary columns.
  *  3. MMC4-style interleaved text+image sequence assembly — packing text
  *     chunks and image placeholders into fixed token windows in a pinned
  *     deterministic order (the running-sum pack shape, one window per
  *     language partition — never a global sort).
  *  4. caption↔embedding joint retrieval — documents joined to their
  *     embedding rows, cosine top-k per caption through the custom
  *     CosineTopKJoin plan, candidate metadata joined back on.
  *
  * Real image/audio codecs aren't in the container, so the frame decode in
  * [[pipeline]] stays a clearly-marked deterministic stub; the container
  * parsing above is NOT stubbed — those are the actual BMP/WAV byte
  * layouts.
  *
  * Reference has no multimodal support at all — BinaryType is
  * columnar-unsupported (ConverterUtils.scala:494-508).
  */
object Multimodal {

  // ---------------------------------------------------------------- helpers

  /** Hex pair of the low byte of a long column (uppercase, zero-padded). */
  private def bhex(v: Column): Column = lpad(hex(v.cast("long") % 256), 2, "0")

  /** Little-endian hex image of the low 32 bits of a non-negative long. */
  private def le32hex(v: Column): Column = {
    val x = v.cast("long")
    concat(bhex(x), bhex(shiftright(x, 8)), bhex(shiftright(x, 16)),
      bhex(shiftright(x, 24)))
  }

  /** Little-endian hex image of the low 16 bits of a non-negative long. */
  private def le16hex(v: Column): Column = {
    val x = v.cast("long")
    concat(bhex(x), bhex(shiftright(x, 8)))
  }

  /** Parse an n-byte little-endian unsigned int at 1-based byte offset
    * `off` of a binary column: slice → hex → byte-reverse → base-16. */
  def leDecode(blob: Column, off: Int, n: Int): Column = {
    val h = hex(substring(blob, off, n))
    val reordered = concat((0 until n).reverse.map(i =>
      substring(h, i * 2 + 1, 2)): _*)
    conv(reordered, 16, 10).cast("long")
  }

  /** md5-derived int: value of hex chars [from, from+len) of md5(text) —
    * the cross-engine deterministic "random" source (DuckDB mirror:
    * ('0x'||substr(md5(text),from,len))::BIGINT). */
  private def mdInt(text: Column, from: Int, len: Int): Column =
    conv(substring(md5(text.cast("binary")), from, len), 16, 10).cast("long")

  // -------------------------------------------------- 1a. BMP synth + parse

  /** Assemble a byte-exact 54-byte BMP header (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, BI_RGB) + an 8-byte payload stub for the given
    * dimensions. Layout: 'BM', fileSize u32le, 4 reserved zero bytes,
    * data offset 54, DIB size 40, width i32le, height i32le, planes 1,
    * bpp u16le, compression 0, imageSize u32le, 16 trailing zero bytes. */
  def synthBmp(width: Column, height: Column, channels: Column,
      payloadStub: Column): Column = {
    val imgSize = width * height * channels
    val hdr = concat(
      lit("424D"), le32hex(imgSize + 54), lit("00000000"), le32hex(lit(54)),
      le32hex(lit(40)), le32hex(width), le32hex(height), le16hex(lit(1)),
      le16hex(channels * 8), le32hex(lit(0)), le32hex(imgSize),
      lit("00" * 16))
    concat(unhex(hdr), payloadStub)
  }

  /** Parse a BMP header back out of the blob: every field read from the
    * bytes (offsets are the BITMAPFILEHEADER/INFOHEADER spec positions). */
  def bmpMeta(blob: Column): Column = struct(
    (hex(substring(blob, 1, 2)) === "424D").as("magic_ok"),
    leDecode(blob, 3, 4).as("file_bytes"),
    leDecode(blob, 19, 4).as("width"),
    leDecode(blob, 23, 4).as("height"),
    (leDecode(blob, 29, 2) / lit(8)).cast("long").as("channels"),
    leDecode(blob, 29, 2).as("bpp"),
    leDecode(blob, 35, 4).as("img_bytes"))

  /** The per-document md5-parameterized blob each `q_mm_*` query (and the
    * committed round-trip fixture) synthesizes — ONE definition so the
    * fixture bytes and the in-query bytes can never drift. */
  def docBmpBlob(t: Column): Column = synthBmp(
    mdInt(t, 1, 3) % 512 + 1,
    mdInt(t, 4, 3) % 512 + 1,
    when(mdInt(t, 7, 1) % 3 === 0, 1L)
      .when(mdInt(t, 7, 1) % 3 === 1, 3L).otherwise(4L),
    substring(t.cast("binary"), 1, 8))

  def docWavBlob(t: Column): Column = synthWav(
    mdInt(t, 9, 1) % 2 + 1,
    when(mdInt(t, 8, 1) % 3 === 0, 8000L)
      .when(mdInt(t, 8, 1) % 3 === 1, 16000L).otherwise(44100L),
    (mdInt(t, 10, 1) % 2 + 1) * 8,
    mdInt(t, 11, 5) % 100000 + 1)

  def docPngBlob(t: Column): Column =
    synthPng(mdInt(t, 16, 2) % 64 + 1, mdInt(t, 18, 2))

  def docTiffBlob(t: Column): Column = synthTiff(
    mdInt(t, 1, 3) % 2048 + 1,
    mdInt(t, 4, 3) % 2048 + 1,
    (mdInt(t, 7, 1) % 2 + 1) * 8,
    mdInt(t, 9, 1) % 16)

  /** All four container blobs per document — the committed round-trip
    * fixture's frame ([[graft.tools.MmFixtureGen]] writes it, the
    * MultimodalFixtureSpec proves the parquet-round-tripped bytes parse
    * identically to fresh in-memory synthesis). */
  def blobFixture(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"), docBmpBlob(t).as("bmp"),
      docWavBlob(t).as("wav"), docPngBlob(t).as("png"),
      docTiffBlob(t).as("tiff"))
  }

  /** Synthesize one BMP per document (dims md5-derived: width/height in
    * 1..512, channels in {1,3,4}), then parse the header back from the
    * assembled bytes. The oracle recomputes the dims straight from
    * md5(text), so any byte misplaced in synth OR parse mismatches. */
  val bmpHeader = QueryDef(
    "q_mm_bmp_header",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val blobs = docs.select(col("doc_id"), docBmpBlob(col("text")).as("blob"))
      blobs.select(col("doc_id"), bmpMeta(col("blob")).as("m"))
        .select(col("doc_id"),
          col("m.magic_ok").cast("int").as("magic_ok"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.channels").as("channels"), col("m.bpp").as("bpp"),
          col("m.img_bytes").as("img_bytes"),
          col("m.file_bytes").as("file_bytes"))
    },
    Some("""
      SELECT doc_id, 1 AS magic_ok, width, height, channels,
             channels * 8 AS bpp,
             width * height * channels AS img_bytes,
             width * height * channels + 54 AS file_bytes
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(text), 1, 3))::BIGINT % 512 + 1
                     AS width,
                   ('0x' || substr(md5(text), 4, 3))::BIGINT % 512 + 1
                     AS height,
                   CASE ('0x' || substr(md5(text), 7, 1))::BIGINT % 3
                     WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS channels
            FROM documents)"""))

  // -------------------------------------------------- 1b. WAV synth + parse

  /** Assemble a byte-exact 44-byte canonical WAV (RIFF) header: 'RIFF',
    * riffSize u32le, 'WAVE', 'fmt ', 16, PCM=1, channels u16le,
    * sampleRate u32le, byteRate u32le, blockAlign u16le, bits u16le,
    * 'data', dataSize u32le. */
  def synthWav(channels: Column, sampleRate: Column, bits: Column,
      nSamples: Column): Column = {
    val bytesPer = (channels * bits / lit(8)).cast("long")
    val dataSize = nSamples * bytesPer
    unhex(concat(
      lit("52494646"), le32hex(dataSize + 36), lit("57415645"),
      lit("666D7420"), le32hex(lit(16)), le16hex(lit(1)), le16hex(channels),
      le32hex(sampleRate), le32hex(sampleRate * bytesPer),
      le16hex(bytesPer), le16hex(bits), lit("64617461"), le32hex(dataSize)))
  }

  /** Parse a canonical WAV header from the blob (RIFF spec offsets);
    * duration from dataSize/byteRate, integer milliseconds. */
  def wavMeta(blob: Column): Column = struct(
    (hex(substring(blob, 1, 4)) === "52494646" &&
      hex(substring(blob, 9, 4)) === "57415645" &&
      hex(substring(blob, 37, 4)) === "64617461").as("riff_ok"),
    leDecode(blob, 23, 2).as("n_channels"),
    leDecode(blob, 25, 4).as("sample_rate"),
    leDecode(blob, 29, 4).as("byte_rate"),
    leDecode(blob, 35, 2).as("bits"),
    leDecode(blob, 41, 4).as("data_bytes"))

  /** One WAV per document (rate in {8000,16000,44100}, 1–2 channels, 8/16
    * bits, ≤100k samples — all md5-derived), parsed back from the bytes;
    * oracle recomputes the fields independently. */
  val wavHeader = QueryDef(
    "q_mm_wav_header",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val blobs = docs.select(col("doc_id"), docWavBlob(col("text")).as("blob"))
      blobs.select(col("doc_id"), wavMeta(col("blob")).as("m"))
        .select(col("doc_id"),
          col("m.riff_ok").cast("int").as("riff_ok"),
          col("m.n_channels").as("n_channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.bits").as("bits"),
          col("m.data_bytes").as("data_bytes"),
          expr("CAST(m.data_bytes * 1000 DIV m.byte_rate AS BIGINT)")
            .as("dur_ms"))
    },
    Some("""
      SELECT doc_id, 1 AS riff_ok, n_channels, sample_rate, bits,
             n_samples * n_channels * bits // 8 AS data_bytes,
             (n_samples * n_channels * bits // 8) * 1000
               // (sample_rate * n_channels * bits // 8) AS dur_ms
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(text), 9, 1))::BIGINT % 2 + 1
                     AS n_channels,
                   CASE ('0x' || substr(md5(text), 8, 1))::BIGINT % 3
                     WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END
                     AS sample_rate,
                   (('0x' || substr(md5(text), 10, 1))::BIGINT % 2 + 1) * 8
                     AS bits,
                   ('0x' || substr(md5(text), 11, 5))::BIGINT % 100000 + 1
                     AS n_samples
            FROM documents)"""))

  // ------------------------------------------------ 1a'. ViT-style patchify

  /** Patch-grid decomposition — the ViT preprocessing step: an image
    * becomes a grid of PxP patches, each reduced to its own feature
    * vector (here the integer byte sum / max — the stub for a linear
    * projection, which would be one more per-patch dot product). The
    * pixel explode carries (row, col) so patch assignment is pure
    * integer division; one groupBy (idCol, patch) aggregate, keyed
    * shuffles only — at 100 TB each image contributes exactly
    * width·height rows to one combine-friendly aggregate. */
  def patchify(blobs: DataFrame, idCol: String, blobCol: String,
      width: Int, height: Int, patch: Int, payloadOff: Int): DataFrame = {
    val perRow = width / patch
    val pxRow = (col("px_i") / width).cast("long")
    val pxCol = col("px_i") % width
    val samples = blobs
      .select(col(idCol), col(blobCol).as("px_blob"),
        explode(sequence(lit(0), lit(width * height - 1))).as("px_i"))
      .select(col(idCol),
        ((pxRow / patch).cast("long") * perRow +
          (pxCol / patch).cast("long")).as("px_patch"),
        conv(hex(expr(s"substring(px_blob, $payloadOff + px_i, 1)")),
          16, 10).cast("long").as("px_v"))
    samples.groupBy(col(idCol), col("px_patch"))
      .agg(sum(col("px_v")).as("p_sum"), max(col("px_v")).as("p_max"))
  }

  /** One 16×16 single-channel BMP per document (payload: the doc's md5
    * bytes tiled 16×), patchified into four 8×8 patches with integer
    * sum/max features parsed back from the blob bytes; the oracle
    * recomputes every patch from md5(text) directly. */
  val patchGrid = QueryDef(
    "q_mm_patchify",
    (spark, dir) => {
      // blob synth + patch parsing is per-row scan-fused work (guide §2.5)
      val docs = Tables.spread(spark, dir, "documents")
      val payload = unhex(repeat(md5(col("text").cast("binary")), 16))
      val blobs = docs.select(col("doc_id"),
        concat(synthBmp(lit(16L), lit(16L), lit(1L), lit(Array[Byte]())),
          payload).as("blob"))
      patchify(blobs, "doc_id", "blob", width = 16, height = 16,
        patch = 8, payloadOff = 55)
        .select(col("doc_id"), col("px_patch").as("patch"),
          col("p_sum"), col("p_max"))
    },
    Some("""
      SELECT doc_id,
             (i // 16 // 8) * 2 + (i % 16) // 8 AS patch,
             CAST(sum(b) AS BIGINT) AS p_sum,
             CAST(max(b) AS BIGINT) AS p_max
      FROM (
        SELECT doc_id, i,
               ('0x' || substr(md5(text), (i % 16) * 2 + 1, 2))::BIGINT AS b
        FROM (SELECT doc_id, text, unnest(range(256)) AS i FROM documents))
      GROUP BY doc_id, patch"""))

  // ----------------------------------------- 1b'. PCM frame energy / VAD

  /** Frame-level PCM energy + silence-span census over WAV blobs — the
    * voice-activity-detection shape ASR data curation runs to trim
    * silence and drop dead-air clips. `blobs` must carry (idCol, blob)
    * where blob is a 44-byte canonical WAV header + 8-bit unsigned PCM
    * payload. Every full `frameLen`-sample frame gets an integer energy
    * Σ(sample−128)²; frames under `silenceThresh` are silent; silent-run
    * lengths come from the per-doc gaps-and-islands window.
    *
    * Scale shape: ONE bounded explode (≤ payload bytes per row, here
    * capped at 128) → one (doc, frame) aggregate → one doc-partitioned
    * window — shuffle keyed on the doc id throughout, no global window,
    * no driver state. Returns (idCol, n_frames, n_silent, total_energy,
    * max_silent_run). */
  def audioFrameEnergy(blobs: DataFrame, idCol: String, blobCol: String,
      frameLen: Int = 8, silenceThresh: Long = 30000L): DataFrame = {
    val nSamp = (octet_length(col(blobCol)) - 44).cast("long")
    val fullSamples = (nSamp.cast("long") / frameLen).cast("long") * frameLen
    val samples = blobs
      // guard: Spark's sequence(0, -1) DESCENDS ([0,-1]) instead of
      // returning empty, so a payload shorter than one frame would emit
      // phantom sample rows that read header bytes — docs with zero full
      // frames drop out instead (matching the oracle's empty range())
      .filter(fullSamples > 0)
      .select(col(idCol), col(blobCol).as("au_blob"),
        explode(sequence(lit(0L), fullSamples - 1)).as("au_i"))
      .select(col(idCol), (col("au_i") / frameLen).cast("long").as("au_f"),
        (conv(hex(expr("substring(au_blob, 45 + CAST(au_i AS INT), 1)")),
          16, 10).cast("long") - 128).as("au_d"))
    val frames = samples.groupBy(col(idCol), col("au_f"))
      .agg(sum(col("au_d") * col("au_d")).as("au_energy"))
      .withColumn("au_silent", col("au_energy") < silenceThresh)
    val w = Window.partitionBy(col(idCol)).orderBy(col("au_f"))
    val runs = frames.filter(col("au_silent"))
      .withColumn("au_grp", col("au_f") - row_number().over(w))
      .groupBy(col(idCol), col("au_grp"))
      .agg(count(lit(1)).as("au_run"))
      .groupBy(col(idCol)).agg(max(col("au_run")).as("max_silent_run"))
    frames.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("au_silent"), 1L).otherwise(0L)).as("n_silent"),
        sum(col("au_energy")).as("total_energy"))
      .join(runs, Seq(idCol), "left")
      .withColumn("max_silent_run", coalesce(col("max_silent_run"), lit(0L)))
  }

  /** One WAV per document (8 kHz mono 8-bit header + the doc's first 128
    * text bytes as the PCM payload — synthetic audio, REAL byte parsing:
    * every sample is read back out of the blob at its RIFF data offset),
    * then the frame-energy/silence census. The oracle recomputes the
    * same frames from the raw text bytes. */
  val audioEnergy = QueryDef(
    "q_mm_audio_energy",
    (spark, dir) => {
      // WAV synth + frame-energy parse is per-row scan-fused (guide §2.5)
      val docs = Tables.spread(spark, dir, "documents")
      val payload = substring(col("text").cast("binary"), 1, 128)
      val blobs = docs.select(col("doc_id"),
        concat(
          synthWav(lit(1), lit(8000L), lit(8),
            least(col("n_chars"), lit(128L))),
          payload).as("blob"))
      audioFrameEnergy(blobs, "doc_id", "blob")
    },
    Some("""
      WITH s AS (
        SELECT doc_id, text,
               unnest(range((least(length(text), 128) // 8) * 8)) AS i
        FROM documents),
      b AS (
        SELECT doc_id, i // 8 AS f,
               ('0x' || hex(encode(substring(text, CAST(i + 1 AS INT), 1))))
                 ::BIGINT - 128 AS d
        FROM s),
      fe AS (
        SELECT doc_id, f, CAST(sum(d * d) AS BIGINT) AS energy,
               sum(d * d) < 30000 AS silent
        FROM b GROUP BY doc_id, f),
      isl AS (
        SELECT doc_id,
               f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM fe WHERE silent),
      runs AS (
        SELECT doc_id, CAST(max(run) AS BIGINT) AS max_silent_run
        FROM (SELECT doc_id, grp, count(*) AS run
              FROM isl GROUP BY doc_id, grp)
        GROUP BY doc_id)
      SELECT fe.doc_id, count(*) AS n_frames,
             CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT)
               AS n_silent,
             CAST(sum(energy) AS BIGINT) AS total_energy,
             coalesce(any_value(runs.max_silent_run), 0) AS max_silent_run
      FROM fe LEFT JOIN runs ON fe.doc_id = runs.doc_id
      GROUP BY fe.doc_id"""))

  // ------------------------------------- 1c. PNG-style chunk walk (var-offset)

  /** Parse an n-byte BIG-endian unsigned int (PNG chunk lengths are
    * network order, unlike BMP/WAV's little-endian). Offset may be a
    * computed Column — chunk walks have data-dependent positions. */
  def beDecode(blob: Column, off: Column, n: Int): Column =
    conv(hex(substring(blob, off, lit(n))), 16, 10).cast("long")

  /** PNG-style container: 8-byte signature then length-prefixed chunks
    * [len u32be | type 4cc | payload | crc u32be] ending in IEND. Unlike
    * the fixed-offset BMP/WAV headers, each chunk's position depends on
    * the previous chunk's LENGTH field — the parse must walk the file.
    * Synthesizes sig + IHDR(13) + DATA(variable, md5-derived) + IEND(0). */
  def synthPng(dataLen: Column, fillByte: Column): Column = {
    def be32(v: Column) = {
      val x = v.cast("long")
      concat(bhex(shiftright(x, 24)), bhex(shiftright(x, 16)),
        bhex(shiftright(x, 8)), bhex(x))
    }
    unhex(concat(
      lit("89504E470D0A1A0A"),                       // signature
      be32(lit(13)), lit("49484452"),                // IHDR, len 13
      lit("00" * 13), be32(lit(0)),                  // stub payload + crc
      be32(dataLen), lit("44415441"),                // DATA, variable len
      repeat(bhex(fillByte), dataLen.cast("int")),   // payload fill
      be32(lit(0)),                                  // crc stub
      be32(lit(0)), lit("49454E44"), be32(lit(0)))) // IEND
  }

  /** Walk the chunk list: chunk k's offset = prior offset + 12 + prior
    * length — every position except the first is computed from parsed
    * bytes. Returns struct(sig_ok, t1, l1, t2, l2, t3, l3, total_len). */
  def pngChunkWalk(blob: Column): Column = {
    val off1 = lit(9)
    val l1 = beDecode(blob, off1, 4)
    val t1 = substring(blob, 13, 4).cast("string")
    val off2 = (off1 + 12 + l1).cast("int")
    val l2 = beDecode(blob, off2, 4)
    val t2 = substring(blob, off2 + 4, lit(4)).cast("string")
    val off3 = (off2 + 12 + l2).cast("int")
    val l3 = beDecode(blob, off3, 4)
    val t3 = substring(blob, off3 + 4, lit(4)).cast("string")
    struct(
      (hex(substring(blob, 1, 8)) === "89504E470D0A1A0A").as("sig_ok"),
      t1.as("t1"), l1.as("l1"), t2.as("t2"), l2.as("l2"),
      t3.as("t3"), l3.as("l3"),
      (off3 + 12 - 1).cast("long").as("total_len"))
  }

  /** Little-endian decode at a COMPUTED 1-based offset (TIFF IFD walks
    * land at pointer-valued positions). */
  def leDecodeAt(blob: Column, off: Column, n: Int): Column = {
    val h = hex(substring(blob, off.cast("int"), lit(n)))
    val reordered = concat((0 until n).reverse.map(i =>
      substring(h, i * 2 + 1, 2)): _*)
    conv(reordered, 16, 10).cast("long")
  }

  /** TIFF-style pointer indirection: 'II' byte-order mark, magic 42, then
    * a u32le POINTER to the IFD, which sits after a variable-length filler
    * — the parse must dereference the pointer, read the entry count, and
    * walk fixed 12-byte tag entries [tag u16le | type u16le | count u32le
    * | value u32le]. A third container-structure kind beside the
    * fixed-offset headers (BMP/WAV) and the length-prefix walk (PNG). */
  def synthTiff(width: Column, height: Column, bits: Column,
      filler: Column): Column = {
    def entry(tag: Int, v: Column) =
      concat(le16hex(lit(tag)), le16hex(lit(3)), le32hex(lit(1)), le32hex(v))
    unhex(concat(
      lit("49492A00"),                        // 'II' + magic 42 u16le
      le32hex(filler + 8),                    // IFD pointer (0-based)
      repeat(lit("00"), filler.cast("int")),  // variable filler
      le16hex(lit(3)),                        // entry count
      entry(256, width), entry(257, height), entry(258, bits),
      le32hex(lit(0))))                       // next-IFD = none
  }

  /** Dereference the IFD pointer and pivot the walked entries by tag. */
  def tiffMeta(blob: Column): Column = {
    val off0 = leDecode(blob, 5, 4)           // 0-based pointer
    val base = (off0 + 1).cast("int")         // 1-based IFD position
    def entryAt(e: Int) = struct(
      leDecodeAt(blob, base + 2 + 12 * e, 2).as("tag"),
      leDecodeAt(blob, base + 2 + 12 * e + 8, 4).as("v"))
    val es = Seq(entryAt(0), entryAt(1), entryAt(2))
    def byTag(t: Int) = coalesce(
      es.map(e => when(e.getField("tag") === t, e.getField("v"))): _*)
    struct(
      (hex(substring(blob, 1, 2)) === "4949" &&
        leDecode(blob, 3, 2) === 42).as("ii_ok"),
      off0.as("ifd_off"),
      leDecodeAt(blob, base, 2).as("n_entries"),
      byTag(256).as("width"), byTag(257).as("height"),
      byTag(258).as("bits"))
  }

  /** One TIFF-style blob per document (dims and the filler length that
    * displaces the IFD all md5-derived), parsed back via the pointer
    * dereference; the oracle recomputes every field from md5 directly,
    * so a wrong pointer, entry stride, or tag pivot all mismatch. */
  val tiffIfd = QueryDef(
    "q_mm_tiff_ifd",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val blobs = docs.select(col("doc_id"), docTiffBlob(col("text")).as("blob"))
      blobs.select(col("doc_id"), tiffMeta(col("blob")).as("m"))
        .select(col("doc_id"),
          col("m.ii_ok").cast("int").as("ii_ok"),
          col("m.ifd_off").as("ifd_off"),
          col("m.n_entries").as("n_entries"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.bits").as("bits"))
    },
    Some("""
      SELECT doc_id, 1 AS ii_ok,
             ('0x' || substr(md5(text), 9, 1))::BIGINT % 16 + 8 AS ifd_off,
             CAST(3 AS BIGINT) AS n_entries,
             ('0x' || substr(md5(text), 1, 3))::BIGINT % 2048 + 1 AS width,
             ('0x' || substr(md5(text), 4, 3))::BIGINT % 2048 + 1 AS height,
             (('0x' || substr(md5(text), 7, 1))::BIGINT % 2 + 1) * 8 AS bits
      FROM documents"""))

  /** One PNG-style blob per document (DATA length 1–64 and fill byte both
    * md5-derived), then the chunk WALK parses types/lengths back out of
    * the bytes at data-dependent offsets; the oracle recomputes the
    * expected walk from md5 directly, and total_len doubles as a check
    * that the walk consumed exactly the synthesized byte count. */
  val pngChunks = QueryDef(
    "q_mm_png_chunks",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val blobs = docs.select(col("doc_id"), docPngBlob(col("text")).as("blob"))
      blobs.select(col("doc_id"), length(col("blob")).as("blob_len"),
          pngChunkWalk(col("blob")).as("m"))
        .select(col("doc_id"),
          col("m.sig_ok").cast("int").as("sig_ok"),
          col("m.t1").as("t1"), col("m.l1").as("l1"),
          col("m.t2").as("t2"), col("m.l2").as("l2"),
          col("m.t3").as("t3"), col("m.l3").as("l3"),
          (col("m.total_len") === col("blob_len").cast("long"))
            .cast("int").as("len_ok"))
    },
    Some("""
      SELECT doc_id, 1 AS sig_ok,
             'IHDR' AS t1, CAST(13 AS BIGINT) AS l1,
             'DATA' AS t2,
             ('0x' || substr(md5(text), 16, 2))::BIGINT % 64 + 1 AS l2,
             'IEND' AS t3, CAST(0 AS BIGINT) AS l3,
             1 AS len_ok
      FROM documents"""))

  // --------------------------------------- 1e. corrupt-container try-parse

  /** Classify a BMP payload before trusting its header: a real ingest
    * pipeline meets truncated downloads and mislabeled bytes, and a
    * fixed-offset read off a short blob must not fabricate metadata.
    * Returns 'truncated' (shorter than the 54-byte header), 'bad_magic'
    * (no 'BM'), else 'ok'. */
  def bmpStatus(blob: Column): Column =
    when(octet_length(blob) < 54, lit("truncated"))
      .when(hex(substring(blob, 1, 2)) =!= "424D", lit("bad_magic"))
      .otherwise(lit("ok"))

  /** WAV sibling of [[bmpStatus]]: 44-byte canonical header + the three
    * RIFF/WAVE/data magics. */
  def wavStatus(blob: Column): Column =
    when(octet_length(blob) < 44, lit("truncated"))
      .when(hex(substring(blob, 1, 4)) =!= "52494646" ||
        hex(substring(blob, 9, 4)) =!= "57415645" ||
        hex(substring(blob, 37, 4)) =!= "64617461", lit("bad_magic"))
      .otherwise(lit("ok"))

  /** Corrupt-container census: every third document's BMP+WAV blobs are
    * TRUNCATED below their header size (md5-derived cut), another third
    * get their first byte zeroed (dead magic), the rest stay intact — the
    * try-parse must route each to its status and only 'ok' rows may emit
    * parsed fields (the null path, surfaced as -1 for the comparator).
    * The corruption is real byte surgery on the assembled container; the
    * oracle predicts every row from md5 arithmetic alone, so a guard that
    * reads a header field off a short or mislabeled blob mismatches. */
  val corrupt = QueryDef(
    "q_mm_corrupt",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val t = col("text")
      val kind = mdInt(t, 13, 1) % 3
      val base = docs.select(col("doc_id"), kind.as("kind"),
        docBmpBlob(t).as("bmp0"), docWavBlob(t).as("wav0"),
        (mdInt(t, 14, 2) % 54).as("bmp_cut"),
        (mdInt(t, 16, 2) % 44).as("wav_cut"))
      val zero = unhex(lit("00"))
      val mangled = base.select(col("doc_id"),
        when(col("kind") === 0,
            expr("substring(bmp0, 1, CAST(bmp_cut AS INT))"))
          .when(col("kind") === 1,
            concat(zero, expr("substring(bmp0, 2, octet_length(bmp0))")))
          .otherwise(col("bmp0")).as("bmp"),
        when(col("kind") === 0,
            expr("substring(wav0, 1, CAST(wav_cut AS INT))"))
          .when(col("kind") === 1,
            concat(zero, expr("substring(wav0, 2, octet_length(wav0))")))
          .otherwise(col("wav0")).as("wav"))
      mangled.select(col("doc_id"),
        bmpStatus(col("bmp")).as("bmp_status"),
        wavStatus(col("wav")).as("wav_status"),
        when(bmpStatus(col("bmp")) === "ok", leDecode(col("bmp"), 19, 4))
          .otherwise(lit(-1L)).as("width"),
        when(wavStatus(col("wav")) === "ok", leDecode(col("wav"), 25, 4))
          .otherwise(lit(-1L)).as("sample_rate"))
    },
    Some("""
      SELECT doc_id,
             CASE kind WHEN 0 THEN 'truncated' WHEN 1 THEN 'bad_magic'
               ELSE 'ok' END AS bmp_status,
             CASE kind WHEN 0 THEN 'truncated' WHEN 1 THEN 'bad_magic'
               ELSE 'ok' END AS wav_status,
             CASE WHEN kind = 2 THEN width ELSE -1 END AS width,
             CASE WHEN kind = 2 THEN sample_rate ELSE -1 END AS sample_rate
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(text), 13, 1))::BIGINT % 3 AS kind,
                   ('0x' || substr(md5(text), 1, 3))::BIGINT % 512 + 1
                     AS width,
                   CASE ('0x' || substr(md5(text), 8, 1))::BIGINT % 3
                     WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END
                     AS sample_rate
            FROM documents)"""))

  // ------------------------------------------------------------ 2. blob dedup

  /** Library API: exact dedup over a binary column — ONE md5-fingerprint
    * hash aggregate keeping the lowest-id copy of every distinct blob
    * (min_by over the full row struct, no join-back). The binary twin of
    * [[Dedup]]'s exact text dedup; same single-shuffle 100 TB shape. */
  def dedupBlobs(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val cols = df.columns
    df.groupBy(md5(col(blobCol)).as("bd_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("bd_row"))
      .select(cols.map(c => col(s"bd_row.$c")): _*)
  }

  /** Quantized byte-histogram signature of the first `maxBytes` bytes of a
    * (doc_id, blob) frame: 16 buckets of byte>>4, counts quantized by
    * `quant`, joined into one signature string. Bounded per-row work
    * (≤ maxBytes exploded positions), one aggregate — a pure map-side
    * near-dup blocking key for binary payloads. */
  def blobHistogramSig(df: DataFrame, idCol: String, blobCol: String,
      maxBytes: Int = 256, quant: Int = 2): DataFrame = {
    // guard: an empty blob would make sequence(1, 0) DESCEND ([1,0])
    // and then map_from_entries die on a null bucket key — zero-byte
    // blobs have nothing to block on and produce no signature row
    df.filter(length(col(blobCol)) > 0)
      .select(col(idCol), explode(
        sequence(lit(1), least(length(col(blobCol)), lit(maxBytes))))
        .as("bh_i"), col(blobCol))
      .select(col(idCol),
        (conv(hex(substring(col(blobCol), col("bh_i"), lit(1))), 16, 10)
          .cast("long") / lit(16)).cast("long").as("bh_bucket"))
      .groupBy(col(idCol), col("bh_bucket"))
      .agg(count(lit(1)).as("bh_n"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("bh_bucket"), col("bh_n")))).as("bh_m"))
      .select(col(idCol), concat_ws(",",
        transform(sequence(lit(0L), lit(15L)), b =>
          (coalesce(element_at(col("bh_m"), b), lit(0L)) / lit(quant))
            .cast("long")
        )).as("bh_sig"))
  }

  /** Blob dedup over the corpus, treating the first 64 bytes of each
    * document as the binary payload (the fixture's near-dups share long
    * prefixes, so real duplicate blobs exist): exact fingerprint census +
    * the kept-id checksum of [[dedupBlobs]]. */
  val blobDedup = QueryDef(
    "q_mm_blob_dedup",
    (spark, dir) => {
      val blobs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          substring(col("text").cast("binary"), 1, 64).as("blob"))
      dedupBlobs(blobs, "doc_id", "blob")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_uniq_blobs"),
          sum(col("doc_id")).as("keeper_id_sum"))
    },
    Some("""
      SELECT source, count(*) AS n_uniq_blobs,
             CAST(sum(keeper) AS BIGINT) AS keeper_id_sum
      FROM (SELECT min_by(source, doc_id) AS source, min(doc_id) AS keeper
            FROM documents GROUP BY md5(substring(text, 1, 64)))
      GROUP BY source"""))

  /** Byte-histogram near-dup blocking: signature collisions → candidate
    * pairs → confirmed by exact 64-byte-prefix identity. Census output:
    * distinct signatures, candidate pairs, confirmed near-dup pairs. */
  val blobNearDup = QueryDef(
    "q_mm_blob_histo_neardup",
    (spark, dir) => {
      // 256-bucket byte histogram per blob is scan-fused (guide §2.5)
      val blobs = Tables.spread(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      val sigs = blobHistogramSig(blobs, "doc_id", "blob")
        .join(blobs, "doc_id")
        .select(col("doc_id"), col("bh_sig"),
          md5(substring(col("blob"), 1, 64)).as("pfx_fp"))
      val a = sigs.select(col("bh_sig"), col("doc_id").as("id_a"),
        col("pfx_fp").as("fp_a"))
      val b = sigs.select(col("bh_sig"), col("doc_id").as("id_b"),
        col("pfx_fp").as("fp_b"))
      val pairs = a.join(b, "bh_sig").filter(col("id_a") < col("id_b"))
      pairs.agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("fp_a") === col("fp_b"), 1L).otherwise(0L))
          .as("n_confirmed"),
        countDistinct(col("bh_sig")).as("n_colliding_sigs"))
    },
    Some("""
      WITH e AS (
        SELECT doc_id,
               unnest(range(1, least(length(text), 256)::BIGINT + 1)) AS i,
               text
        FROM documents),
      v AS (
        SELECT doc_id,
               ('0x' || hex(encode(substring(text, CAST(i AS INT), 1))))::INT
                 // 16 AS bucket
        FROM e),
      c AS (SELECT doc_id, bucket, count(*) AS n FROM v GROUP BY 1, 2),
      grid AS (
        SELECT doc_id, k
        FROM (SELECT DISTINCT doc_id FROM documents), unnest(range(16)) AS u(k)),
      s AS (
        SELECT g.doc_id,
               string_agg(CAST(coalesce(c.n, 0) // 2 AS VARCHAR), ','
                          ORDER BY g.k) AS sig,
               any_value(md5(substring(d.text, 1, 64))) AS pfx_fp
        FROM grid g
        JOIN documents d ON g.doc_id = d.doc_id
        LEFT JOIN c ON g.doc_id = c.doc_id AND g.k = c.bucket
        GROUP BY g.doc_id),
      p AS (
        SELECT a.sig, a.pfx_fp AS fp_a, b.pfx_fp AS fp_b
        FROM s a JOIN s b ON a.sig = b.sig AND a.doc_id < b.doc_id)
      SELECT count(*) AS n_candidate_pairs,
             CAST(sum(CASE WHEN fp_a = fp_b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_confirmed,
             count(DISTINCT sig) AS n_colliding_sigs
      FROM p"""))

  // ------------------------------------- 3. interleaved sequence assembly

  /** Library API: MMC4-style interleaved text+image packing. `items` must
    * carry (partCol, orderCols…, tokens); each partition's items are
    * packed greedily in the pinned order into windows of `windowTokens`
    * via the running-sum shape — ONE window function per partition key,
    * never a global sort. Returns items + seq_id. */
  def interleavePack(items: DataFrame, partCol: String,
      orderCols: Seq[String], tokensCol: String,
      windowTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    items.withColumn("mm_cum", sum(col(tokensCol)).over(w))
      .withColumn("seq_id",
        ((col("mm_cum") - 1) / lit(windowTokens)).cast("long"))
      .drop("mm_cum")
  }

  /** Interleaved text+image assembly over the corpus: every document is a
    * text chunk (whitespace token count); every fourth document (md5
    * nibble) carries an image placeholder costing 64 tokens immediately
    * after its text. Packed per language into 2048-token windows in
    * content-hash order; per-window census (items, images, texts, tokens)
    * is the pinned output. */
  val interleave = QueryDef(
    "q_mm_interleave",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val base = docs.select(col("lang"), col("doc_id"),
        md5(col("text").cast("binary")).as("h"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          + 1).cast("long").as("n_toks"))
      val txt = base.select(col("lang"), col("h"), col("doc_id"),
        lit(0).as("pos"), lit("txt").as("kind"), col("n_toks").as("toks"))
      val img = base
        .filter(conv(substring(col("h"), 12, 1), 16, 10).cast("long") % 4 === 0)
        .select(col("lang"), col("h"), col("doc_id"),
          lit(1).as("pos"), lit("img").as("kind"), lit(64L).as("toks"))
      val items = txt.unionAll(img)
      interleavePack(items, "lang", Seq("h", "doc_id", "pos"), "toks", 2048)
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("kind") === "img", 1L).otherwise(0L)).as("n_imgs"),
          sum(when(col("kind") === "txt", 1L).otherwise(0L)).as("n_txts"),
          sum(col("toks")).as("seq_tokens"))
    },
    Some("""
      WITH base AS (
        SELECT lang, doc_id, md5(text) AS h,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_toks
        FROM documents),
      items AS (
        SELECT lang, h, doc_id, 0 AS pos, 'txt' AS kind, n_toks AS toks
        FROM base
        UNION ALL
        SELECT lang, h, doc_id, 1 AS pos, 'img' AS kind, CAST(64 AS BIGINT)
        FROM base
        WHERE ('0x' || substr(h, 12, 1))::BIGINT % 4 = 0),
      packed AS (
        SELECT lang, kind, toks,
               CAST(floor((sum(toks) OVER (PARTITION BY lang
                      ORDER BY h, doc_id, pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                    / 2048) AS BIGINT) AS seq_id
        FROM items)
      SELECT lang, seq_id, count(*) AS n_items,
             CAST(sum(CASE WHEN kind = 'img' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imgs,
             CAST(sum(CASE WHEN kind = 'txt' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_txts,
             CAST(sum(toks) AS BIGINT) AS seq_tokens
      FROM packed GROUP BY lang, seq_id"""))

  // ------------------------------------ 4. caption↔embedding joint retrieval

  /** Caption→embedding joint retrieval: zh-language captions (doc_id<250)
    * as queries, every other document's embedding as candidates; cosine
    * top-3 per caption through the custom CosineTopKJoin plan, with the
    * retrieved document's source + length joined back on — the
    * text-metadata ↔ vector join both ways. */
  val captionRetrieval = QueryDef(
    "q_mm_caption_retrieval",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val embs = Tables(spark, dir, "embeddings")
      val qs = docs.filter(col("lang") === "zh" && col("doc_id") < 250)
        .join(embs, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("query_id"), col("embedding").as("eq"))
      val cs = docs.filter(!(col("lang") === "zh" && col("doc_id") < 250))
        .join(embs, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("cand_id"), col("embedding").as("ec"))
      graft.ops.cosineTopK(qs, cs, 3)
        .join(docs.select(col("doc_id").as("cand_id"),
          col("source").as("cand_source"),
          col("n_chars").as("cand_chars")), "cand_id")
        .select(col("query_id"), col("cand_id"), col("cos"),
          col("rn").cast("long").as("rn"), col("cand_source"),
          col("cand_chars"))
    },
    Some(s"""
      WITH q AS (
        SELECT d.doc_id AS query_id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.lang = 'zh' AND d.doc_id < 250),
      c AS (
        SELECT d.doc_id AS cand_id, d.source, d.n_chars, e.embedding AS emb
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE NOT (d.lang = 'zh' AND d.doc_id < 250)),
      scored AS (
        SELECT q.query_id, c.cand_id,
               ${Dedup.duckCosine("q.emb", "c.emb")} AS cos,
               c.source AS cand_source, c.n_chars AS cand_chars
        FROM q, c),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
        FROM scored)
      SELECT query_id, cand_id, cos, rn, cand_source, cand_chars
      FROM ranked WHERE rn <= 3"""))

  // --------------------------------------------------- legacy decode stubs

  /** binary payload + metadata struct → stubbed per-partition decode →
    * typed features. The oracle checks the length-derived features + md5;
    * the byte-sum feature is asserted in the ScalaTest spec (DuckDB can't
    * fold over blob bytes). */
  val pipeline = QueryDef(
    "q_multimodal_pipeline",
    (spark, dir) => {
      import spark.implicits._
      val blobs = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          col("text").cast("binary").as("blob"),
          struct(
            length(col("text").cast("binary")).cast("long").as("n_bytes"),
            col("source").as("container"),
            md5(col("text").cast("binary")).as("fp")).as("meta"))
      val decoded = blobs
        .select(col("doc_id"), col("blob"), col("meta.fp").as("fp"))
        .as[(Long, Array[Byte], String)]
        .mapPartitions { it =>
          it.map { case (id, blob, fp) =>
            // STUB decode: a real pipeline calls the image/audio codec here,
            // once per batch. Deterministic byte arithmetic stands in.
            var s = 0L
            var i = 0
            while (i < blob.length) { s += (blob(i) & 0xff); i += 1 }
            MMFeature(
              doc_id = id,
              n_bytes = blob.length.toLong,
              n_frames = blob.length.toLong / 256L,
              feat0 = blob.length.toLong % 251L,
              byte_sum = s,
              fp = fp)
          }
        }
      decoded.toDF().drop("byte_sum")
    },
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(octet_length(encode(text)) // 256 AS BIGINT) AS n_frames,
             CAST(octet_length(encode(text)) % 251 AS BIGINT) AS feat0,
             md5(text) AS fp
      FROM documents"""))

  /** Frame-sampling plumbing: substr windows over the binary payload →
    * per-frame fingerprints (every 4th 64-byte frame, up to 3 frames/doc). */
  val frameSample = QueryDef(
    "q_multimodal_frames",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(2)), k =>
            substring(col("blob"), k * 256 + 1, lit(64)))).as(Seq("frame_id", "frame")))
        .filter(length(col("frame")) === 64)
        .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
          md5(col("frame")).as("frame_fp"))
    },
    Some("""
      SELECT doc_id, frame_id, md5(frame) AS frame_fp
      FROM (SELECT doc_id,
                   unnest(range(3)) AS frame_id,
                   unnest(list_transform(range(3),
                     k -> substring(text, k * 256 + 1, 64))) AS frame
            FROM documents)
      WHERE length(frame) = 64"""))

  val all: Seq[QueryDef] = Seq(pipeline, frameSample, bmpHeader, wavHeader,
    pngChunks, tiffIfd, audioEnergy, patchGrid, blobDedup, blobNearDup,
    interleave, captionRetrieval, corrupt)
}
