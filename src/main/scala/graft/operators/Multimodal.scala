package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** One decoded multimodal record after the (stubbed) decode stage. */
final case class MMFeature(
    doc_id: Long,
    n_bytes: Long,
    n_frames: Long,
    feat0: Long,
    byte_sum: Long,
    fp: String)

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (arithmetic over the raw bytes); the
  * Spark-side plumbing is real: binary columns, a metadata struct, a typed
  * `Dataset[MMFeature]` produced by `mapPartitions` (the Scala analogue of a
  * `mapInPandas` batch UDF — one iterator per partition, no per-row
  * serialization churn), and partition-parallel execution. On a real cluster
  * the stub body is where an image/audio library call would go, batched per
  * partition.
  *
  * Reference has no multimodal support at all — BinaryType is
  * columnar-unsupported (ConverterUtils.scala:494-508).
  */
object Multimodal {

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

  val all: Seq[QueryDef] = Seq(pipeline, frameSample)
}
