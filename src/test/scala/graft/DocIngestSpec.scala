package graft

import graft.streaming.DocIngest
import graft.streaming.DocIngest.{DocIn, DupMatch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup-on-ingest (streaming/DocIngest.scala) must agree with the
  * batch LSH it mirrors: same signatures, same banding, same candidate set,
  * same estimates — fed incrementally across microbatches with state carrying
  * the admitted corpus between them. */
class DocIngestSpec extends GraftSpecBase {
  private val sp = TestSpark.spark
  import sp.implicits._

  private def fixtureDocs: Seq[DocIn] =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => DocIn(r.getLong(0), r.getString(1))).toSeq.sortBy(_.doc_id)

  test("scala signature replays the SQL arithmetic minhash exactly") {
    val want = operators.Dedup.minhashArithSigs(
      Tables(spark, sfDir, "documents"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val docs = fixtureDocs
    var checked = 0
    for (d <- docs) {
      val sig = DocIngest.signature(d.text)
      if (sig == null) assert(!want.contains(d.doc_id))
      else { assert(want(d.doc_id) == sig.toSeq, s"doc ${d.doc_id}"); checked += 1 }
    }
    assert(checked > 100, s"only $checked docs had signatures")
  }

  test("streaming ingest across 3 microbatches equals the batch LSH") {
    val docs = fixtureDocs
    val in = MemoryStream[DocIn](sp)
    val q = EventStreamsTestSink.start(
      DocIngest.nearDupMatches(in.toDS()).toDF(), "ingest_matches")
    try {
      val third = (docs.size + 2) / 3
      docs.grouped(third).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      val got = sp.table("ingest_matches").as[DupMatch].collect()
        .map(m => (m.doc_a, m.doc_b) -> m.est_jaccard).toMap
      val want = operators.Dedup.minHashNearDupArith(
        Tables(spark, sfDir, "documents"), "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == want.keySet,
        s"streaming-only: ${got.keySet -- want.keySet}; " +
          s"batch-only: ${want.keySet -- got.keySet}")
      got.foreach { case (k, est) => assert(est == want(k), s"pair $k") }
      assert(want.nonEmpty, "fixture must contain near-dups")
    } finally q.stop()
  }

  test("replayed doc_ids do not re-enter bucket state or re-emit") {
    val docs = fixtureDocs.take(60)
    val in = MemoryStream[DocIn](sp)
    val q = EventStreamsTestSink.start(
      DocIngest.nearDupMatches(in.toDS()).toDF(), "ingest_replay")
    try {
      in.addData(docs)
      q.processAllAvailable()
      val first = sp.table("ingest_replay").count()
      in.addData(docs) // exact replay: all ids already admitted
      q.processAllAvailable()
      assert(sp.table("ingest_replay").count() == first)
    } finally q.stop()
  }
}

/** Memory-sink starter shared by streaming specs that aren't in
  * StreamingSpec's file. */
object EventStreamsTestSink {
  def start(df: org.apache.spark.sql.DataFrame, name: String) =
    df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
}
