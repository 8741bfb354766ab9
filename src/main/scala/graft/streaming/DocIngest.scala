package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection at INGEST time — the shape a 100 TB
  * corpus actually grows by: documents arrive continuously, and each arrival
  * must be flagged against everything already admitted WITHOUT re-running a
  * batch LSH over the whole corpus.
  *
  * Same math as the batch path ([[Dedup.minHashNearDupArith]]): md5-derived
  * 28-bit base hash, 32 fixed affine permutations mod 2^31−1, 8 bands × 4
  * rows. The banding IS the state partitioning — `groupByKey(bucket)` routes
  * each arrival to the ≤8 band buckets it can collide in, and
  * `flatMapGroupsWithState` keeps per-bucket member signatures, so an
  * arrival compares only against its bucket's members (the same O(n·bands)
  * candidate bound as the batch join; never corpus-squared). DocIngestSpec
  * pins streaming-equals-batch on the fixture corpus.
  *
  * State per bucket is the member list; LSH spreads a healthy corpus thin
  * (bucket size ≈ collision group size), and `maxBucketMembers` hard-caps a
  * degenerate hot bucket (e.g. a boilerplate-flooded crawl) — beyond the cap
  * new members are compared but not retained, trading recall inside that one
  * bucket for bounded state, the same admission discipline the batch
  * pipeline gets by exact-dedup-first. Production note: pair this with a
  * state TTL (timeout on last bucket activity) when dedup only needs a
  * rolling horizon; the fixture spec keeps NoTimeout for exact batch parity.
  */
object DocIngest {

  case class DocIn(doc_id: Long, text: String)
  case class Banded(bucket: String, doc_id: Long, sig: Seq[Long])
  case class Member(doc_id: Long, sig: Seq[Long])
  case class BucketMembers(ms: List[Member])
  case class DupMatch(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Scala replay of the SQL signature chain in [[Dedup.minHashNearDupArith]]
    * (distinct word 3-grams → first 7 md5 hex chars as a 28-bit int →
    * 32 affine mins). Returns null for docs with fewer than 3 tokens —
    * exactly the rows the batch groupBy never produces a signature for. */
  def signature(text: String): Array[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(Dedup.numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      if (seen.add(g)) {
        val hex = md.digest(g.getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString.substring(0, 7)
        val h = java.lang.Long.parseLong(hex, 16)
        var k = 0
        while (k < Dedup.numHashes) {
          val (a, b) = Dedup.arithCoeffs(k)
          val v = (a * h + b) % Dedup.arithP
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    mins
  }

  /** The ingest stream: doc arrivals → per-band bucket routing → stateful
    * within-bucket comparison. Emits one [[DupMatch]] per (band, pair)
    * collision at or above `threshold`; downstream consumers (and the spec)
    * de-duplicate pairs found by several bands with a `distinct`, exactly
    * as the batch path's dropDuplicates does. */
  def nearDupMatches(
      docs: Dataset[DocIn],
      threshold: Double = 0.25,
      maxBucketMembers: Int = 1024): Dataset[DupMatch] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { d =>
      val sig = signature(d.text)
      if (sig == null) Iterator.empty
      else (0 until Dedup.numBands).iterator.map { b =>
        val key = (0 until Dedup.rowsPerBand)
          .map(j => sig(b * Dedup.rowsPerBand + j)).mkString(":")
        Banded(s"$b|$key", d.doc_id, sig.toSeq)
      }
    }
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketMembers, DupMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[BucketMembers]) =>
          var members = state.getOption.map(_.ms).getOrElse(Nil)
          val known = scala.collection.mutable.Set(members.map(_.doc_id): _*)
          val out = List.newBuilder[DupMatch]
          // id-ordered processing makes replays and intra-batch order
          // deterministic: a pair is always reported as (smaller, larger)
          for (r <- rows.toSeq.sortBy(_.doc_id) if known.add(r.doc_id)) {
            for (m <- members) {
              var eq = 0
              var k = 0
              while (k < Dedup.numHashes) {
                if (m.sig(k) == r.sig(k)) eq += 1
                k += 1
              }
              val est = eq.toDouble / Dedup.numHashes
              if (est >= threshold)
                out += DupMatch(math.min(m.doc_id, r.doc_id),
                  math.max(m.doc_id, r.doc_id), est)
            }
            if (members.size < maxBucketMembers)
              members = Member(r.doc_id, r.sig) :: members
          }
          state.update(BucketMembers(members))
          out.result().iterator
      }
  }
}
