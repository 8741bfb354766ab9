package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the tokenizer-fitting stage of a
  * training-data pipeline (no reference counterpart; the reference's unit
  * is relational batches).
  *
  * The scale design is the point: byte-pair-encoding trains on the WORD
  * FREQUENCY table, not the corpus. The only distributed pass is one
  * word-count aggregation (map-side combined, one shuffle of the bounded
  * vocabulary); the merge loop then runs over that compact `(word, freq)`
  * table on the driver — at 100 TB the corpus never moves again, and the
  * collected table is capped by `maxVocab` (most-frequent words carry
  * virtually all pair mass). This mirrors how production tokenizer
  * trainers consume corpora (pre-tokenize → word counts → merge loop).
  *
  * Determinism: merges pick the (count DESC, pair ASC) argmax, so the
  * learned rules are a pure function of the word counts — stable across
  * runs, partitionings, and engines. BpeSpec pins the classic
  * low/lower/newest fixture merges and the encode round-trip.
  */
object Bpe {

  /** One learned merge: the adjacent symbol pair and its fused form. */
  final case class Merge(left: String, right: String) {
    def fused: String = left + right
  }

  /** The distributed pass: lowercase whitespace words → (word, freq),
    * capped to the `maxVocab` most frequent (ties broken by word so the
    * training set is deterministic). */
  def wordCounts(docs: DataFrame, textCol: String,
      maxVocab: Int = 50000): Array[(String, Long)] =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

  /** Driver-side merge loop over the word-frequency table (standard BPE:
    * Sennrich et al. 2016). Words are symbol sequences starting as
    * characters with an end-of-word marker on the last symbol; each round
    * fuses the highest-mass adjacent pair. */
  def trainOnCounts(counts: Array[(String, Long)],
      nMerges: Int): Seq[Merge] = {
    // each word as a mutable symbol buffer; frequencies fixed
    val words = counts.map { case (w, n) =>
      val syms = mutable.ArrayBuffer[String](w.map(_.toString): _*)
      if (syms.nonEmpty) syms(syms.length - 1) = syms.last + "</w>"
      (syms, n)
    }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count DESC, then pair ASC
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += Merge(best._1, best._2)
        val fused = best._1 + best._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = fused
              syms.remove(i + 1)
            } else i += 1
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** One distributed pass + the driver merge loop. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 50000): Seq[Merge] =
    trainOnCounts(wordCounts(docs, textCol, maxVocab), nMerges)

  /** Encode one word with learned merges, applied in training order (the
    * standard priority rule). Pure function — usable anywhere. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.map(_.toString).toVector
    syms = syms.updated(syms.length - 1, syms.last + "</w>")
    merges.foreach { m =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == m.left && syms(i + 1) == m.right) {
          out += m.fused
          i += 2
        } else {
          out += syms(i)
          i += 1
        }
      }
      syms = out.result()
    }
    syms
  }

  /** Distributed encode: appends `tokensCol` (array of BPE symbols) and
    * `n_bpe_tokens`. The merge table rides a BROADCAST (tiny — one row per
    * merge), the encode itself is a partition-local map — no shuffle. */
  def encoded(docs: DataFrame, textCol: String, merges: Seq[Merge],
      tokensCol: String = "bpe_tokens"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(merges)
    val enc = udf { text: String =>
      if (text == null) Array.empty[String]
      // Locale.ROOT: match Spark's locale-independent lower() used by
      // wordCounts — default-locale toLowerCase diverges under tr_TR
      else text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).flatMap(w => encodeWord(w, bc.value))
    }
    docs.withColumn(tokensCol, enc(col(textCol)))
      .withColumn("n_bpe_tokens", size(col(tokensCol)).cast("long"))
  }
}
