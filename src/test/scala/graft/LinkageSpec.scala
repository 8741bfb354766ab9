package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the fuzzy record-linkage family and the robust
  * outlier census — the invariants the DuckDB oracle replay can't state
  * (blocking soundness, tie-break direction, MAD's resistance to the
  * contamination that shifts a mean). */
class LinkageSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  test("fuzzyJoin: exact <=maxDist pair set, prefix edits included") {
    val clean = Seq("green widget", "great widget", "blue bolt")
      .toDF("clean_name")
    val dirty = Seq((1L, "green widgt"), (2L, "blu bolt"), (3L, "zzz"))
      .toDF("dirty_id", "dirty_name")
    val m = ops.fuzzyJoin(dirty, clean, "dirty_name", "clean_name")
      .select("dirty_id", "clean_name", "dist")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet
    // segment blocking has 100% recall for ANY <=2-edit pattern, so the
    // output is EXACTLY the <=2-edit pair set: "green widgt" is 1 edit
    // from "green widget" (3 from "great widget" -> filtered), and the
    // PREFIX deletion "blu bolt" ~ "blue bolt" — the case single-prefix
    // blocking was blind to — is recovered at distance 1.
    assert(m == Set((1L, "green widget", 1), (2L, "blue bolt", 1)),
      m.toString)
    // "zzz" is >2 edits from everything -> no candidate survives
    assert(!m.exists(_._1 == 3L), m.toString)
  }

  test("fuzzyJoin: recall holds for substitutions, insertions, and mixes") {
    // the registry corruption model is deletion-only; the pigeonhole
    // recall argument covers ANY edit pattern — pin it on all three edit
    // kinds plus a two-edit mix, at several positions incl. the prefix
    val clean = Seq("industrial strength widget").toDF("clean_name")
    val dirty = Seq(
      (1L, "Xndustrial strength widget"),  // substitution at pos 1
      (2L, "industrial strenXth widget"),  // substitution mid
      (3L, "inndustrial strength widget"), // insertion in prefix
      (4L, "industrial strength widgets"), // insertion at end
      (5L, "indstrial strength widge"),    // deletion + deletion (2 edits)
      (6L, "Xndustrial strength widgeX"))  // substitution both ends
      .toDF("dirty_id", "dirty_name")
    val got = ops.fuzzyJoin(dirty, clean, "dirty_name", "clean_name")
      .select("dirty_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L, 6L), got.toString)
    // maxDist=1 drops the two-edit variants, keeps the one-edit ones
    val tight = ops.fuzzyJoin(dirty, clean, "dirty_name", "clean_name",
      maxDist = 1).select("dirty_id").collect().map(_.getLong(0)).toSet
    assert(tight == Set(1L, 2L, 3L, 4L), tight.toString)
  }

  test("bestMatch: argmin(dist, name) with ambiguity count") {
    val clean = Seq("card alpha", "card alphb", "card gamma")
      .toDF("clean_name")
    val dirty = Seq((7L, "card alph")).toDF("dirty_id", "dirty_name")
    val best = ops.bestMatch(
      ops.fuzzyJoin(dirty, clean, "dirty_name", "clean_name"),
      "dirty_id", "clean_name")
      .select("dirty_id", "clean_name", "dist", "n_cands")
      .collect()
    assert(best.length == 1)
    val r = best.head
    // both "card alpha"/"card alphb" are 1 edit away; tie breaks on name
    assert(r.getString(1) == "card alpha", r.toString)
    assert(r.getInt(2) == 1)
    assert(r.getLong(3) == 2L, s"ambiguity count ${r.getLong(3)}")
  }

  test("fixture corruption: recall is 100% by construction") {
    // every corrupted part name must retain its true name as a candidate
    // at distance 1 (deletion at pos >= 5 preserves the 4-char block key)
    val cands = SparkEntry.queries("q_link_fuzzy_match")(sp, sfDir)
    val parts = Tables(sp, sfDir, "part")
      .select(col("p_partkey").as("dirty_id"),
        col("p_name").as("true_name"))
    val hit = cands.join(parts, Seq("dirty_id"))
      .filter(col("clean_name") === col("true_name") && col("dist") === 1)
    assert(hit.select("dirty_id").distinct().count() == parts.count())
  }

  test("madOutlierCensus: one fat tail can't move the median cut") {
    // 9 tight values + 1 wild one per key: mean/stddev would absorb the
    // spike (z < 2 for contaminated stddev); the median/MAD cut flags
    // exactly the spike. Odd counts keep medians integral (x2 even).
    val tight = (1 to 9).map(i => ("a", 100L + (i % 3))) :+ (("a", 9000L))
    val df = tight.toDF("k", "v")
    val r = ops.madOutlierCensus(df, "k", "v").collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("med_x2") == 202L, r.toString) // median 101
    assert(r.getAs[Long]("n_outliers") == 1L, r.toString)
    // constant series: MAD = 0 -> nothing can exceed 3*MAD=0 unless it
    // deviates at all; all-equal input flags zero outliers
    val const = (1 to 8).map(_ => ("c", 5L)).toDF("k", "v")
    val rc = ops.madOutlierCensus(const, "k", "v").collect().head
    assert(rc.getAs[Long]("n_outliers") == 0L, rc.toString)
  }

  test("labelPropagate: frozen labels, min tie-break, round-bounded reach") {
    // path graph 1-2-3-4-5 with seed labels at both ends: 1->label 9,
    // 5->label 2. One round reaches {2,4}; two rounds reach 3, which
    // hears BOTH fronts (via 2: label 9, via 4: label 2) -> min wins = 2.
    // Seeds never change despite each other's propagation pressure.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 9L), (5L, 2L)).toDF("node", "label")
    val r1 = ops.labelPropagate(edges, "src", "dst", seeds, "node",
      "label", rounds = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 == Map(1L -> 9L, 5L -> 2L, 2L -> 9L, 4L -> 2L), r1.toString)
    val r2 = ops.labelPropagate(edges, "src", "dst", seeds, "node",
      "label", rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2(3L) == 2L, r2.toString)       // min(9, 2) = 2
    assert(r2(2L) == 9L && r2(4L) == 2L)    // frozen from round 1
    assert(r2(1L) == 9L && r2(5L) == 2L)    // seeds immutable
  }
}
