package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Invariants for the sampling/ordering operators (operators/Sampling.scala)
  * that the DuckDB gate can't express directly: quotaSelect's bucketed
  * selection must equal the window formulation row-for-row, and the epoch
  * shuffle must be a partition (every doc in exactly one shard). */
class SamplingSpec extends GraftSpecBase {
  private val sp = TestSpark.spark
  import sp.implicits._

  private def docs = Tables(spark, sfDir, "documents")

  test("quotaSelect equals the window formulation for mixed budgets") {
    // budgets deliberately hit all regimes: 0 (drop group), tiny (boundary
    // bucket is the FIRST bucket), mid, and > group size (keep everything)
    val counts = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = counts.keys.toSeq.sorted
    val budgetOf = langs.zipWithIndex.map { case (l, i) =>
      l -> (i match {
        case 0 => 0L
        case 1 => 1L
        case 2 => 7L
        case 3 => counts(l) / 2
        case _ => counts(l) + 100
      })
    }.toMap
    val budgets = budgetOf.toSeq.toDF("lang", "budget")
    val got = operators.Sampling.quotaSelect(docs, "lang", "text", "doc_id", budgets)
      .select($"lang", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy($"lang")
      .orderBy(md5($"text".cast("binary")), $"doc_id")
    val want = docs.withColumn("rn", row_number().over(w))
      .join(broadcast(budgets), "lang")
      .filter($"rn" <= $"budget")
      .select($"lang", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    // exact quota: each group yields min(budget, group size) rows
    val perLang = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for (l <- langs) {
      val expect = math.min(budgetOf(l), counts(l))
      assert(perLang.getOrElse(l, 0L) == expect,
        s"lang $l: got ${perLang.getOrElse(l, 0L)}, want $expect")
    }
  }

  test("tokenQuotaSelect equals the global running-sum window formulation") {
    // the bucket census + boundary-window path must select EXACTLY the
    // maximal (md5, id)-order prefix whose token sum fits each budget —
    // proven against the whole-group running-sum window brute force
    val toked = docs.withColumn("n_toks",
      (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
        .cast("long"))
    val totals = toked.groupBy($"lang").agg(sum($"n_toks").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = totals.keys.toSeq.sorted
    val budgets = langs.zipWithIndex.map { case (l, i) =>
      (l, i match {
        case 0 => 0L                  // drop group
        case 1 => 5L                  // boundary in the first bucket
        case 2 => totals(l) / 3
        case 3 => totals(l) / 2
        case _ => totals(l) + 100     // keep everything
      })
    }.toDF("lang", "budget")
    val got = operators.Sampling
      .tokenQuotaSelect(toked, "lang", "text", "doc_id", "n_toks", budgets)
      .select($"lang", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy($"lang")
      .orderBy(md5($"text".cast("binary")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = toked.withColumn("rcum", sum($"n_toks").over(w))
      .join(broadcast(budgets), "lang")
      .filter($"rcum" <= $"budget")
      .select($"lang", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    // budget is a hard cap and the prefix is maximal: per group, kept
    // tokens <= budget and the next doc in order would overflow it
    val kept = operators.Sampling
      .tokenQuotaSelect(toked, "lang", "text", "doc_id", "n_toks", budgets)
      .groupBy($"lang").agg(sum($"n_toks").as("k"))
      .join(budgets, "lang").collect()
    kept.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"${r.getString(0)}: kept ${r.getLong(1)} > budget ${r.getLong(2)}")
    }
  }

  test("quotaSelect stays correct for a high-cardinality group column") {
    // The census join carries no broadcast() hint (round-10 de-hint,
    // Sampling.scala): with a low-|G| group AQE broadcasts the ≤|G|·256-row
    // census on size alone, and with a HIGH-cardinality group (here: one
    // group per document bucket, |G| ≈ corpus/3) the same code degrades to
    // a shuffle join on (group, bucket) instead of OOMing the driver on a
    // |G|·256-row broadcast. This pin proves the high-|G| path is still
    // row-for-row exact vs the window formulation.
    val grouped = docs.withColumn("g", ($"doc_id" % 20000).cast("string"))
    val budgets = grouped.select($"g").distinct()
      .withColumn("budget", (conv(substring(md5($"g"), 1, 2), 16, 10) % 3)
        .cast("long"))
    val got = operators.Sampling.quotaSelect(grouped, "g", "text", "doc_id",
        budgets)
      .select($"g", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy($"g")
      .orderBy(md5($"text".cast("binary")), $"doc_id")
    val want = grouped.withColumn("rn", row_number().over(w))
      .join(budgets, "g")
      .filter($"rn" <= $"budget")
      .select($"g", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("curriculumShards: shards ordered by score, sizes quantile-balanced") {
    val toked = docs.withColumn("score",
      expr("n_chars * 1000 DIV CAST(length(text) - " +
        "length(replace(text, ' ', '')) + 1 AS BIGINT)"))
    val out = operators.Sampling.curriculumShards(toked, "score", 4)
    val stats = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"score").as("lo"),
        max($"score").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // strict score ordering across shards: shard k's max < shard k+1's min
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"shards overlap: $a vs $b")
    }
    // quantile balance: each shard within one largest-tie-group of n/4
    val total = stats.map(_._2).sum
    val biggestTie = toked.groupBy($"score").count()
      .agg(max($"count")).head.getLong(0)
    stats.foreach { case (s, n, _, _) =>
      assert(math.abs(n - total / 4) <= biggestTie,
        s"shard $s size $n vs ideal ${total / 4} (tie bound $biggestTie)")
    }
    // stability: equal scores share a shard by construction; rerun equal
    val again = operators.Sampling.curriculumShards(toked, "score", 4)
      .select($"doc_id", $"shard").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(again == out.select($"doc_id", $"shard").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet)
  }

  test("epoch shards partition the corpus and sequence within shards") {
    val out = SparkEntry.queries("q_sample_epoch_shards")(sp, sfDir).collect()
    val total = docs.count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total,
      "every doc must land in exactly one shard")
    assert(out.length == 8 && out.map(_.getAs[Int]("shard")).toSet.size == 8)
    // deterministic: a second run reproduces order_pin (the sequence hash)
    val again = SparkEntry.queries("q_sample_epoch_shards")(sp, sfDir)
      .collect().map(r => r.getAs[Int]("shard") -> r.getAs[Long]("order_pin"))
      .toMap
    out.foreach(r =>
      assert(again(r.getAs[Int]("shard")) == r.getAs[Long]("order_pin")))
  }

  test("rag chunk retrieval: one best chunk per doc, aligned to stride") {
    val rows = SparkEntry.queries("q_rag_chunk_retrieval")(sp, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "one row per doc")
    assert(rows.forall(_.getAs[Long]("score") > 0))
    assert(rows.forall(_.getAs[Int]("best_start") % 16 == 0))
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.sameElements(scores.sortBy(-_: Long)), "sorted by score desc")
  }

  test("oversampleMix hits every budget exactly across all regimes") {
    import sp.implicits._
    // budgets derived from the ACTUAL per-lang counts so every regime is
    // exercised regardless of the fixture SF: en subsamples to n/2, zh
    // oversamples to 3n+7, de keeps n, es drops to 0, fr doubles
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("en" -> (n("en") / 2), "zh" -> (n("zh") * 3 + 7),
      "de" -> n("de"), "es" -> 0L, "fr" -> (n("fr") * 2))
    val budgets = want.toSeq.toDF("lang", "budget")
    val out = ops.oversampleMix(docs, "lang", "text", "doc_id", budgets)
    val census = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == want.filter(_._2 > 0), s"got $census want $want")
    // copy indices are dense 1..k per doc, and exactly rem docs get base+1
    val copies = out.filter(col("lang") === "zh")
      .groupBy("doc_id").agg(count(lit(1)).as("k"),
        sum(col("copy_n")).as("s")).collect()
    copies.foreach { r =>
      val (k, s) = (r.getLong(1), r.getLong(2))
      assert(s == k * (k + 1) / 2, "copy_n is 1..k")
      assert(k == 3L || k == 4L, "zh docs get base 3 or 3+1 copies")
    }
    assert(copies.count(_.getLong(1) == 4L) == 7, "exactly rem=7 extras")
  }

  test("leakageSafeSplit: no near-dup pair straddles a split boundary") {
    val assigned = ops.leakageSafeSplit(docs)
      .select(col("doc_id"), col("split"), col("rep_id"))
    val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
    val n_pairs = pairs.count()
    assert(n_pairs > 0, "fixture must contain near-dup pairs")
    val straddling = pairs
      .join(assigned.select(col("doc_id").as("doc_a"),
        col("split").as("sa")), "doc_a")
      .join(assigned.select(col("doc_id").as("doc_b"),
        col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0, s"$straddling of $n_pairs pairs leak")
    // all three splits populated and every doc assigned exactly once
    val census = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.keySet == Set("train", "val", "test"), s"got $census")
    assert(census.values.sum == docs.count())
  }

  test("dsirWeights ranks target-vocab docs above off-vocab docs") {
    import sp.implicits._
    // target speaks {law, court, judge…}; the pool mixes docs written in
    // that vocabulary with docs written in a disjoint one — DSIR's whole
    // job is to pull the former ahead of the latter.
    val target = (0 until 30).map { i =>
      (1000L + i, s"law court judge ruling appeal verdict statute case " +
        s"law court judge ruling t$i")
    }.toDF("doc_id", "text")
    val pool = ((0 until 10).map { i =>
      (i.toLong, s"court ruling appeal statute judge law verdict p$i")
    } ++ (10 until 20).map { i =>
      (i.toLong, s"recipe flour oven butter sugar bake whisk dough p$i")
    }).toDF("doc_id", "text")
    val w = ops.dsirWeights(pool, target).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 20, "every pool doc scored")
    val lawMin = (0 until 10).map(i => w(i.toLong)).min
    val offMax = (10 until 20).map(i => w(i.toLong)).max
    assert(lawMin > offMax,
      s"target-like docs ($lawMin) must outrank off-vocab docs ($offMax)")
  }

  test("prioritySample: weight dominates, deterministic, exact k") {
    // 50 unit-weight rows + one row whose weight (2^40) crushes its
    // priority to hash >> 40 < 2^8 — it MUST be drawn at any k, while the
    // unit rows keep their raw 48-bit hashes as priorities
    val rows = (1 to 50).map(i => (i.toLong, s"content $i", 1L)) :+
      ((99L, "the heavy row", 1L << 40))
    val df = rows.toDF("id", "text", "w")
    val s1 = operators.Sampling.prioritySample(df, "text", "w", "id", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1.contains(99L), s"heavy row must be sampled: $s1")
    assert(s1.size == 10)
    // deterministic: same input -> identical draw
    val s2 = operators.Sampling.prioritySample(df, "text", "w", "id", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // exact duplicates share a priority (content-keyed) and both can draw
    val dup = Seq((1L, "same", 1L), (2L, "same", 1L)).toDF("id", "text", "w")
    val d = operators.Sampling.prioritySample(dup, "text", "w", "id", 2)
      .select("priority").collect().map(_.getLong(0))
    assert(d(0) == d(1), "content-keyed: identical text -> same priority")
  }

  test("prioritySample: zero/negative weights fail loudly") {
    // weight 0 would DIV to NULL (non-ANSI Spark) and NULLS-FIRST its row
    // straight into the top-k while DuckDB sorts it last — degenerate
    // weights must error, not silently reorder the draw
    val bad = Seq((1L, "fine", 1L), (2L, "degenerate", 0L))
      .toDF("id", "text", "w")
    val ex = intercept[Exception] {
      operators.Sampling.prioritySample(bad, "text", "w", "id", 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("weight must be >= 1")), ex.toString)
  }
}
