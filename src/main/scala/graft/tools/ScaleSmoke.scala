package graft.tools

import graft.{Engine, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: replicates the fact tables N× into a scratch dir (keys
  * re-spaced so join fan-outs stay realistic) and runs the heavy registry
  * queries against it. Validates that plans chosen at sf0.1 still behave at
  * ~10× — the local stand-in for the 100 TB question. Usage:
  *   sbt "runMain graft.tools.ScaleSmoke [factor] [srcDir] [outDir]"
  *
  * GATE mode (round 5): `runMain graft.tools.ScaleSmoke gate fA fB` times
  * every heavy query at both factors and FAILS (exit 1) when a query not
  * tagged [[graft.QueryDef.parityShape]] grows super-linearly — wall time
  * ratio > (fB/fA) × slack. Parity shapes (the canonical q21 self-joins
  * etc.) are reported but never gate: their scale behavior is pinned by
  * their `*_fast` twins instead.
  */
object ScaleSmoke {

  val heavy = Seq("q1_agg", "q_join_q5_snowflake", "q_join_inner_smj",
    "q_tpch_q18", "q_events_sessionize", "q_window_running_sum",
    "q_dedup_minhash_lsh", "q_union_distinct",
    // round 3: anti-join chain, SSB star, LSH near-dup, packing
    "q_tpch_q21", "q_ssb_q4_1", "q_dedup_embedding_lsh",
    "q_pack_sequences",
    // round 4: the single-pass q21 rewrite beside the self-join original,
    // plus the dedup chain against the now-replicated documents fact
    "q_tpch_q21_fast", "q_dedup_exact", "q_dedup_clusters",
    "q_docs_pipeline", "q_text_freq_tokens",
    // round 4b: decontamination over the replicated corpus, quantized
    // retrieval, custom top-k exec, merge, BM25
    "q_decontaminate", "q_sim_quantized_topk", "q_topk_per_group",
    "q_merge_upsert", "q_text_bm25",
    // round 5: the heaviest new DS shapes — the three-fact follow-up chain
    // (three distinct exchange keys) and the INTERSECT+scalar+union+rollup
    // composite
    "q_ds_returns_chain", "q_ds_cross_channel_rollup",
    // round 5b: Gopher battery (explode + bigram shuffles over the
    // replicated corpus), KMV pairwise algebra (must stay flat — raw
    // tokens never join), map-only mixture sampling
    "q_text_gopher", "q_text_kmv_overlap", "q_sample_mix",
    // round 5c: PQ encode must be LINEAR in the corpus (fixed codebook —
    // a corpus-fraction codebook would be quadratic and fail here)
    "q_sim_ann_pq",
    // round 5d: Lloyd's k-means over the REPLICATED embedding corpus
    // (embeddings_rep, vec_ids shifted) — assignment is a narrow map and
    // the update shuffle is partitions·k·d regardless of n, so wall time
    // must track the corpus linearly
    "op_kmeans_i8",
    // round 5e: substring-span census (one explode + one fp shuffle, rows
    // ~ bytes/stride — must stay linear even though the replicated corpus
    // makes nearly every span "repeated") and bloom-routed admission (the
    // bloom build is one pass, the residual anti-join is bounded by the
    // duplicate volume)
    "q_dedup_repeated_spans", "q_dedup_admit_bloom",
    // round 6: quota selection must stay census+boundary-bounded (never a
    // whole-group sort), epoch sharding is map + per-shard sort (linear),
    // RAG chunking is a fixed ~2x explode + broadcast-scored scan, and the
    // reformulated KMV sketch is two narrow partial aggregates
    "q_sample_unimax", "q_sample_epoch_shards", "q_rag_chunk_retrieval",
    "q_agg_kmv_sketch",
    // round 6b: bigram-LM fluency scoring — model aggregate is
    // vocab-bounded and the scoring join is keyed on (lang, w1, w2), so
    // wall time must track the corpus linearly even at 100x duplication
    // (duplicated docs only deepen counts, never widen the model)
    "q_text_lm_fluency",
    // round 6c: bitmap COUNT DISTINCT ships constant <=4KB bitmaps per
    // (group, bucket) however many rows feed them; DSIR's two unigram
    // models are vocab-bounded and scoring is two keyed joins over one
    // token explode; priority dedup is one min-struct aggregate (the
    // exact-dedup shuffle with a wider payload); the diversity report is
    // two explodes + vocab-bounded aggregates
    "q_agg_bitmap_distinct", "q_sample_dsir", "q_dedup_priority",
    "q_text_diversity",
    // round 6d: oversampling explodes to the OUTPUT size (bounded by the
    // budgets, not the corpus); the leakage split rides the same pair/CC
    // machinery as the curation pipeline — on a replicated corpus its raw
    // form shares the minhash quadratic-in-duplication hazard (replica
    // cliques), so the gate measures the composition the operator's
    // scaladoc prescribes: exact dedup FIRST, then the split
    "q_sample_oversample", "op_leakage_split_deduped",
    // round 7: container header synth+parse is a pure per-row byte kernel
    // (must be exactly linear); interleaved packing is the running-sum
    // window per language (linear, no global sort); blob near-dup is gated
    // in the prescribed composition — exact blob dedup FIRST (one md5
    // shuffle collapses the replicas), then the histogram-signature pair
    // census, same stage-order lever as op_leakage_split_deduped
    "q_mm_bmp_header", "q_mm_interleave", "op_blob_neardup_deduped",
    // boilerplate removal: chunk explode + df aggregate + join-back +
    // per-doc reassembly, all corpus-linear (replication deepens df
    // counts — it never widens the chunk vocabulary)
    "q_text_boilerplate",
    // token-weighted quota: same census + boundary-bucket discipline as
    // quotaSelect (must never regress to a whole-group sort); PNG chunk
    // walk is a pure per-row byte kernel (exactly linear)
    "q_sample_token_budget", "q_mm_png_chunks",
    // PageRank: 5 rounds of one |E|-shuffle join + one dst aggregate —
    // must track the edge count linearly
    "q_graph_pagerank",
    // the composed cleaning pipeline: scrub map + boilerplate
    // explode/df/join + one dedup shuffle, all corpus-linear
    "q_docs_pipeline_clean",
    // round 7b: triangle counting — the degree orientation bounds every
    // node's out-adjacency to O(sqrt(m)), so the wedge stage must track
    // the edge count near-linearly even as replication densifies the
    // md5 link graph; audio frame energy is one bounded (<=128/row)
    // explode + per-doc aggregate + per-doc window, exactly linear
    "q_graph_triangles", "q_mm_audio_energy",
    // k-core peeling: four rounds of degree-aggregate + two semi-joins
    // over an eagerly-checkpointed, monotonically-shrinking edge set —
    // must track |E| linearly
    "q_graph_kcore",
    // perceptron training: per round one map + one 8-wide aggregate with
    // an 8-long driver pull (k-means discipline) — corpus-linear however
    // many rounds
    "q_text_perceptron",
    // round 7c: MAD outlier census is two grouped exact percentiles +
    // two broadcast stats joins (replication deepens groups, never widens
    // them); frozen label propagation is one |E|-shuffle join + one dst
    // min-aggregate + one anti-join per round over the replica-scaled
    // link graph; attribution pairs on (user, lookback bucket), so the
    // 31-day-shifted replicas of a user can never meet in a probe and
    // the join stays corpus-linear; fuzzy linkage runs fact-sized dirty
    // mentions against the replica-collapsed DISTINCT catalog (blocked
    // equi-join — replication multiplies the dirty side only)
    "q_events_mad_outliers", "q_graph_label_prop",
    "q_events_attribution", "op_fuzzy_link_rep",
    // drift report: one map-combine (key, log2-bucket) aggregate — the
    // window/TV math runs on the bucket-bounded frame; mix pipeline:
    // dedup-first ordering collapses the replicas before the budget
    // census and quota ranking, same stage-order lever as q_docs_pipeline
    "q_profile_drift", "q_mix_pipeline",
    // market basket: distinct (basket, item) + one self-equi-join on the
    // basket key (per-basket fan-out is bounded by basket size, ≤13 parts
    // per order in the fixture) + pair aggregate + per-item top-k;
    // transitions: one per-user lag window + a |types|²-bounded aggregate
    "q_retr_market_basket", "q_events_transitions",
    // novelty: bigram explode + gram-vocab-bounded first-bearer aggregate
    // + join-back (replication deepens gram counts, never widens the
    // vocabulary); vocab churn: one explode + one (lang, token) aggregate
    "q_text_novelty", "q_text_vocab_churn",
    // rank calibration: one window per source (group-bounded sort) + a
    // |sources|-bounded census
    "q_sample_calibrate",
    // round 8: PII redaction is a pure four-regex map stage (must be
    // exactly linear); stitching is two boundary-hash equi-joins (tails
    // vs heads), corpus-linear with collision-bounded output (segment-
    // blocked linkage at scale is op_fuzzy_link_rep below — the q_link_*
    // registry rows run on the dim-sized part catalog)
    "q_text_redact", "q_text_stitch")

  /** Scale-only runners that aren't registry queries: operators whose
    * registry fixture is a dim-sized table, re-run here against the
    * replicated fact-sized variant the scratch dir carries. */
  private val extraRunners
      : Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "op_kmeans_i8" -> { (spark, dir) =>
        graft.plans.GraftFunctions.ensureRegistered(spark)
        // scratch dirs carry the replicated fact variant; plain testdata
        // dirs (plan-signature pinning) fall back to the dim-sized table
        val rep = s"$dir/embeddings_rep.parquet"
        val path = if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(rep))) rep
          else s"$dir/embeddings.parquet"
        // loud in the gate log: if a scratch dir ever failed to write the
        // replicated fixture, the fallback would otherwise silently time
        // the dim-sized table at both factors and the entry goes vacuous
        println(s"  op_kmeans_i8 input: $path" +
          (if (path == rep) "" else " (FALLBACK: dim-sized table)"))
        val e = spark.read.parquet(path)
          .select(col("vec_id"), expr("quantize_i8(embedding)").as("v"))
        graft.ops.kmeansI8(e, "vec_id", "v", k = 8, iters = 2)
      },
      // leakage-safe split as the pipeline runs it at scale: exact dedup
      // collapses the replicated corpus FIRST (one md5 shuffle), so the
      // pair/CC stages see the deduped 15k docs however many replicas the
      // scratch dir carries — the same stage-order lever as q_docs_pipeline
      "op_leakage_split_deduped" -> { (spark, dir) =>
        graft.plans.GraftFunctions.ensureRegistered(spark)
        val docs = Tables(spark, dir, "documents")
        val deduped = docs
          .groupBy(md5(col("text").cast("binary")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"))
          .join(docs, col("keep_id") === col("doc_id"))
          .select(docs.columns.map(col): _*)
        graft.ops.leakageSafeSplit(deduped)
          .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      },
      // fuzzy record linkage at scale: dirty mentions are per-doc
      // corrupted 24-char prefixes of the REPLICATED documents fact (the
      // corpus-sized side), the catalog is the DISTINCT prefix set (the
      // replicas collapse — dimension-sized, broadcastable); cost is the
      // blocked equi-join + per-block levenshtein, linear in the corpus
      "op_fuzzy_link_rep" -> { (spark, dir) =>
        val base = Tables(spark, dir, "documents")
          .select(col("doc_id"), expr("substr(text, 1, 24)").as("name"))
          .filter(length(col("name")) >= 6)
        val catalog = base.select(col("name").as("clean_name")).distinct()
        val dirty = base.withColumn("pos",
            expr("CAST(5 + conv(substr(md5(name), 1, 6), 16, 10) " +
              "% (length(name) - 4) AS INT)"))
          .select(col("doc_id").as("dirty_id"),
            expr("concat(substr(name, 1, pos - 1), substr(name, pos + 1))")
              .as("dirty_name"))
        graft.ops.fuzzyJoin(dirty, catalog, "dirty_name", "clean_name")
          .agg(count(lit(1)).as("n_matches"))
      },
      // blob near-dup as the pipeline runs it at scale: exact blob dedup
      // collapses replicas first, then the histogram-signature candidate
      // pair census runs over the deduped blobs
      "op_blob_neardup_deduped" -> { (spark, dir) =>
        val blobs = Tables(spark, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
        val deduped = graft.ops.dedupBlobs(blobs, "doc_id", "blob")
        val sigs = graft.ops.blobHistogramSig(deduped, "doc_id", "blob")
        val a = sigs.select(col("bh_sig"), col("doc_id").as("id_a"))
        val b = sigs.select(col("bh_sig"), col("doc_id").as("id_b"))
        a.join(b, "bh_sig").filter(col("id_a") < col("id_b"))
          .agg(count(lit(1)).as("n_candidate_pairs"))
      })

  private def runner(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    extraRunners.getOrElse(name, SparkEntry.queries(name))

  /** [[ScaleProbe]] / PlanStabilitySpec hook: resolve a gate entry by
    * name (registry queries AND the op_* scale-only runners). */
  private[graft] def runnerFor(name: String) = runner(name)

  /** Gate exemptions beyond parityShape, each with the reason on record:
    * q_dedup_clusters is linear in its INPUT (the near-dup pair list), and
    * q_dedup_minhash_lsh in its bucket PAIR volume — but the replica corpus
    * makes both quantities quadratic in the duplication factor by
    * construction (every replica collides with every other), so the
    * measured 100× blow-up (9.2s→74s raw LSH at 30×→100×) is the input,
    * not the operator. The mitigation is pipeline ORDER — exact dedup
    * first — and the gate proves it beside them: q_docs_pipeline, which
    * contains the same near-dup stage behind an exact-dedup stage, stays
    * FLAT (1.8s→1.4s) on the identical corpus. */
  val gateExempt = Set("q_dedup_clusters", "q_dedup_minhash_lsh")

  /** Written adjudications for entries that sit in the >2.0× watch band
    * (above the ~1-1.5× most entries show once the per-query scheduling
    * floor amortizes, still inside the hard budget): WHY the growth is
    * the input's, not a plan flaw. Printed with the gate line whenever
    * the measured ratio exceeds 2.0, so the log is self-justifying
    * (VERDICT r8 #3). */
  val adjudications: Map[String, String] = Map(
    "q_graph_triangles" ->
      ("O(m^1.5) by algorithm: degree-oriented wedge counting is bounded " +
        "by sum(min-deg oriented wedges) ~ m^1.5; replication multiplies " +
        "m 3.3x, so the envelope allows up to ~6x. Input-shape-bound."),
    "q_events_transitions" ->
      ("window-sort-bound: per-user streams grow with replication (same " +
        "users, 3.3x events each), and ordering each stream is the " +
        "operator's definition — no pre-aggregation can reorder a lag(). " +
        "Ratio stays below the 3.3x data growth = sublinear."),
    "q_events_mad_outliers" ->
      ("corpus-linear by construction after the r9 histogram rework: the " +
        "one corpus-wide stage is a map-side-combinable (key,value) " +
        "census; everything after runs on the value-domain-bounded " +
        "histogram."),
    "q_docs_pipeline_clean" ->
      ("corpus-linear: scrub regexes and chunk hashing are pure map " +
        "work, the df census ships fixed-width md5 keys (r9 rework — " +
        "chunk text no longer crosses any shuffle), and replicas are " +
        "DISTINCT doc_ids so exact df must see each one. Subtracting " +
        "the ~0.5s scheduling floor the growth matches the 3.3x data " +
        "ratio; the 2.3-2.7x run-to-run band is noise on that floor."))

  private def parityShapes: Set[String] =
    SparkEntry.registry.filter(_.parityShape).map(_.name).toSet

  private def buildScratch(spark: SparkSession, factor: Int, src: String,
      out: String): Unit = {
    val dims = Seq("region", "nation", "customer", "supplier", "part",
      "embeddings")
    dims.foreach { t =>
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // embeddings ALSO written replicated under a separate name: the ANN/
    // LSH registry queries keep their dim-sized corpus (replicated exact
    // duplicates would make LSH pair volume quadratic by construction),
    // while op_kmeans_i8 scales against the fact-sized variant
    val emb = Tables(spark, src, "embeddings")
    (0 until factor).map(i => emb
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/embeddings_rep.parquet")
    // documents replicate as a FACT with unchanged text: every replica is
    // an exact duplicate of its original — the heavily-duplicated-corpus
    // stress for the dedup path (exact dedup must collapse the replicas
    // BEFORE the near-dup stage, keeping LSH pair counts bounded)
    val documents = Tables(spark, src, "documents")
    (0 until factor).map(i => documents
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // replicate facts with shifted keys: each replica keeps referential
    // integrity to the same dims but multiplies fact-side cardinality
    val oMax = 10000000L
    val replicas = 0 until factor
    val orders = Tables(spark, src, "orders")
    val lineitem = Tables(spark, src, "lineitem")
    val events = Tables(spark, src, "events")
    replicas.map(i => orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * oMax)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    replicas.map(i => lineitem
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * oMax)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    replicas.map(i => events
        .withColumn("event_id", col("event_id") + lit(i * oMax))
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS")))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** min-of-3 warm wall time per heavy query at `dir` (min-of-2 let a
    * single contended iteration at the larger factor read as 7.7x on a
    * plan whose clean ratio is 2.5x — one extra sample makes the gate
    * contention-resistant, same lesson as graft.Bench's min-of-3). */
  private def timeAll(spark: SparkSession, dir: String,
      factor: Int): Map[String, Double] =
    heavy.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = runner(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      // same discipline as Verify/Bench: a query's persisted intermediates
      // must not survive into the next measurement (a lingering
      // 30x-replicated shingle cache OOM'd the x100 phase before this).
      // getPersistentRDDs also reaps localCheckpoint blocks (connected
      // components) that catalog.clearCache can't see
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val (dt, n) = (times.map(_._1).min, times.head._2)
      println(f"[scale-smoke x$factor] $name%-24s rows=$n%-9d ${dt}%.2fs")
      name -> dt
    }.toMap

  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.headOption.contains("gate")) {
      val fA = args.lift(1).map(_.toInt).getOrElse(10)
      val fB = args.lift(2).map(_.toInt).getOrElse(30)
      val src = args.lift(3).getOrElse("/root/testdata/sf0.1")
      val slack = 2.0  // log-factor + noise headroom over proportional
      val parity = parityShapes
      // "reuse" as the 4th arg skips scratch rebuilds when the replica
      // dirs already exist (re-judging exemptions without 10 min of I/O)
      val reuse = args.lift(3).contains("reuse") || args.lift(4).contains("reuse")
      val dirs = Seq(fA, fB).map { f =>
        val out = s"/tmp/graft_scale_x$f"
        if (!(reuse && java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$out/lineitem.parquet")))) {
          buildScratch(spark, f, src, out)
        }
        f -> out
      }
      val Seq(tA, tB) = dirs.map { case (f, d) => timeAll(spark, d, f) }
      val budget = slack * fB / fA
      // denominator floored at the per-query scheduling floor (~0.25s at
      // these scales): below it wall time measures job-launch noise, not
      // throughput, and a 0.09s -> 0.7s move would read as "8x" while
      // being two samples of the same floor
      val violations = heavy.filter { name =>
        val ratio = tB(name) / math.max(tA(name), 0.25)
        val tagged = parity.contains(name) || gateExempt.contains(name)
        val verdict =
          if (ratio <= budget) "linear-ok"
          else if (tagged) "super-linear (tagged, allowed)"
          else "SUPER-LINEAR — FAIL"
        println(f"[scale-gate] $name%-24s x$fA=${tA(name)}%.2fs " +
          f"x$fB=${tB(name)}%.2fs ratio=${ratio}%.1f budget=${budget}%.1f " +
          verdict)
        if (ratio > 2.0) adjudications.get(name).foreach(why =>
          println(s"[scale-gate]   adjudicated: $why"))
        ratio > budget && !tagged
      }
      spark.stop()
      if (violations.nonEmpty) {
        System.err.println(
          s"[scale-gate] FAILED: ${violations.mkString(", ")}")
        sys.exit(1)
      }
      println(s"[scale-gate] PASS: all untagged heavy queries within " +
        f"$budget%.1fx at $fB/$fA scale")
    } else {
      val factor = args.headOption.map(_.toInt).getOrElse(10)
      val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val out = args.lift(2).getOrElse(s"/tmp/graft_scale_x$factor")
      buildScratch(spark, factor, src, out)
      timeAll(spark, out, factor)
      spark.stop()
    }
  }
}
