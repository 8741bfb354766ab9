package graft

import graft.plans.ScaleGuard
import org.apache.spark.sql.functions._

/** The scale audit must flag exactly the cluster-killer shapes — cartesian
  * pairing, nested-loop broadcast joins, single-partition windows — and
  * stay silent on well-partitioned plans. */
class ScaleGuardSpec extends GraftSpecBase {

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan

  test("flags cartesian products") {
    // small sides would broadcast into a BNLJ; force the true cartesian
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val a = spark.range(10).toDF("x")
      val b = spark.range(10).toDF("y")
      val f = ScaleGuard.findings(planOf(a.crossJoin(b)))
      assert(f.exists(_.contains("CartesianProduct")), f.mkString("; "))
    } finally spark.conf.set(key, prev)
  }

  test("flags nested-loop theta joins") {
    val a = spark.range(10).toDF("x")
    val b = spark.range(10).toDF("y")
    val f = ScaleGuard.findings(planOf(a.join(b, col("x") < col("y"))))
    assert(f.exists(_.contains("BroadcastNestedLoopJoin")), f.mkString("; "))
  }

  test("flags single-partition windows") {
    val w = org.apache.spark.sql.expressions.Window.orderBy("x")
    val df = spark.range(10).toDF("x")
      .withColumn("rn", row_number().over(w))
    val f = ScaleGuard.findings(planOf(df))
    assert(f.exists(_.contains("empty PARTITION BY")), f.mkString("; "))
  }

  test("registry-wide: only the documented-deliberate queries trigger") {
    // every ScaleGuard hit across the full registry must be a CHOICE:
    // labeled brute-force baselines, broadcast-bounded ANN shapes (query
    // side or centroid codebook is broadcast-sized by construction), the
    // cartesian/theta coverage queries themselves, and global windows over
    // already-reduced or constant inputs. Anything new showing up here is
    // an accidental scale hazard — fix the plan, don't grow this list.
    val deliberate = Set(
      "q_join_cross", "q_join_theta_band",          // cartesian/theta coverage
      "q_window_ntile", "q_golden_null_order",      // global windows: bounded
      "q_golden_complex_compare",                   //   3-row VALUES constant
      "q_golden_window_frames",                     //   5-row VALUES constant
      "q_golden_ignore_nulls",                      //   5-row VALUES constant
      "q_golden_empty_quantifiers",                 // NOT-IN over an
                                                    //   empty (1=0) subquery
                                                    //   plans a null-aware
                                                    //   BNLJ on 1 row
      "q_ds_cumulative_fulljoin", "q_ds_dual_rank", //   post-agg series
      "q_dedup_embedding", "q_sim_topk_brute",      // labeled baselines
      "q_sim_ann_ivf", "q_sim_dot_topk",            // broadcast-bounded ANN
      "q_sim_ann_pq",                               //   (PQ codebook + LUT
                                                    //   cross joins are the
                                                    //   broadcast codebook,
                                                    //   ~100 rows)
      "q_sim_topk_plan", "q_sim_quantized_topk",
      "q_sim_matryoshka",                           // broadcast 8-query side
                                                    //   over the coarse
                                                    //   truncated-dim linear
                                                    //   scan (MRL funnel)
      "q_mm_caption_retrieval",                     // CosineTopKJoin with the
                                                    //   zh-caption query side
                                                    //   broadcast-bounded by
                                                    //   construction (same
                                                    //   shape as topk_plan)
      "q_golden_window_exclude",                    // global windows over a
                                                    //   6-row VALUES constant
                                                    //   (EXCLUDE-emulation
                                                    //   truth table)

      // (q_ds_cross_channel_rollup left this list when its scalar-average
      // cross join moved ahead of the grain aggregate — the planner folds
      // it into the single-pass scan)
      "q_text_tfidf", "q_text_bm25",                // 1-row corpus-stats
      "q_rag_chunk_retrieval",                      //   frames (N, df_t, w_t)
                                                    //   cross-joined onto the
                                                    //   chunk stream
      "q_text_nb_lang",                             // broadcast |classes|-row
                                                    //   model table (5 langs)
                                                    //   fanned onto the token
                                                    //   stream — the constant
                                                    //   factor every NB
                                                    //   scorer pays, plus a
                                                    //   1-row N_docs frame
      // (q_sample_unimax left this list when its census/budget frames were
      // persisted — the planner now feeds both branches from the cached
      // census instead of a 1-row stats cross-join)
      "q_sample_dsir",                              // 1-row model-totals
                                                    //   frame (N_raw, N_tgt)
                                                    //   broadcast onto the
                                                    //   token stream — same
                                                    //   stats pattern as
                                                    //   tfidf/nb
      "q_ds_weekday_pivot_ratio",                   //   frames cross-joined
      "q_golden_nth_value",                         //   4-row VALUES constant
      "q_golden_order_all",                         //   1-row LIMIT x 3-row
                                                    //   VALUES cross join
                                                    //   (bounded constants)
      "q_ds_interval_range_window",                 // global RANGE window
                                                    //   over the post-agg
                                                    //   day-grain series
                                                    //   (bounded: 2 months)
      "q_text_kmv_overlap",                         // pairwise KMV set
                                                    //   algebra: `<` cross of
                                                    //   the POST-AGG sketch
                                                    //   table (one row per
                                                    //   source, 4 rows here —
                                                    //   the whole point is
                                                    //   that raw tokens never
                                                    //   join)
      "q_text_vocab_coverage",                      // global rank over the
                                                    //   TYPE CENSUS only
                                                    //   (vocab-bounded,
                                                    //   never the corpus)
      "q_sample_curriculum",                        // global cumulative
                                                    //   window over the
                                                    //   SCORE CENSUS — a
                                                    //   score-domain-bounded
                                                    //   table (≤ thousands
                                                    //   of distinct integer
                                                    //   scores), never the
                                                    //   corpus
      "q_ds_decile_spend",                          // global ntile(10) over
                                                    //   the POST-AGG per-
                                                    //   customer spend table
                                                    //   (the ds decile-cohort
                                                    //   shape; at 100 TB
                                                    //   replace with range-
                                                    //   partitioned quantile
                                                    //   cuts)
      "q_ds_bidirectional_rank",                    // two global row_number
                                                    //   chains over the
                                                    //   POST-AGG part-grain
                                                    //   table (ds44; bounded
                                                    //   by the part dim)
      "q_ds_rolling_distinct",                      // day-range BNLJ where
                                                    //   the build side is the
                                                    //   DISTINCT-day table —
                                                    //   bounded by the
                                                    //   calendar (≤31 rows)
      "q_text_vocab_churn",                         // 1-row max_id frame
                                                    //   broadcast onto the
                                                    //   doc scan to split
                                                    //   the epochs
      "q_text_pmi",                                 // 1-row n_docs frame
                                                    //   broadcast onto the
                                                    //   df-banded pair AGG
                                                    //   (bounded: one row
                                                    //   per surviving pair)
                                                    // (q_graph_triangles'
                                                    //   1-row n_docs cross
                                                    //   join sits behind the
                                                    //   round-8 persist of
                                                    //   the oriented edges —
                                                    //   like kcore's
                                                    //   checkpoint, it never
                                                    //   reaches the final
                                                    //   inspected plan, so
                                                    //   no whitelist row;
                                                    //   same stats pattern
                                                    //   as tfidf/nb; the
                                                    //   wedge joins
                                                    //   themselves are
                                                    //   equi-joins)
      "q_ds_rank_join", "q_ds_window_filtered_rollup", // global rank over
                                                    //   DIMENSION-grain
                                                    //   aggregates (supplier/
                                                    //   nation leaderboards,
                                                    //   bounded by the dim)
      "q_golden_sqlt_win_nth",                      // global windows over the
                                                    //   17-row basic_pays
                                                    //   VALUES constant (the
                                                    //   reference's nth_value
                                                    //   frame matrix)
      "q_golden_sqlt_win_misc",                     // empty OVER () global
                                                    //   frame over the 9-row
                                                    //   testdata constant —
                                                    //   the TC under test
      "q_golden_sqlt_subq_exists_basic",            // uncorrelated EXISTS
                                                    //   (TC 01.01) plans a
                                                    //   1-row BNLJ gate over
                                                    //   the 9-row VALUES emp
      "q_golden_sqlt_subq_notin_multi",             // (a,b) NOT IN plans a
                                                    //   null-aware BNLJ over
                                                    //   the 4-row VALUES m/s
                                                    //   null truth table
      "q_golden_sqlt_subq_exists_having",           // uncorrelated HAVING-
                                                    //   EXISTS gates plan a
                                                    //   1-row BNLJ over the
                                                    //   9-row VALUES emp
      "q_golden_sqlt_subq_exists_andor",            // LIMIT-1 / OR'd EXISTS
                                                    //   gates — same 1-row
                                                    //   BNLJ over VALUES
      "q_golden_sqlt_subq_nested_notin",            // NOT IN null-poisoning
                                                    //   truth table over the
                                                    //   7-row VALUES emp2 —
                                                    //   null-aware BNLJ is
                                                    //   the TC under test
      "q_golden_sqlt_cross_join",                   // cross-join.sql port:
                                                    //   the 3x3-row VALUES
                                                    //   cartesian/theta TCs
                                                    //   ARE the coverage
      "q_golden_sqlt_null_prop",                    // count(NULL) OVER ()
                                                    //   global window over a
                                                    //   3-row VALUES constant
                                                    //   — the TC under test
      // (the q_tpcds_verbatim_* family is whitelisted wholesale below)
      "q_tpcds_verbatim_q1")
    val flagged = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan
      if (ScaleGuard.findings(plan).nonEmpty) Some(q.name) else None
    }.toSet
    // verbatim TPC-DS texts over the derived micro-schema (TpcdsVerbatim):
    // the reference query files run UNMODIFIED BY DESIGN, so their
    // ORDER BY … LIMIT top-k sorts, q88-style single-row scalar blocks
    // cross-joined into one row, and 1-row avg-subquery broadcasts appear
    // as written; all are bounded by the dim-sized fixture, and the
    // 100 TB-scale planner twins live in TpcdsShapes (q_ds_* family).
    // Whitelisted as a family — which members trip the guard shifts with
    // fixture statistics, and none of them is a graft-authored plan.
    val verbatimFamily = flagged.filter(_.startsWith("q_tpcds_verbatim_"))
    val accidental = flagged -- deliberate -- verbatimFamily
    assert(accidental.isEmpty, s"accidental scale hazards: $accidental")
    val stale = (deliberate -- flagged)
      .filterNot(_.startsWith("q_tpcds_verbatim_"))
    assert(stale.isEmpty, s"whitelist entries no longer flagged: $stale")
  }

  test("silent on partitioned window + equi-join + aggregate plans") {
    val li = Tables(spark, sfDir, "lineitem")
    val orders = Tables(spark, sfDir, "orders")
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    assert(ScaleGuard.findings(planOf(joined)).isEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_orderkey")
    val windowed = li.withColumn("rn", row_number().over(w))
    assert(ScaleGuard.findings(planOf(windowed)).isEmpty)
  }
}
