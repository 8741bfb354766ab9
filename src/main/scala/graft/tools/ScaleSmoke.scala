package graft.tools

import graft.{Engine, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: replicates the fact tables N× into a scratch dir (keys
  * re-spaced so join fan-outs stay realistic) and runs the heavy registry
  * queries against it. Validates that plans chosen at sf0.1 still behave at
  * ~10× — the local stand-in for the 100 TB question. Usage:
  *   sbt "runMain graft.tools.ScaleSmoke [factor] [srcDir] [outDir]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(2).getOrElse(s"/tmp/graft_scale_x$factor")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = Seq("region", "nation", "customer", "supplier", "part",
      "embeddings")
    dims.foreach { t =>
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
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
      "q_merge_upsert", "q_text_bm25")
    heavy.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, out).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale-smoke x$factor] $name%-24s rows=$n%-9d ${dt}%.2fs")
    }
    spark.stop()
  }
}
