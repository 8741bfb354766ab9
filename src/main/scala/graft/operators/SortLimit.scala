package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / range-source capability surface.
  *
  * The reference's `ColumnarSortExec` caches-then-sorts with no spill and a
  * <65536-batches-per-partition cap (reference:
  * core/com/intel/oap/execution/ColumnarSortExec.scala:54-243,
  * docs/limitations.md:13-16); CollectLimit/GlobalLimit/LocalLimit/
  * TakeOrderedAndProject/Range are row fallbacks (docs/operators.md #2,6-12).
  * Spark's SortExec spills and `orderBy().limit(n)` plans as
  * TakeOrderedAndProject — per-partition top-k then a single merge on the
  * driver of k·numPartitions rows, the right shape at 100 TB (never a full
  * global sort for a top-k).
  */
object SortLimit {

  /** Global sort (RangePartitioning exchange + per-partition sort). */
  val sortGlobal = QueryDef(
    "q_sort_global",
    (spark, dir) => {
      Tables(spark, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
    },
    Some("""
      SELECT c_custkey, c_acctbal, c_nationkey
      FROM customer ORDER BY c_acctbal DESC, c_custkey"""))

  /** Top-k: orderBy + limit → TakeOrderedAndProject, not a global sort. */
  val topK = QueryDef(
    "q_topk",
    (spark, dir) => {
      Tables(spark, dir, "part")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .limit(100)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
    },
    Some("""
      SELECT p_partkey, p_name, p_retailprice
      FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 100"""))

  /** LIMIT without order — row content nondeterministic, so only the count
    * is asserted (CollectLimit/GlobalLimit/LocalLimit semantics). */
  val limitCount = QueryDef.sqlSame(
    "q_limit_count",
    "SELECT count(*) AS n FROM (SELECT * FROM lineitem LIMIT 1000)")

  /** Range source (RangeExec fallback in the reference, docs/operators.md #10). */
  val rangeSource = QueryDef(
    "q_range_source",
    (spark, dir) => {
      spark.range(0L, 1000000L, 7L)
        .agg(
          sum(col("id")).as("sum_id"),
          count(lit(1)).as("n"),
          min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
    },
    Some("""
      SELECT CAST(sum(range) AS BIGINT) AS sum_id, count(*) AS n,
             min(range) AS min_id, max(range) AS max_id
      FROM range(0, 1000000, 7)"""))

  /** explode/posexplode (GenerateExec fallback in the reference,
    * docs/operators.md #6) — lateral view over a split() array. */
  val generate = QueryDef(
    "q_generate_explode",
    (spark, dir) => {
      Tables(spark, dir, "part")
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), sum(col("pos").cast("long")).as("sum_pos"))
    },
    Some("""
      SELECT word, count(*) AS n, CAST(sum(pos) AS BIGINT) AS sum_pos
      FROM (SELECT unnest(str_split(p_name, ' ')) AS word,
                   unnest(range(len(str_split(p_name, ' ')))) AS pos
            FROM part)
      GROUP BY word"""))

  /** Custom Generator (graft.functions.WordChunks): context-window chunking
    * of documents into 8-word pieces — the UDTF extension surface the
    * reference lacks (GenerateExec is always a row fallback there). */
  val generateChunks = QueryDef(
    "q_generate_chunks",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          expr("word_chunks(text, 8)").as(Seq("chunk_idx", "chunk")))
    },
    Some("""
      SELECT doc_id, CAST(generate_subscripts(chunks, 1) AS INT) AS chunk_idx,
             unnest(chunks) AS chunk
      FROM (SELECT doc_id,
                   list_transform(
                     range(CAST(ceil(len(parts) / 8.0) AS BIGINT)),
                     i -> array_to_string(parts[i*8+1 : i*8+8], ' ')) AS chunks
            FROM (SELECT doc_id, str_split(text, ' ') AS parts
                  FROM documents))"""))

  /** Sliding-window chunking — word_chunks with a stride smaller than the
    * window: consecutive chunks overlap by n - stride words (the training
    * context-window overlap). Windows start at every stride multiple below
    * the word count; the tail windows are ragged. */
  val generateChunksOverlap = QueryDef(
    "q_generate_chunks_overlap",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          expr("word_chunks(text, 8, 4)").as(Seq("chunk_idx", "chunk")))
    },
    Some("""
      SELECT doc_id, CAST(generate_subscripts(chunks, 1) AS INT) AS chunk_idx,
             unnest(chunks) AS chunk
      FROM (SELECT doc_id,
                   list_transform(
                     range((len(parts) + 3) // 4),
                     i -> array_to_string(parts[i*4+1 : i*4+8], ' '))
                     AS chunks
            FROM (SELECT doc_id, str_split(text, ' ') AS parts
                  FROM documents))"""))

  /** Per-GROUP top-k via the custom physical operator
    * (graft.plans.TopKPerGroupExec — logical node + SparkStrategy +
    * UnaryExecNode with its own doExecute; SURVEY §7 step (c) machinery in
    * full): one hash shuffle, bounded per-group heaps, O(n log k) instead
    * of the window formulation's full per-group sort. The oracle is that
    * exact window formulation. */
  val topKPerGroup = QueryDef(
    "q_topk_per_group",
    (spark, dir) => {
      graft.ops.topKPerGroup(
        Tables(spark, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("o_totalprice")),
        Seq("o_orderpriority"), "o_totalprice", "o_orderkey", k = 3)
    },
    Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey)
                 AS rn
        FROM orders) WHERE rn <= 3"""))

  val all: Seq[QueryDef] =
    Seq(sortGlobal, topK, limitCount, rangeSource, generate, generateChunks,
      generateChunksOverlap, topKPerGroup)
}
