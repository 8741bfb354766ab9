package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, SparkPlan}
import org.apache.spark.sql.types._

/** Session-extensions entry point, mirroring the reference's attachment shape
  * (`spark.sql.extensions=com.intel.oap.ColumnarPlugin`, reference:
  * native-sql-engine/core/src/main/scala/com/intel/oap/ColumnarPlugin.scala:387-394,
  * which calls `injectColumnar(session => ColumnarOverrideRules(session))`).
  *
  * Our engine needs no physical-operator replacement — Catalyst + Tungsten IS
  * the execution engine — so the injected [[ColumnarRule]] is observability
  * only: it walks the physical plan and logs which nodes the reference's
  * `ColumnarGuardRule` would have row-guarded (unsupported types), i.e. where
  * Gazelle would lose its columnar speedup and we don't. This is the mount
  * point for any future custom Rule/Strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectColumnar(_ => GraftCapabilityAudit)
    ext.injectResolutionRule(_ => ResolveCosineTopK)
    ext.injectPlannerStrategy(_ => GraftStrategies)
    GraftFunctions.register(ext)
  }
}

/** SQL-callable registrations for the custom vector expressions
  * (graft.functions.VectorFunctions) — usable from both `expr(...)` and
  * `spark.sql(...)`. */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.{CosineSim, FreqSketch, KllMerge, KllQuantile, KllState, KmvDistinct, KmvIntersect, KmvJaccard, KmvMerge, KmvState, LenPolyHash, MinHashSig, QuantizeI8, SignProjection, SimHash64, TokenSetCount, UnicodeNormKernel, UnicodeNormalize, VecDot, VecDotI8, WordChunks, WordNgrams, ZValue}
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  /** All registrations as (name, info, builder) triples so both the
    * extensions path and the defensive per-session path share one list. */
  private def entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float vectors"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(col) - approximate distinct count (KMV sketch, k=512)"),
      (args: Seq[Expression]) => KmvDistinct(args.head)),
    (FunctionIdentifier("kmv_distinct_det"),
      info("kmv_distinct_det",
        "kmv_distinct_det(strCol[, k]) - approximate distinct count from a " +
          "DETERMINISTIC md5-derived 48-bit hash (oracle-replayable in any " +
          "ANSI engine); child must be string"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvDistinct(c, det = true)
        case Seq(c, Literal(k: Int, _)) => KmvDistinct(c, k, det = true)
        case _ => throw new IllegalArgumentException(
          "kmv_distinct_det(strCol[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_state_det"),
      info("kmv_state_det",
        "kmv_state_det(strCol[, k]) - mergeable KMV sketch STATE over the " +
          "deterministic md5-derived 48-bit hash"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvState(c, det = true)
        case Seq(c, Literal(k: Int, _)) => KmvState(c, k, det = true)
        case _ => throw new IllegalArgumentException(
          "kmv_state_det(strCol[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_merge_det"),
      info("kmv_merge_det",
        "kmv_merge_det(state[, k]) - distinct estimate from merged " +
          "kmv_state_det columns (integer-division estimator)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvMerge(c, det = true)
        case Seq(c, Literal(k: Int, _)) => KmvMerge(c, k, det = true)
        case _ => throw new IllegalArgumentException(
          "kmv_merge_det(state[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_state"),
      info("kmv_state",
        "kmv_state(col[, k]) - mergeable KMV sketch STATE (binary) for " +
          "materialized sketch tables"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvState(c)
        case Seq(c, Literal(k: Int, _)) => KmvState(c, k)
        case _ => throw new IllegalArgumentException(
          "kmv_state(col[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_merge"),
      info("kmv_merge",
        "kmv_merge(state[, k]) - distinct estimate from merged kmv_state " +
          "columns (no raw re-scan)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvMerge(c)
        case Seq(c, Literal(k: Int, _)) => KmvMerge(c, k)
        case _ => throw new IllegalArgumentException(
          "kmv_merge(state[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_merge_state"),
      info("kmv_merge_state",
        "kmv_merge_state(state[, k]) - merged, further-mergeable sketch " +
          "state (rollup hierarchies: day -> month -> quarter)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvMerge(c, asState = true)
        case Seq(c, Literal(k: Int, _)) => KmvMerge(c, k, asState = true)
        case _ => throw new IllegalArgumentException(
          "kmv_merge_state(state[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_jaccard"),
      info("kmv_jaccard",
        "kmv_jaccard(stateA, stateB[, k]) - Jaccard similarity estimate " +
          "from two kmv_state sketches (Beyer et al. 2007)"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => KmvJaccard(a, b)
        case Seq(a, b, Literal(k: Int, _)) => KmvJaccard(a, b, k)
        case _ => throw new IllegalArgumentException(
          "kmv_jaccard(stateA, stateB[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_intersect"),
      info("kmv_intersect",
        "kmv_intersect(stateA, stateB[, k]) - intersection cardinality " +
          "estimate from two kmv_state sketches"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => KmvIntersect(a, b)
        case Seq(a, b, Literal(k: Int, _)) => KmvIntersect(a, b, k)
        case _ => throw new IllegalArgumentException(
          "kmv_intersect(stateA, stateB[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kmv_intersect_det"),
      info("kmv_intersect_det",
        "kmv_intersect_det(stateA, stateB[, k]) - intersection cardinality " +
          "estimate from two kmv_state_det sketches (deterministic " +
          "48-bit integer-division union estimator)"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => KmvIntersect(a, b, det = true)
        case Seq(a, b, Literal(k: Int, _)) => KmvIntersect(a, b, k, det = true)
        case _ => throw new IllegalArgumentException(
          "kmv_intersect_det(stateA, stateB[, k]) requires a literal k")
      }),
    (FunctionIdentifier("freq_sketch"),
      info("freq_sketch",
        "freq_sketch(col[, k]) - approximate top-k item frequencies (Space-Saving)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => FreqSketch(c)
        case Seq(c, Literal(k: Int, _)) => FreqSketch(c, k)
        case _ => throw new IllegalArgumentException(
          "freq_sketch(col[, k]) requires a literal k")
      }),
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(longCol, items, bits) - Bloom-filter binary over a " +
          "long column (Spark's sketch, exposed for set-membership " +
          "prefilters)"),
      (args: Seq[Expression]) => args match {
        case Seq(c, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, items, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_agg(longCol, estimatedItems, numBits)")
      }),
    (FunctionIdentifier("bloom_contains"),
      info("bloom_contains",
        "bloom_contains(bloomBinary, longCol) - membership probe; false " +
          "means DEFINITELY absent"),
      (args: Seq[Expression]) => args match {
        case Seq(bloom, v) =>
          org.apache.spark.sql.catalyst.expressions
            .BloomFilterMightContain(bloom, v)
        case _ => throw new IllegalArgumentException(
          "bloom_contains(bloomBinary, longCol)")
      }),
    (FunctionIdentifier("sign_proj"),
      info("sign_proj",
        "sign_proj(vec[, nbits]) - sign-random-projection LSH bucket id"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => SignProjection(v, 6)
        case Seq(v, Literal(n: Int, _)) => SignProjection(v, n)
        case _ => throw new IllegalArgumentException(
          "sign_proj(vec[, nbits]) requires a literal nbits")
      }),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(shingles[, k]) - k-permutation MinHash signature (default 32)"),
      (args: Seq[Expression]) => args match {
        case Seq(shingles) => MinHashSig(shingles)
        case Seq(shingles, Literal(k: Int, _)) => MinHashSig(shingles, k)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(shingles[, k]) requires a literal k")
      }),
    (FunctionIdentifier("word_ngrams"),
      info("word_ngrams",
        "word_ngrams(tokens, n) - distinct word n-grams, insertion-ordered"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => WordNgrams(tokens, 3)
        case Seq(tokens, Literal(n: Int, _)) => WordNgrams(tokens, n)
        case _ => throw new IllegalArgumentException(
          "word_ngrams(tokens[, n]) requires a literal n")
      }),
    (FunctionIdentifier("kll_quantile"),
      info("kll_quantile",
        "kll_quantile(col, q[, k]) - approximate quantile (KLL sketch)"),
      (args: Seq[Expression]) => {
        // SQL `0.5` parses as a Decimal literal, `0.5D` as Double
        def qOf(e: Expression): Double = e match {
          case Literal(q: Double, _) => q
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case Literal(i: Int, _) => i.toDouble
          case Literal(l: Long, _) => l.toDouble
          case other => throw new IllegalArgumentException(
            s"kll_quantile: q must be a numeric literal, got $other")
        }
        args match {
          case Seq(c, qe) => KllQuantile(c, qOf(qe))
          case Seq(c, qe, Literal(k: Int, _)) => KllQuantile(c, qOf(qe), k)
          case _ => throw new IllegalArgumentException(
            "kll_quantile(col, q[, k]) requires literal q (and k)")
        }
      }),
    (FunctionIdentifier("kll_state"),
      info("kll_state",
        "kll_state(col[, k]) - mergeable KLL quantile-sketch STATE " +
          "(binary) for materialized rollup tables"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KllState(c)
        case Seq(c, Literal(k: Int, _)) => KllState(c, k)
        case _ => throw new IllegalArgumentException(
          "kll_state(col[, k]) requires a literal k")
      }),
    (FunctionIdentifier("kll_merge"),
      info("kll_merge",
        "kll_merge(state, q[, k]) - quantile from merged kll_state columns"),
      (args: Seq[Expression]) => {
        def qOf(e: Expression): Double = e match {
          case Literal(q: Double, _) => q
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case Literal(i: Int, _) => i.toDouble
          case Literal(l: Long, _) => l.toDouble
          case other => throw new IllegalArgumentException(
            s"kll_merge: q must be a numeric literal, got $other")
        }
        args match {
          case Seq(c, qe) => KllMerge(c, qOf(qe))
          case Seq(c, qe, Literal(k: Int, _)) => KllMerge(c, qOf(qe), k)
          case _ => throw new IllegalArgumentException(
            "kll_merge(state, q[, k]) requires literal q (and k)")
        }
      }),
    (FunctionIdentifier("kll_merge_state"),
      info("kll_merge_state",
        "kll_merge_state(state[, k]) - merged kll_state binary for a " +
          "further rollup level"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KllMerge(c, 0.5, emitState = true)
        case Seq(c, Literal(k: Int, _)) => KllMerge(c, 0.5, k, emitState = true)
        case _ => throw new IllegalArgumentException(
          "kll_merge_state(state[, k]) requires a literal k")
      }),
    (FunctionIdentifier("quantize_i8"),
      info("quantize_i8",
        "quantize_i8(vec) - symmetric per-vector int8 quantization"),
      (args: Seq[Expression]) => QuantizeI8(args.head)),
    (FunctionIdentifier("vec_dot_i8"),
      info("vec_dot_i8",
        "vec_dot_i8(a, b) - exact integer dot product of int8 vectors"),
      (args: Seq[Expression]) => VecDotI8(args(0), args(1))),
    (FunctionIdentifier("count_in_set"),
      info("count_in_set",
        "count_in_set(tokens, 'w1,w2,...') - tokens matching a fixed word set"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens, Literal(csv, StringType)) =>
          TokenSetCount(tokens, csv.toString.split(",").toSeq)
        case _ => throw new IllegalArgumentException(
          "count_in_set(tokens, csv) requires a literal csv word list")
      }),
    (FunctionIdentifier("len_poly_hash"),
      info("len_poly_hash",
        "len_poly_hash(tokens) - rolling polynomial hash of token lengths"),
      (args: Seq[Expression]) => LenPolyHash(args.head)),
    (FunctionIdentifier("zvalue"),
      info("zvalue",
        "zvalue(c0, c1, ..., bits) - Morton (Z-order) bit-interleave of " +
          "bucketized integral columns into one BIGINT layout sort key"),
      (args: Seq[Expression]) => args match {
        case init :+ Literal(bits: Int, _) if init.nonEmpty =>
          ZValue(init, bits)
        case _ => throw new IllegalArgumentException(
          "zvalue(cols..., bits) requires >=1 column and a literal bits")
      }),
    (FunctionIdentifier("unicode_norm"),
      info("unicode_norm",
        "unicode_norm(str, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode-normalized " +
          "copy (zero-copy identity on pure-ASCII input)"),
      (args: Seq[Expression]) => args match {
        case Seq(s, Literal(f, StringType)) =>
          UnicodeNormalize(s, UnicodeNormKernel.formOrdinal(f.toString))
        case _ => throw new IllegalArgumentException(
          "unicode_norm(str, form) requires a literal form name")
      }),
    (FunctionIdentifier("word_chunks"),
      info("word_chunks",
        "word_chunks(text, n[, stride]) - generator: (chunk_idx, chunk) " +
          "rows of n words, windows sliding by stride (overlap = n - stride)"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => WordChunks(text, 8)
        case Seq(text, Literal(n: Int, _)) => WordChunks(text, n)
        case Seq(text, Literal(n: Int, _), Literal(st: Int, _)) =>
          WordChunks(text, n, st)
        case _ => throw new IllegalArgumentException(
          "word_chunks(text[, n[, stride]]) requires literal n and stride")
      }))

  /** Defensive path: make a session built without GraftExtensions (e.g. the
    * driver's own smoke-test session) able to run every registry query —
    * register the graft functions and set the read confs Engine.configure
    * would have set (events.parquet carries TIMESTAMP(NANOS); the fixture
    * timestamps must load as session-TZ timestamps). Idempotent. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.graft.Bridge.functionRegistry(spark)
    entries.foreach { case (id, inf, builder) =>
      if (!reg.functionExists(id)) {
        reg.registerFunction(id, inf, builder)
      }
    }
    org.apache.spark.sql.graft.Bridge.ensureStrategy(spark, GraftStrategies)
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    } catch { case _: Throwable => () } // read-only conf in exotic setups
  }

  def register(ext: SparkSessionExtensions): Unit =
    entries.foreach(ext.injectFunction)
}

/** Capability metadata mirroring `ConverterUtils.checkIfTypeSupported`
  * (reference: core/com/intel/oap/expression/ConverterUtils.scala:494-508).
  * The reference supports exactly these scalar types columnar-side; everything
  * else (ARRAY/MAP/STRUCT/BINARY/NULL/UDT) falls back to row execution.
  * We support all Catalyst types natively — the audit only records where the
  * reference would have degraded.
  */
object GraftCapability {
  val referenceColumnarTypes: Set[DataType] = Set(
    BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType, DateType, TimestampType)

  def referenceSupports(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case t => referenceColumnarTypes.contains(t)
  }
}

object GraftCapabilityAudit extends ColumnarRule with Logging {
  override def preColumnarTransitions: Rule[SparkPlan] = plan => {
    if (log.isDebugEnabled) {
      plan.foreach { node =>
        val unsupported = node.output
          .map(_.dataType)
          .filterNot(GraftCapability.referenceSupports)
          .distinct
        if (unsupported.nonEmpty) {
          logDebug(
            s"[graft] ${node.nodeName} would row-fallback in the reference " +
              s"(types: ${unsupported.mkString(", ")}); native here.")
        }
      }
    }
    ScaleGuard.findings(plan).foreach(f => logWarning(s"[graft scale] $f"))
    plan
  }
}

/** Static scale audit: flags the plan shapes that are fine on a test
  * fixture but become cluster-killers at 100 TB. Advisory only (logged as
  * warnings by [[GraftCapabilityAudit]]) — a global window or a labeled
  * cross join can be deliberate (`q_window_ntile`, the brute-force near-dup
  * baseline) — but every occurrence should be a choice, not an accident. */
object ScaleGuard {
  import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
  import org.apache.spark.sql.execution.window.WindowExec

  def findings(plan: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach {
      // AQE wraps the real operators; audit the current inner plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        out ++= findings(a.executedPlan)
      case c: CartesianProductExec =>
        out += s"CartesianProduct: O(|L|*|R|) row pairing " +
          s"(${c.left.nodeName} x ${c.right.nodeName}) - bucketize or " +
          "block the join key (ops.rangeBucketJoin, LSH buckets)"
      case b: BroadcastNestedLoopJoinExec =>
        out += s"BroadcastNestedLoopJoin(${b.joinType}): per-row scan of " +
          "the broadcast side - rewrite the predicate to an equi-join " +
          "component if possible"
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += "Window with empty PARTITION BY: the whole input serializes " +
          "through ONE task - partition the window or pre-aggregate"
      case _ =>
    }
    out.result()
  }
}
