package graft

import org.apache.spark.sql.functions._

/** Parity and semantics checks for the native hash kernels
  * (graft.functions.HashKernels): the kernels must agree with the
  * equivalent higher-order-function formulations they replaced. */
class HashKernelsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  private def docs = Tables(sp, sfDir, "documents").limit(50)
    .select(col("doc_id"), split(col("text"), " ").as("toks"))

  test("simhash64 kernel is bit-identical to the HOF formulation") {
    val both = docs.select(
      col("doc_id"),
      expr("simhash64(toks)").as("kernel"),
      expr(
        """aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
             acc + if(
               aggregate(toks, 0, (s, t) ->
                 s + if((shiftright(xxhash64(t), i) & cast(1 as bigint)) = 1,
                        1, -1)) > 0,
               shiftleft(cast(1 as bigint), i), cast(0 as bigint)))""")
        .as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("word_ngrams kernel equals distinct transform-based shingles as a set") {
    val both = docs.select(
      expr("word_ngrams(toks, 3)").as("kernel"),
      array_distinct(transform(sequence(lit(0), size(col("toks")) - 3), i =>
        concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
        .as("hof")).as[(Seq[String], Seq[String])].collect()
    both.foreach { case (k, h) => assert(k.toSet == h.toSet && k.size == h.size) }
  }

  test("word_ngrams handles short arrays (fewer tokens than n)") {
    val r = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(expr("word_ngrams(toks, 3)").as("g"))
      .as[Seq[String]].head
    assert(r.isEmpty)
  }

  test("minhash_sig signature agreement estimates jaccard") {
    // identical arrays → identical signatures; disjoint → (almost) none equal
    val r = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("a b c", "b c d", "c d e")),
      (Seq("a b c", "b c d"), Seq("x y z", "y z w")))
      .toDF("ga", "gb")
      .select(expr("minhash_sig(ga)").as("sa"), expr("minhash_sig(gb)").as("sb"))
      .select(aggregate(zip_with(col("sa"), col("sb"),
        (p, q) => when(p === q, 1).otherwise(0)), lit(0), _ + _).as("agree"))
      .as[Int].collect()
    assert(r(0) == 32, "identical sets must agree on all 32 permutations")
    assert(r(1) <= 2, s"disjoint sets should rarely agree, got ${r(1)}")
  }

  test("len_poly_hash kernel is bit-identical to the HOF formulation") {
    val pairs = docs.select(
      expr("len_poly_hash(toks)").as("k"),
      aggregate(col("toks"), lit(0L),
        (acc, t) => (acc * 31L + length(t)) % 1000000007L).as("h"))
      .collect()
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("count_in_set kernel is bit-identical to the filter(isin) HOF") {
    val words = Seq("the", "a", "of", "and", "to", "in", "is")
    val both = docs.select(
      col("doc_id"),
      expr(s"count_in_set(toks, '${words.mkString(",")}')").as("kernel"),
      size(filter(col("toks"), t => t.isin(words.map(x => x: Any): _*)))
        .cast("long").as("hof")).collect()
    assert(both.nonEmpty)
    assert(both.exists(_.getLong(1) > 0), "fixture must exercise the set")
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.get(0)}"))
  }

  test("count_in_set codegen and interpreted modes agree") {
    def run() = docs
      .select(expr("count_in_set(toks, 'the,of')")).collect().map(_.getLong(0))
    val expected = run()
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(expected.toSeq == run().toSeq)
    finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("kernel codegen and interpreted modes agree") {
    val expected = docs.select(expr("simhash64(toks)")).collect().map(_.getLong(0))
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = docs.select(expr("simhash64(toks)")).collect().map(_.getLong(0))
      assert(expected.toSeq == interp.toSeq)
    } finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
