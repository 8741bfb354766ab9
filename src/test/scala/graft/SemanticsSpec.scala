package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-semantics pins the reference works hard to match and we get
  * natively: NaN ordering/equality (Gazelle guards these behind
  * `spark.oap.sql.columnar.nanCheck`, ColumnarPluginConfig.scala:92-93 and
  * NaN-aware comparison variants in ColumnarBinaryOperator.scala:182-410),
  * null ordering in sorts, null keys in joins/aggregations, and map-type
  * round-trips (nested types are fallback-only in the reference). */
class SemanticsSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  private def nanDf = {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    sp.createDataFrame(
      sp.sparkContext.parallelize(Seq(
        Row("a", 1.0), Row("b", Double.NaN), Row("c", Double.NaN),
        Row("d", Double.PositiveInfinity), Row("e", null))),
      schema)
  }

  test("NaN sorts greater than +Infinity, nulls first by default") {
    val order = nanDf.orderBy(col("v")).select(col("k"))
      .collect().map(_.getString(0)).toSeq
    assert(order == Seq("e", "a", "d", "b", "c"))
  }

  test("NaN equals NaN in groupBy (normalized key)") {
    val n = nanDf.groupBy(col("v")).count()
      .filter(isnan(col("v"))).select(col("count")).head.getLong(0)
    assert(n == 2L, "both NaN rows must land in one group")
  }

  test("NaN joins NaN on equi-keys") {
    val joined = nanDf.as("l").join(nanDf.as("r"), col("l.v") === col("r.v"))
    // 2 NaN rows × 2 NaN rows = 4 pairs; 1.0 and Inf self-pairs = 2; null never joins
    assert(joined.count() == 6)
  }

  test("null keys aggregate into one group and never equi-join") {
    assert(nanDf.groupBy(col("v")).count().count() == 4) // 1.0, NaN, Inf, null
    val j = nanDf.as("l").join(nanDf.as("r"),
      col("l.v") === col("r.v")).filter(col("l.v").isNull)
    assert(j.count() == 0)
  }

  test("nulls last with explicit desc_nulls_last") {
    val order = nanDf.orderBy(col("v").desc_nulls_last).select(col("k"))
      .collect().map(_.getString(0)).toSeq
    assert(order.take(2).toSet == Set("b", "c") && order.last == "e")
  }

  test("map type round-trips through shuffle and collect") {
    val m = Seq((1, Map("a" -> 1, "b" -> 2)), (2, Map("c" -> 3)))
      .toDF("id", "m")
    val back = m.repartition(3, col("id"))
      .select(col("id"), map_values(col("m")).as("vals"))
      .select(col("id"), aggregate(col("vals"), lit(0), _ + _).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(back == Map(1 -> 3, 2 -> 3))
  }

  test("struct columns group and sort correctly") {
    val s = Seq((1, "x", 2.0), (1, "x", 3.0), (2, "y", 4.0))
      .toDF("a", "b", "v")
      .select(struct(col("a"), col("b")).as("key"), col("v"))
      .groupBy(col("key")).agg(sum(col("v")).as("sv"))
      .orderBy(col("key"))
      .collect().map(r => (r.getStruct(0).getInt(0), r.getDouble(1))).toSeq
    assert(s == Seq((1, 5.0), (2, 4.0)))
  }

  // ANSI error surface: the reference's golden files pin error OUTPUTS as
  // well as results (sql-tests/results/ansi/*.sql.out). Registry queries
  // must succeed, so the error-class contract is pinned here instead:
  // each canonical misuse raises the documented condition, not a wrong
  // answer and not some other error.
  private def errorClassOf(sql: String): String = {
    val e = intercept[Exception](spark.sql(sql).collect())
    def cond(t: Throwable): Option[String] = t match {
      case st: org.apache.spark.SparkThrowable
          if st.getCondition != null => Some(st.getCondition)
      case _ if t.getCause != null && (t.getCause ne t) => cond(t.getCause)
      case _ => None
    }
    cond(e).getOrElse(fail(s"no error condition on ${e.getClass}: ${e.getMessage}"))
  }

  test("ANSI error classes: the canonical misuses raise their documented conditions") {
    assert(errorClassOf("SELECT 1/0") == "DIVIDE_BY_ZERO")
    assert(errorClassOf("SELECT CAST('x' AS INT)") == "CAST_INVALID_INPUT")
    assert(errorClassOf("SELECT 2147483647 + 1") == "ARITHMETIC_OVERFLOW")
    assert(errorClassOf("SELECT array(1,2)[5]") == "INVALID_ARRAY_INDEX")
    assert(errorClassOf("SELECT element_at(array(1,2), 5)")
      == "INVALID_ARRAY_INDEX_IN_ELEMENT_AT")
    assert(errorClassOf("SELECT CAST(1e10 AS DECIMAL(5,2))")
      .startsWith("NUMERIC_VALUE_OUT_OF_RANGE"))
    assert(errorClassOf("SELECT to_timestamp('31/99/2015', 'dd/MM/yyyy')")
      .startsWith("CANNOT_PARSE_TIMESTAMP"))
    assert(errorClassOf("SELECT map_concat(map('a',1), map('a',9))")
      == "DUPLICATED_MAP_KEY")
    // and the try_-family siblings swallow exactly these into NULL
    val r = spark.sql(
      """SELECT try_divide(1, 0) a, try_cast('x' AS INT) b,
                try_add(2147483647, 1) c,
                try_element_at(array(1,2), 5) d""").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("TABLESAMPLE REPEATABLE(seed) is deterministic; distinct seeds differ") {
    Tables.registerAll(spark, sfDir)
    def ids(seed: Int) = spark.sql(
      s"""SELECT l_orderkey, l_linenumber
          FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE ($seed)""")
      .collect().map(r => (r.get(0), r.get(1))).toSet
    val a1 = ids(42)
    assert(a1 == ids(42), "same seed must reproduce the identical row set")
    assert(a1.nonEmpty && a1 != ids(43),
      "different seeds should draw different samples")
    // n-ROWS sampling is an exact limit, not probabilistic
    assert(spark.sql(
      "SELECT count(*) FROM lineitem TABLESAMPLE (50 ROWS)")
      .head.getLong(0) == 50L)
  }
}
