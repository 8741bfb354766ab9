package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TestSpark.spark.implicits._

/** KMV set algebra (kmv_jaccard / kmv_intersect over kmv_state sketches):
  * exactness below saturation, Beyer-estimator error bounds above it,
  * symmetry, and the disjoint / identical edges. */
class KmvSetSpec extends GraftSpecBase {

  private def states(a: Seq[Long], b: Seq[Long]): DataFrame = {
    plans.GraftFunctions.ensureRegistered(spark)
    val da = a.toDF("v").agg(expr("kmv_state(v)").as("st_a"))
    val db = b.toDF("v").agg(expr("kmv_state(v)").as("st_b"))
    da.crossJoin(db)
  }

  private def jaccard(a: Seq[Long], b: Seq[Long]): Double =
    states(a, b).select(expr("kmv_jaccard(st_a, st_b)")).head.getDouble(0)

  private def intersect(a: Seq[Long], b: Seq[Long]): Long =
    states(a, b).select(expr("kmv_intersect(st_a, st_b)")).head.getLong(0)

  test("identical unsaturated sets: jaccard exactly 1.0, intersect exact") {
    val s = (0L until 300L)
    assert(jaccard(s, s) == 1.0)
    assert(intersect(s, s) == 300L)
  }

  test("disjoint sets: jaccard exactly 0.0, intersect 0") {
    val a = (0L until 300L)
    val b = (1000L until 1300L)
    assert(jaccard(a, b) == 0.0)
    assert(intersect(a, b) == 0L)
  }

  test("unsaturated overlap is exact (sketch IS the hash set below k)") {
    val a = (0L until 300L)
    val b = (150L until 450L) // inter 150, union 450
    assert(math.abs(jaccard(a, b) - 150.0 / 450.0) < 1e-12)
    assert(intersect(a, b) == 150L)
  }

  test("saturated estimate within 15% (k=512, 3000-element sets)") {
    val a = (0L until 3000L)
    val b = (1500L until 4500L) // inter 1500, union 4500, J = 1/3
    val j = jaccard(a, b)
    assert(math.abs(j - 1.0 / 3.0) < 0.05, s"jaccard est $j vs 0.3333")
    val i = intersect(a, b)
    assert(math.abs(i - 1500.0) / 1500.0 < 0.15, s"intersect est $i vs 1500")
  }

  test("symmetry: jaccard(a,b) == jaccard(b,a)") {
    val a = (0L until 2000L)
    val b = (500L until 2500L)
    assert(jaccard(a, b) == jaccard(b, a))
  }

  test("type check rejects non-binary inputs at analysis time") {
    plans.GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      Seq(1L).toDF("v").select(expr("kmv_jaccard(v, v)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"))
  }
}
