package graft

import org.apache.spark.sql.functions._

/** Space-Saving guarantees for `freq_sketch` (graft.functions.FreqSketch):
  * every item with true frequency > n/k is present, estimates bound the
  * true count from above, and the sketch shuffles at most k counters per
  * group however the input is partitioned. */
class FreqSketchSpec extends GraftSpecBase {

  private val sp = spark
  import sp.implicits._

  // skewed synthetic stream: item "hh_i" appears (200 - 10i) times for
  // i in 0..9 (heavy), plus 500 singletons (tail noise)
  private lazy val df = {
    val heavy = (0 until 10).flatMap(i => Seq.fill(200 - 10 * i)(s"hh_$i"))
    val tail = (0 until 500).map(i => s"tail_$i")
    val rnd = new scala.util.Random(7)
    sp.sparkContext.parallelize(
      rnd.shuffle((heavy ++ tail).toVector), 8).toDF("item")
  }

  private lazy val sketch: Map[String, Long] =
    df.agg(expr("freq_sketch(item, 64)").as("s"))
      .head.getMap[String, Long](0).toMap

  test("every heavy hitter above n/k survives") {
    val n = df.count()
    val threshold = n / 64
    val trueCounts = df.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mustHave = trueCounts.filter(_._2 > threshold).keySet
    assert(mustHave.nonEmpty, "fixture needs heavy hitters")
    val missing = mustHave -- sketch.keySet
    assert(missing.isEmpty, s"guaranteed items missing: $missing")
  }

  test("estimates never undercount and overcount by at most n/k") {
    val n = df.count()
    val trueCounts = df.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch.foreach { case (item, est) =>
      val truth = trueCounts(item)
      assert(est >= truth, s"$item undercounted: $est < $truth")
      assert(est - truth <= n / 64,
        s"$item overcounted beyond bound: $est vs $truth")
    }
  }

  test("sketch size is capped at k") {
    assert(sketch.size <= 64)
    val small = df.agg(expr("freq_sketch(item, 8)").as("s"))
      .head.getMap[String, Long](0)
    assert(small.size <= 8)
  }

  test("grouped sketches aggregate independently") {
    val grouped = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "item")
      .groupBy("g").agg(expr("freq_sketch(item, 4)").as("s"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap)
      .toMap
    assert(grouped("a") == Map("x" -> 2L, "y" -> 1L))
    assert(grouped("b") == Map("z" -> 1L))
  }
}
