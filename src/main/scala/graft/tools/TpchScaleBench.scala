package graft.tools

import graft.Engine
import graft.operators.TpchVerbatim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaled run of the 22 VERBATIM TPC-H texts — the measurement VERDICT
  * r12 prescribed to close the fixture-scale 2× gate breach (the TPC-H
  * section read 2.14× DuckDB at sub-second fixture scale, where every gap
  * is Spark's per-query scheduling/AQE floor, not a plan defect; the
  * claim that the pinned plans amortize needed to become a measurement).
  *
  * Mechanics:
  *   - replicates orders+lineitem `factor`× into a scratch dir with
  *     shifted o_orderkey (the ScaleSmoke pattern — the verbatim fixture
  *     is PARAMETRIC in the base facts: every derived attribute is mod
  *     arithmetic on the keys, so replicas get distinct attribute values
  *     and full referential integrity, while the dims stay at their
  *     spec-shaped caps and every literal predicate keeps hitting);
  *   - materializes the fixture through the normal
  *     [[TpchVerbatim.fixtureSession]] (ANALYZE + CBO + the shared
  *     small-fixture profile, which self-releases above
  *     [[Engine.smallFactRows]] so the scaled run keeps cores-wide
  *     shuffles);
  *   - times all 22 texts min-of-3 warm and prints one JSON line plus
  *     the materialized fixture root, which tools/tpch_scale_duck.py
  *     feeds to DuckDB so BOTH engines are timed over byte-identical
  *     parquet.
  *
  * Usage: sbt "runMain graft.tools.TpchScaleBench <factor> [srcDir]"
  *        factor 1 runs over srcDir directly (no scratch build).
  */
object TpchScaleBench {

  private[tools] def buildScratch(spark: SparkSession, factor: Int,
      src: String, out: String): Unit = {
    val done = new java.io.File(out, "_SCRATCH_DONE")
    if (done.exists()) return
    new java.io.File(out).mkdirs()
    val oMax = 10000000L
    Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey").foreach {
      case (t, key) =>
        val base = graft.Tables(spark, src, t)
        (0 until factor).map(i => base.withColumn(key, col(key) + lit(i * oMax)))
          .reduce(_ union _)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // the remaining tables are only read by Tables.registerAll — link them
    Seq("region", "nation", "customer", "supplier", "part", "events",
      "documents", "embeddings").foreach { t =>
      val link = java.nio.file.Paths.get(s"$out/$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(s"$src/$t.parquet"))
    }
    done.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(30)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = if (factor == 1) src else {
      val out = s"/tmp/graft_tpch_scale_x$factor"
      buildScratch(spark, factor, src, out)
      out
    }
    val t0 = System.nanoTime()
    val session = TpchVerbatim.fixtureSession(spark, dir)
    println(f"[tpch-scale x$factor] fixture ready in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs  " +
      s"root=${TpchVerbatim.fixtureRoot(dir).getPath}  " +
      s"shufflePartitions=${session.conf.get("spark.sql.shuffle.partitions")}")

    val sigDir = java.nio.file.Paths.get(
      "src/test/resources/plan-signatures")
    val times = TpchVerbatim.queryNames.map { q =>
      val dts = (1 to 3).map { _ =>
        val start = System.nanoTime()
        val n = session.sql(TpchVerbatim.queryText(q)).count()
        ((System.nanoTime() - start) / 1e9, n)
      }
      // the gate's claim is "the pinned fixture-scale plans amortize" —
      // so pin that the SCALED run executes the same plan shape as the
      // committed sub-second-scale signature (stats differ 30x, CBO and
      // AQE re-decide everything; sameness here is a finding, not a given)
      val sig = PlanSignature.executedSignature(
        session.sql(TpchVerbatim.queryText(q)))
      val pinFile = sigDir.resolve(s"q_tpch_verbatim_$q.sig")
      val pin =
        if (java.nio.file.Files.exists(pinFile))
          if (java.nio.file.Files.readString(pinFile) == sig) "plan=PINNED"
          else "plan=DIFFERS-FROM-PIN"
        else "plan=NO-PIN-FILE"
      spark.catalog.clearCache()
      val (dt, n) = (dts.map(_._1).min, dts.head._2)
      println(f"[tpch-scale x$factor] $q%-6s rows=$n%-9d ${dt}%.3fs  $pin")
      q -> dt
    }
    val total = times.map(_._2).sum
    println(s"""{"metric":"tpch_verbatim_x$factor","value":${f"$total%.3f"},""" +
      s""""unit":"sec","factor":$factor,"fixtureRoot":""" +
      s""""${TpchVerbatim.fixtureRoot(dir).getPath}","queries":{""" +
      times.map { case (q, t) => s""""$q":${f"$t%.3f"}""" }.mkString(",") +
      "}}")
    spark.stop()
  }
}
