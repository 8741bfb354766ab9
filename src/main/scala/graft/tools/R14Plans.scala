package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Engine, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Writes `plans/r14/<query>_<tag>.txt` — the `.explain("formatted")` text
  * of each named registry query — as the committed before/after evidence
  * for the round-13 optimization plan claims (run once at the pre-change
  * commit with tag=before and once on the optimized tree with tag=after).
  *
  * Usage: sbt "runMain graft.tools.R14Plans <tag> <query> [query...]"
  */
object R14Plans {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("plans/r14")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val df = q.run(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"[r14plans] wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
