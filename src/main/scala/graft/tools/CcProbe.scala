package graft.tools

import graft.Engine
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the Dedup.componentLabels edge pre-partition (VERDICT
  * r13 #6): at fixture scale the CC rounds broadcast and the A/B is flat,
  * so the claim "one exchange per round removed when the edge list is the
  * big join side" needs a run where it IS the big side. Builds a synthetic
  * chain graph of `n` nodes (deterministic — spark.range, no randomness),
  * runs componentLabels with and without the pre-partition
  * (GRAFT_CC_PREPART=0 knob in Dedup), and reports wall time + total
  * shuffle-write bytes + stage count per side.
  *
  * Usage: sbt "runMain graft.tools.CcProbe [nNodes] [chainLen]"
  * (the knob is read per-JVM, so run once per side:
  *   GRAFT_CC_PREPART=0 sbt "runMain graft.tools.CcProbe"  — without
  *                      sbt "runMain graft.tools.CcProbe"  — with)
  */
object CcProbe {
  private final class ShuffleStats extends SparkListener {
    var stages = 0
    var shuffleWrite = 0L
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    def reset(): Unit = synchronized { stages = 0; shuffleWrite = 0L }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val chain = args.lift(1).map(_.toLong).getOrElse(512L)
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode =
      if (sys.env.get("GRAFT_CC_PREPART").contains("0")) "NO-prepart"
      else "prepart"
    val stats = new ShuffleStats
    spark.sparkContext.addSparkListener(stats)
    // chains of length `chain`: edge i -> i+1 unless i ends a chain.
    // Diameter = chain, so pointer jumping needs ~log2(chain) rounds.
    val edges = spark.range(n)
      .filter(col("id") % chain =!= (chain - 1))
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val times = (1 to 2).map { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      stats.reset()
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.componentLabels(edges)
      val nLabels = out.select(countDistinct(col("label"))).head.getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cc-probe $mode run$i] n=$n chain=$chain components=$nLabels" +
        f" wall=${dt}%.2fs stages=${stats.stages}" +
        f" shuffleWrite=${stats.shuffleWrite / 1e6}%.1fMB")
      dt
    }
    println(f"[cc-probe $mode] min=${times.min}%.2fs over 2 runs")
    spark.stop()
  }
}
