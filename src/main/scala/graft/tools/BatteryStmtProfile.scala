package graft.tools

import graft.Engine
import graft.operators.{GoldenCoercion, GoldenPg}

/** Dev probe: per-statement timing of a pg/core battery replay, to find
  * which statements dominate a heavy row. Mirrors GoldenPg.runMatrix but
  * executes each value TC individually (collect per statement). */
object BatteryStmtProfile {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("pg_union")
    val spark0 = Engine.session("battery-stmt-profile")
    spark0.sql("SELECT 1").collect()
    (1 to 2).foreach { run =>
      val spark = spark0.newSession()
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      GoldenPg.registerFixtures(spark)
      val cat = new GoldenPg.PgCatalog
      val (width, stmts) = GoldenCoercion.loadAll(base)
      val times = scala.collection.mutable.Buffer[(String, Double, String)]()
      var planTot = 0.0; var execTot = 0.0
      val w0 = System.nanoTime()
      GoldenCoercion.withConfRestore(spark) {
        stmts.foreach {
          case GoldenCoercion.Stmt(id, "setup", s) =>
            val t0 = System.nanoTime()
            GoldenPg.executeSetup(spark, cat, s)
            times += ((id + " SETUP", (System.nanoTime() - t0) / 1e9, s))
          case GoldenCoercion.Stmt(_, k, _)
              if k.startsWith("err:") || k.startsWith("skip:") => ()
          case GoldenCoercion.Stmt(id, _, stmt) =>
            val t0 = System.nanoTime()
            val df = spark.sql(stmt)
            df.queryExecution.executedPlan // force plan
            val t1 = System.nanoTime()
            df.collect()
            val t2 = System.nanoTime()
            times += ((id, (t2 - t0) / 1e9, stmt))
            planTot += (t1 - t0) / 1e9
            execTot += (t2 - t1) / 1e9
        }
      }
      val wall = (System.nanoTime() - w0) / 1e9
      println(f"base=$base run=$run wall=$wall%.2fs (plan=$planTot%.2fs exec=$execTot%.2fs)")
      if (run == 2) times.sortBy(-_._2).take(12).foreach { case (id, t, s) =>
        println(f"  $t%6.3fs $id%-10s ${s.replaceAll("\\s+", " ").take(110)}")
      }
    }
    spark0.stop()
  }
}
