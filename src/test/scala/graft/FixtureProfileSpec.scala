package graft

import graft.operators.{SsbVerbatim, TpcdsVerbatim, TpchVerbatim}

/** Pins the ONE small-fixture session profile (Engine.tuneFixtureSession,
  * VERDICT r12 #6): all three verbatim fixture sessions floor shuffle
  * partitions at 8 when their largest fact is micro-scale, and the floor
  * self-releases above Engine.smallFactRows so the scaled verbatim runs
  * (tools.TpchScaleBench) keep cores-wide parallelism. */
class FixtureProfileSpec extends GraftSpecBase {

  private val key = "spark.sql.shuffle.partitions"

  test("all three verbatim fixture sessions use the shared 8-partition " +
    "floor at micro-fixture scale") {
    val sessions = Seq(
      "tpch" -> TpchVerbatim.fixtureSession(spark, sfDir),
      "tpcds" -> TpcdsVerbatim.fixtureSession(spark, sfDir),
      "ssb" -> SsbVerbatim.fixtureSession(spark, sfDir))
    sessions.foreach { case (name, s) =>
      assert(s.conf.get(key) == "8",
        s"$name fixture session should carry the small-fixture floor")
    }
    // and the profile is session-scoped: the outer session is untouched
    assert(spark.conf.get(key) != "8")
  }

  test("the floor releases above the smallFactRows threshold") {
    val s = spark.newSession()
    val before = s.conf.get(key)
    Engine.tuneFixtureSession(s, Engine.smallFactRows)
    assert(s.conf.get(key) == before,
      "an at-threshold fact must keep the engine-wide default")
    Engine.tuneFixtureSession(s, Engine.smallFactRows - 1)
    assert(s.conf.get(key) == "8")
  }

  test("SHJ local-map threshold derives from the memory envelope") {
    val mb = 1L << 20
    // r13's failure case: 8 GB heap / 32 cores can NOT afford 64 MB builds
    // (observed "Can't acquire 67108864 bytes"); the derivation must land
    // under that and over the 16 MB floor.
    val small = Engine.shjLocalMapThreshold(8L << 30, 32)
    assert(small < 64 * mb && small >= 16 * mb, s"got $small")
    // the 48 GB rerun that ran clean gets a proportionally larger budget
    val big = Engine.shjLocalMapThreshold(48L << 30, 32)
    assert(big > small && big <= 256 * mb, s"got $big")
    // clamps: a tiny heap floors at 16 MB, a huge heap caps at 256 MB
    assert(Engine.shjLocalMapThreshold(1L << 30, 64) == 16 * mb)
    assert(Engine.shjLocalMapThreshold(1L << 40, 4) == 256 * mb)
  }

  test("no verbatim session re-introduces a duplicated literal conf") {
    // guard the unification itself: the three fixtureSession bodies must
    // route through Engine.tuneFixtureSession, not a string-config copy
    val files = Seq("TpchVerbatim.scala", "SsbVerbatim.scala",
      "TpcdsVerbatim.scala")
    files.foreach { f =>
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"src/main/scala/graft/operators/$f")),
        "UTF-8")
      assert(!src.contains("\"spark.sql.shuffle.partitions\""),
        s"$f sets the partition conf directly — use Engine.tuneFixtureSession")
      assert(src.contains("Engine.tuneFixtureSession"),
        s"$f no longer routes through the shared profile")
    }
  }
}
