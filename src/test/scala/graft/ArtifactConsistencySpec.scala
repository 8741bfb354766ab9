package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Guards the BENCHDIFF artifact class VERDICT r12 "what's wrong" #1
  * identified: the committed mover TABLE and the adjudication PROSE must
  * describe the same run. tools/benchdiff.py now generates both in one
  * pass (`--artifact`); this spec re-parses the newest committed
  * BENCHDIFF and asserts (a) every upward mover row in the table is
  * named in the adjudication section, and (b) no mover is still marked
  * NEEDS-ADJUDICATION without human prose following it. Applies from
  * r13 onward (earlier artifacts predate the one-pass generator and are
  * historical records). */
class ArtifactConsistencySpec extends GraftSpecBase {

  private val firstGuardedRound = 13

  private def latestBenchdiff: Option[(Int, java.nio.file.Path)] = {
    val dir = Paths.get("docs")
    val re = """BENCHDIFF_r(\d+)\.txt""".r
    Files.list(dir).iterator().asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case re(n) => Some((n.toInt, p))
          case _ => None
        }
      }
      .toSeq.sortBy(-_._1).headOption
  }

  test("latest BENCHDIFF: every upward mover in the table is " +
    "adjudicated, none left NEEDS-ADJUDICATION") {
    val (round, path) = latestBenchdiff
      .getOrElse(fail("no docs/BENCHDIFF_r*.txt committed"))
    assert(round >= firstGuardedRound,
      s"newest BENCHDIFF is r$round — generate the round's artifact " +
        "with tools/benchdiff.py --artifact before committing")
    val text = Files.readString(path)
    val (table, adjudication) =
      text.splitAt(text.indexOf("# Mover adjudication") match {
        case -1 => fail(s"$path has no '# Mover adjudication' section " +
          "— regenerate with tools/benchdiff.py --artifact")
        case i => i
      })
    // table rows look like: "  q_name   0.34s ->  1.57s (+1.23s, +364%)"
    val row = """^\s{2}(\S+)\s+[\d.]+s\s+->\s+[\d.]+s\s+\(\+""".r
    val upward = table.linesIterator
      .flatMap(l => row.findFirstMatchIn(l).map(_.group(1))).toSeq
    upward.foreach { q =>
      assert(adjudication.contains(q),
        s"upward mover $q is in the table but not in the adjudication " +
          "section — table and prose have diverged (the r12 defect class)")
    }
    // every auto-flagged row needs human prose on/after its line — the
    // generator writes the marker; shipping it unedited means nobody
    // named the cause
    adjudication.linesIterator.filter(_.contains("NEEDS-ADJUDICATION"))
      .foreach { l =>
        assert(l.contains("cause:"),
          s"unadjudicated mover shipped in $path: '$l' — append " +
            "'cause: <named cause>' to the line (or fix the regression)")
      }
  }
}
