package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for PII redaction and document stitching that the
  * checksum oracles can't state directly: the recall-vs-precision split
  * between redactPii and piiFlags, placeholder exactness, and the
  * stitch candidate→confirm discipline. */
class RedactStitchSpec extends GraftSpecBase {

  private val sp = TestSpark.spark
  import sp.implicits._

  test("redactPii scrubs every PII shape, including Luhn-invalid decoys") {
    graft.plans.GraftFunctions.ensureRegistered(sp)
    val docs = Seq(
      (1L, "mail me at alice.smith@corp.example now"),
      (2L, "call 555-867-5309 tonight"),
      (3L, "server at 10.0.0.1 is down"),
      (4L, "card 4111111111111111 expires"),   // Luhn-VALID
      (5L, "decoy 4111111111111112 number"),   // Luhn-INVALID
      (6L, "nothing sensitive here"),
      (7L, "reach user+tag@gmail.com or a-b@my-host.com today"))
      .toDF("doc_id", "text")
    val r = ops.redactPii(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("redacted"), x.getAs[Boolean]("was_redacted")))
      .toMap
    assert(r(1L)._1 == "mail me at [EMAIL] now")
    assert(r(2L)._1 == "call [PHONE] tonight")
    assert(r(3L)._1 == "server at [IP] is down")
    assert(r(4L)._1 == "card [NUM16] expires")
    // recall bias: the redactor scrubs the Luhn-invalid decoy the FLAG
    // counter deliberately rejects
    assert(r(5L)._1 == "decoy [NUM16] number")
    val flags = ops.piiFlags(docs).filter(col("doc_id") === 5L)
      .select("pii_cards").head.getLong(0)
    assert(flags == 0L, "flags stay precision-gated (decoy not counted)")
    assert(!r(6L)._2 && r(6L)._1 == "nothing sensitive here")
    // recall charset: +/% in the local part, hyphens both sides — no
    // 'user+' / '-host.com' fragments may survive (ADVICE r8)
    assert(r(7L)._1 == "reach [EMAIL] or [EMAIL] today", r(7L)._1)
  }

  test("stitchPairs finds tail=head continuations, never all-pairs shapes") {
    val docs = Seq(
      (1L, "a" * 40 + "SHARED-BOUNDARY-0123456789ABCDEF"), // 32-char tail
      (2L, "SHARED-BOUNDARY-0123456789ABCDEF" + "b" * 40), // same head
      (3L, "completely unrelated document body here " * 3),
      (4L, "short")) // under the overlap -> excluded from both sides
      .toDF("doc_id", "text")
    val pairs = ops.stitchPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    // plan shape: equi-join on the boundary hash, no cartesian anywhere
    val plan = ops.stitchPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      plan)
  }
}
