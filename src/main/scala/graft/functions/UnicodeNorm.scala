package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel — the canonicalization step every text
  * pipeline runs before hashing/dedup (NFC) and before tokenization
  * (NFKC folds ligatures, full-width forms, superscripts into their
  * compatibility equivalents, so 'ﬁle' and 'file' share tokens).
  *
  * Spark has no normalization builtin (the reference engine none either —
  * its Gandiva string kernels are byte-level); this is a native codegen
  * expression around `java.text.Normalizer` with an ASCII FAST PATH: the
  * hot loop checks the UTF8String's bytes and returns the input object
  * unchanged when all are < 0x80 (every normalization form is the
  * identity on ASCII), so a web corpus that is predominantly ASCII pays
  * one vectorizable byte scan, not a String round-trip, per row.
  */
object UnicodeNormKernel {
  final val NFC = 0
  final val NFD = 1
  final val NFKC = 2
  final val NFKD = 3

  private val forms = Array(
    java.text.Normalizer.Form.NFC, java.text.Normalizer.Form.NFD,
    java.text.Normalizer.Form.NFKC, java.text.Normalizer.Form.NFKD)

  def formOrdinal(name: String): Int = name.toUpperCase match {
    case "NFC" => NFC
    case "NFD" => NFD
    case "NFKC" => NFKC
    case "NFKD" => NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_norm: unknown form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  def normalize(s: UTF8String, form: Int): UTF8String = {
    val n = s.numBytes()
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, forms(form)))
  }
}

/** unicode_norm(str, 'NFC'|'NFD'|'NFKC'|'NFKD') — Unicode-normalized copy
  * of the string (identity and zero-copy on pure-ASCII input). */
case class UnicodeNormalize(child: Expression, form: Int)
    extends UnaryExpression {
  override def prettyName: String = "unicode_norm"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.normalize(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormKernel.normalize($c, $form)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
