package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, codegen'd expression.
  *
  * Spark has no built-in normalizer, yet canonical normalization is the
  * first step of any real text-curation pipeline: the same visible string
  * can arrive composed (U+00E9 é) or decomposed (e + U+0301), and every
  * downstream hash — exact dedup fingerprints, MinHash shingles, group
  * keys — silently treats them as different documents unless the corpus
  * is normalized first. NFC is idempotent and locale-independent
  * (`java.text.Normalizer` implements the Unicode standard's canonical
  * composition), so normalizing at ingest makes byte-equality equal
  * canonical-equality for all later stages.
  *
  * Codegen emits a direct static call, so the expression stays inside
  * whole-stage codegen; the common all-ASCII row short-circuits via
  * `Normalizer.isNormalized` (a cheap scan) before paying for the
  * String round trip.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NfcNormalize.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
