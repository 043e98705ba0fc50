package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization (java.text.Normalizer) as a native
  * codegen Expression — the canonicalization step of normalization
  * dedup (q87): composed vs decomposed accents ("é" as U+00E9 vs
  * "e"+U+0301) are the SAME text to a reader and must hash to the same
  * dedup key. Runs once per document in the canonical-hash chain, so
  * it stays inside whole-stage codegen rather than CodegenFallback.
  *
  * The fast path matters: real corpora are overwhelmingly already-NFC
  * (all-ASCII trivially so), and `Normalizer.isNormalized` is a cheap
  * scan that lets us return the INPUT UTF8String without allocating —
  * the normalize-and-copy path runs only on the rare decomposed row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${o.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Static entry the generated code calls. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
