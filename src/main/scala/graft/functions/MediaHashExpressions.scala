package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** 64-bit DCT perceptual hash of a binary media payload (SURVEY.md
  * north star: multimodal near-dup). Real pixel decode + box resample +
  * DCT-II live in [[graft.multimodal.Multimodal.Decoders.phash64]];
  * non-image payloads hash a deterministic byte-stretch grid, so the
  * same expression serves both real images and the text-byte fixtures.
  *
  * Not in a codegen hot path (runs once per payload; output feeds the
  * q73 block join), so CodegenFallback is acceptable — the decode
  * itself dwarfs the eval dispatch.
  */
case class PHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"phash64 expects binary, got ${o.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.Multimodal.Decoders.phash64(v.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
