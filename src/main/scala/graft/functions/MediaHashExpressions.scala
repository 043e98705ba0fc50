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

/** Ordered pHashes of a video payload's sampled frames (q189's
  * temporal signature): REAL frame extraction for RIFF-AVI/MJPEG via
  * [[graft.multimodal.Multimodal.Decoders.videoFrameHashes]],
  * deterministic 256-byte-window fake otherwise. `stride`/`maxFrames`
  * are plan-time constants (part of the signature's identity — they
  * name the durable artifact, so a layout change cannot read codes of
  * another shape). Same CodegenFallback rationale as [[PHash64]]: the
  * per-frame decode+DCT dwarfs the eval dispatch.
  */
case class VideoFrameHashes(child: Expression, stride: Int, maxFrames: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"video_frame_hashes expects binary, got ${o.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.multimodal.Multimodal.Decoders
        .videoFrameHashes(v.asInstanceOf[Array[Byte]], stride, maxFrames))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit energy-envelope audio fingerprint (q190): REAL for
  * RIFF-WAVE PCM payloads, deterministic byte-envelope fake otherwise
  * ([[graft.multimodal.Multimodal.Decoders.audioFingerprint64]]).
  */
case class AudioFingerprint64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // null = the decoder REFUSED (payload too short to envelope) — kept
  // distinct from the legitimate all-zero code 0L (monotone
  // non-increasing envelopes), which must stay minable (r8 review)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"audio_fp64 expects binary, got ${o.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.Multimodal.Decoders
      .audioFingerprint64(v.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
