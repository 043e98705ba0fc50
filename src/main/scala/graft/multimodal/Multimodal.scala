package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The actual codec calls are STUBBED behind [[Decoders]] with
  * deterministic fakes (the container ships no image/audio libraries);
  * everything Spark-side — schema, batching, partitioning, the
  * `mapPartitions` shape that amortizes per-batch decoder setup — is
  * real and tested. Swapping a fake for a JNI/javacv call changes one
  * function body and nothing else.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      source: String)

  /** Typed metadata extracted by "decode". */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      ok: Boolean)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** Decoders: image dimension decode is REAL for the formats the JDK
    * ships codecs for (PNG/BMP/GIF/JPEG via `javax.imageio` — header
    * read only, no pixel decode); payloads no installed reader
    * recognizes (and all audio/video ops) fall back to deterministic
    * fakes, since the container ships no media libraries. Swapping a
    * fake for a JNI/javacv call changes one function body and nothing
    * else.
    */
  object Decoders {
    /** Image dims: real `javax.imageio` header read when a JDK codec
      * recognizes the payload; deterministic fake ("header" = first 4
      * bytes) otherwise — so fixture text payloads keep their stable
      * fake dims while a real PNG/BMP/JPEG decodes for real.
      */
    def decodeImage(content: Array[Byte]): (Int, Int) = {
      if (content == null || content.length < 4) (0, 0)
      else realImageDims(content).getOrElse(
        (((content(0) & 0xff) << 8) | (content(1) & 0xff),
          ((content(2) & 0xff) << 8) | (content(3) & 0xff)))
    }

    /** Header-only dimension read via the ImageReader API — avoids
      * materializing pixel buffers (the thing that would hurt in a
      * per-row 100 TB pass; dims live in the first KB of the stream).
      */
    private def realImageDims(content: Array[Byte]): Option[(Int, Int)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              Some((r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Fake frame count: one frame per 256-byte block. */
    def frameCount(content: Array[Byte]): Int =
      if (content == null) 0 else content.length / 256 + 1

    /** Fake resize: truncate payload to the first `w*h` bytes. */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (content == null) Array.emptyByteArray
      else content.take(math.max(0, w * h))

    /** Fake frame sample: every `stride`-th byte as a "frame". */
    def sampleFrames(content: Array[Byte], stride: Int): Array[Array[Byte]] =
      if (content == null || stride <= 0) Array.empty
      else content.grouped(stride).map(g => g.take(1)).toArray
  }

  /** Decode metadata for every record — `mapPartitions` so that real
    * decoders can set up codec context once per partition (the batch
    * shape that matters at 100 TB: payload bytes never shuffle; the
    * operation is embarrassingly parallel over input splits).
    */
  def extractMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real impl: open codec/library handle here, once per partition
      it.map { r =>
        val (w, h) = Decoders.decodeImage(r.content)
        val len = if (r.content == null) 0L else r.content.length.toLong
        MediaMeta(r.media_id, r.kind, len, w, h,
          Decoders.frameCount(r.content), ok = len > 0)
      }
    }
  }

  /** Build a MediaRecord dataset from the `documents` fixture (text
    * bytes as stand-in payloads) — lets every multimodal path run on
    * the driver's fixtures without synthesizing data.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("content"),
      col("source"))
      .as[MediaRecord]
  }
}
