package graft.multimodal

import graft.SparkTestBase
import graft.sources.Tables

/** Multimodal plumbing: binary schema path, mapPartitions batch shape,
  * stubbed decoders' determinism.
  */
class MultimodalSpec extends SparkTestBase {

  test("documents → MediaRecord → extractMeta end-to-end") {
    val docs = Tables(spark, sf(), "documents")
    val media = Multimodal.fromDocuments(spark, docs)
    val meta = Multimodal.extractMeta(media).cache()
    val n = meta.count()
    assert(n == docs.count())
    val all = meta.collect()
    assert(all.forall(_.ok))
    assert(all.forall(m => m.byte_len > 0 && m.n_frames >= 1))
    // deterministic fake decode: re-running yields identical metadata
    val again = Multimodal.extractMeta(media).collect()
    assert(all.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
    meta.unpersist()
  }

  test("real PNG/BMP payloads decode their true dimensions via javax.imageio") {
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff0000)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    assert(Multimodal.Decoders.decodeImage(encode("png", 2, 2)) == ((2, 2)))
    assert(Multimodal.Decoders.decodeImage(encode("bmp", 7, 3)) == ((7, 3)))
    // not a fake-path artifact: the PNG magic header would fake-decode
    // to (0x8950, 0x4e47), not the true dims
    assert(Multimodal.Decoders.decodeImage(encode("png", 5, 9)) == ((5, 9)))
  }

  test("real WAV/RIFF headers decode rate, channels and frame count") {
    // canonical 44-byte PCM WAV header: 16-bit stereo 44100 Hz with a
    // declared 176400-byte data chunk = 44100 frames (1 s)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    val wav = cc("RIFF") ++ le32(36 + 176400) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      cc("data") ++ le32(176400) // header-only: no sample bytes follow
    val m = Multimodal.Decoders.decodeWav(wav)
    assert(m.contains(Multimodal.Decoders.WavMeta(44100, 2, 16, 44100L)))
    // an extra chunk before fmt/data still walks correctly
    val padded = cc("RIFF") ++ le32(0) ++ cc("WAVE") ++
      cc("LIST") ++ le32(4) ++ cc("INFO") ++
      cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000 * 2) ++ le16(2) ++ le16(16) ++
      cc("data") ++ le32(16000)
    assert(Multimodal.Decoders.decodeWav(padded)
      .contains(Multimodal.Decoders.WavMeta(8000, 1, 16, 8000L)))
    // non-WAV payloads refuse instead of inventing metadata
    assert(Multimodal.Decoders.decodeWav(cc("RIFX") ++ new Array[Byte](40)).isEmpty)
    assert(Multimodal.Decoders.decodeWav("plain text".getBytes).isEmpty)
    // a corrupt declared chunk size near 2³² must terminate the walk
    // (an Int-truncated advance would step zero/backwards and hang)
    val evil = cc("RIFF") ++ le32(0) ++ cc("WAVE") ++ cc("JUNK") ++
      Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++
      new Array[Byte](64)
    assert(Multimodal.Decoders.decodeWav(evil).isEmpty)
  }

  test("real MP4 box headers decode track dimensions") {
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ cc(tpe) ++ payload
    // tkhd v0: version+flags, 20 bytes of times/id/duration, 8+2+2+2+2
    // reserved/layer/group/volume, 36-byte matrix, then 16.16 w/h
    def tkhd(w: Int, h: Int) = box("tkhd",
      Array[Byte](0, 0, 0, 0) ++ new Array[Byte](20) ++ new Array[Byte](52) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val audioTrak = box("trak", tkhd(0, 0)) // audio tracks carry 0×0
    val videoTrak = box("trak", tkhd(640, 360))
    val mp4 = box("ftyp", cc("isom") ++ be32(512) ++ cc("isomavc1")) ++
      box("moov", audioTrak ++ videoTrak) ++
      box("mdat", new Array[Byte](32))
    assert(Multimodal.Decoders.decodeMp4Dims(mp4).contains((640, 360)))
    // no ftyp → not BMFF → refuse (fake path takes over)
    assert(Multimodal.Decoders.decodeMp4Dims(
      box("moov", videoTrak)).isEmpty)
    assert(Multimodal.Decoders.decodeMp4Dims("plain text".getBytes).isEmpty)
    // a truncated tkhd (empty payload, at end of buffer) refuses
    // instead of reading out of bounds
    val truncated = box("ftyp", cc("isom")) ++
      box("moov", box("trak", box("tkhd", Array.emptyByteArray)))
    assert(Multimodal.Decoders.decodeMp4Dims(truncated).isEmpty)
  }

  test("extractMeta dispatches kinds: audio/video real parses, fake fallback") {
    import spark.implicits._
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    val wav = cc("RIFF") ++ le32(36) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(22050) ++
      le32(22050 * 4) ++ le16(4) ++ le16(16) ++
      cc("data") ++ le32(4 * 100)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, "s"),
      Multimodal.MediaRecord(2L, "audio", "not audio".getBytes, "s"),
      Multimodal.MediaRecord(3L, "video", "not video".getBytes, "s"))
      .toDS()
    val byId = Multimodal.extractMeta(recs).collect()
      .map(m => m.media_id -> m).toMap
    assert(byId(1L).sample_rate == 22050 && byId(1L).channels == 2 &&
      byId(1L).n_frames == 100)
    // unrecognized payloads keep the deterministic fake frame count
    assert(byId(2L).sample_rate == 0 &&
      byId(2L).n_frames == Multimodal.Decoders.frameCount("not audio".getBytes))
    assert(byId(3L).width == 0 && byId(3L).ok)
  }

  // deterministic synthetic photo: horizontal gradient + bright square,
  // rendered at a parameterized size so the resize-invariance of the
  // pHash can be probed with the SAME scene at different resolutions
  private def renderPng(
      w: Int, h: Int, tweak: Boolean = false, bars: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v =
        if (bars) { if ((x * 8 / w) % 2 == 0) 235 else 20 } // vertical bars
        else if (x >= w / 4 && x < w / 2 && y >= h / 4 && y < h / 2) 230
        else 255 * x / w // gradient
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    if (tweak) (0 until 5).foreach { i => // a handful of +6-luma pixels
      val x = (i * 7) % w; val y = (i * 11) % h
      val v = math.min(255, (img.getRGB(x, y) & 0xff) + 6)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("pHash: real pixel decode — near-identical and rescaled images land close") {
    val base = Multimodal.Decoders.phash64(renderPng(64, 48))
    // deterministic: same payload, same hash
    assert(base == Multimodal.Decoders.phash64(renderPng(64, 48)))
    // a few tweaked pixels: within the q73 mining threshold
    assert(ham(base, Multimodal.Decoders.phash64(
      renderPng(64, 48, tweak = true))) <= 3)
    // the SAME scene at 2× resolution: still close (pixel decode +
    // box resample, impossible for a byte-level hash of the PNG stream)
    assert(ham(base, Multimodal.Decoders.phash64(renderPng(128, 96))) <= 8)
    // a genuinely different scene: far
    assert(ham(base, Multimodal.Decoders.phash64(
      renderPng(64, 48, bars = true))) > 10)
  }

  test("pHash: byte-stretch fallback is deterministic and edit-tolerant") {
    val text = ("the quick brown fox jumps over the lazy dog " * 30).getBytes
    val h1 = Multimodal.Decoders.phash64(text)
    assert(h1 == Multimodal.Decoders.phash64(text.clone()))
    // byte edits perturb only the touched grid cells, so edited
    // payloads stay an order of magnitude under the ~32-bit
    // expectation of unrelated payloads (the fallback is a coarse
    // byte-similarity signal; sub-threshold near-dup TEXT mining is
    // q25–q27's job, not q73's)
    val edited1 = text.clone(); edited1(5) = 'X'
    assert(ham(h1, Multimodal.Decoders.phash64(edited1)) <= 8)
    val edited2 = text.clone(); edited2(5) = 'X'; edited2(700) = 'Y'
    assert(ham(h1, Multimodal.Decoders.phash64(edited2)) <= 8)
    // a different text is far
    val other = ("pack my box with five dozen liquor jugs today yes " * 27).getBytes
    assert(ham(h1, Multimodal.Decoders.phash64(other)) > 10)
    // degenerate payloads yield the defined all-zero signature
    assert(Multimodal.Decoders.phash64(null) == 0L)
    assert(Multimodal.Decoders.phash64(Array.emptyByteArray) == 0L)
  }

  test("q75 clusters equal a driver-side union-find over the q73 pairs") {
    val pairs = graft.SparkEntry.queries("q73_image_phash_dedup")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture near-dups should surface")
    // independent reimplementation: path-compressed union-find with
    // min-id roots
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val got = graft.SparkEntry.queries("q75_image_dedup_clusters")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.foreach { case (id, cluster, isDup) =>
      assert(cluster == find(id), s"doc $id: cluster $cluster != ${find(id)}")
      assert(isDup == (if (cluster != id) 1 else 0))
    }
    // the corpus map is total: one row per document
    assert(got.length ==
      graft.sources.Tables(spark, sf(), "documents").count())
  }

  test("real resize: decodable payloads downsample to true dimensions") {
    // a real PNG resizes for real: output decodes at the target dims
    val small = Multimodal.Decoders.resize(renderPng(64, 48), 16, 12)
    assert(Multimodal.Decoders.decodeImage(small) == ((16, 12)))
    // resize commutes with the pHash scene signature: hashing the
    // resized image stays near the original (same scene)
    assert(ham(Multimodal.Decoders.phash64(renderPng(64, 48)),
      Multimodal.Decoders.phash64(small)) <= 8)
    // deterministic: same payload, same bytes
    assert(java.util.Arrays.equals(small,
      Multimodal.Decoders.resize(renderPng(64, 48), 16, 12)))
    // degenerate targets refuse instead of dividing by zero
    assert(Multimodal.Decoders.resize(renderPng(8, 8), 0, 4).isEmpty)
  }

  test("MJPEG-AVI frames extract for real and decode end-to-end") {
    // build a real 6-frame MJPEG AVI: each video chunk is a genuine
    // JPEG (distinct solid color per frame), wrapped in the canonical
    // RIFF AVI / LIST movi / 00dc layout the chunk walk parses
    def jpeg(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff,
      0xff00ff)
    val frames = colors.map(jpeg)
    val movi = "movi".getBytes("ISO-8859-1") ++
      frames.flatMap(f => chunk("00dc", f)).toArray
    val aviBody = "AVI ".getBytes("ISO-8859-1") ++ chunk("LIST", movi)
    val avi = "RIFF".getBytes("ISO-8859-1") ++ le32(aviBody.length) ++ aviBody

    assert(Multimodal.Decoders.frameCount(avi) == 6)
    val all = Multimodal.Decoders.sampleFrames(avi, 1)
    assert(all.length == 6)
    // every extracted frame is byte-identical to its source JPEG and
    // DECODES: real end-to-end video frame sampling, not a fake
    all.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
    all.zip(colors).foreach { case (f, c) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
      // JPEG is lossy: solid-color frames stay within a loose tolerance
      val px = img.getRGB(4, 4)
      def ch(v: Int, s: Int) = (v >> s) & 0xff
      Seq(16, 8, 0).foreach(s =>
        assert(math.abs(ch(px, s) - ch(c, s)) < 48, f"$px%06x vs $c%06x"))
    }
    // stride picks every k-th frame, starting at 0
    val every2 = Multimodal.Decoders.sampleFrames(avi, 2)
    assert(every2.length == 3 &&
      java.util.Arrays.equals(every2(1), frames(2)))
    // a truncated AVI keeps the frames that fit, never throws
    val cut = avi.take(avi.length - frames.last.length / 2)
    assert(Multimodal.Decoders.frameCount(cut) == 5)
  }

  test("decoders: header dims, resize bound, frame sampling") {
    val content = Array.tabulate(1000)(i => (i % 251).toByte)
    val (w, h) = Multimodal.Decoders.decodeImage(content)
    assert(w == ((content(0) & 0xff) << 8 | (content(1) & 0xff)))
    assert(h == ((content(2) & 0xff) << 8 | (content(3) & 0xff)))
    assert(Multimodal.Decoders.resize(content, 10, 10).length == 100)
    assert(Multimodal.Decoders.frameCount(content) == 1000 / 256 + 1)
    assert(Multimodal.Decoders.sampleFrames(content, 100).length == 10)
    assert(Multimodal.Decoders.decodeImage(Array[Byte](1)) == ((0, 0)))
  }
}
