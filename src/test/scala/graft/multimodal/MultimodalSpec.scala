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

  // ── shared RIFF builders (AVI + WAV) for the real-decode gates ──

  private def le32b(v: Int) = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def ccb(s: String) = s.getBytes("ISO-8859-1")

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] =
    ccb(id) ++ le32b(body.length) ++ body ++
      (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])

  /** A real MJPEG AVI: each frame a genuine JPEG in the canonical
    * RIFF AVI / LIST movi / 00dc layout the chunk walk parses.
    */
  private def buildAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = ccb("movi") ++ frames.flatMap(f => riffChunk("00dc", f)).toArray
    val aviBody = ccb("AVI ") ++ riffChunk("LIST", movi)
    ccb("RIFF") ++ le32b(aviBody.length) ++ aviBody
  }

  private def jpegSolid(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
    bos.toByteArray
  }

  /** A textured scene JPEG (gradient phase-shifted per frame index, so
    * distinct frames carry DISTINCT pHashes — a flat solid color has a
    * degenerate all-low DCT whatever its hue), with an optional
    * few-pixel tweak to model a lossy re-encode of the same scene.
    */
  private def jpegScene(phase: Int, tweak: Boolean = false): Array[Byte] = {
    val (w, h) = (64, 48)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 255 * ((x + phase * 17) % w) / w
      val v = if (x >= (phase * 11) % 32 && x < (phase * 11) % 32 + 16 &&
        y >= h / 4 && y < h / 2) 230 else g
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    if (tweak) (0 until 5).foreach { i =>
      val x = (i * 7) % w; val y = (i * 11) % h
      val v = math.min(255, (img.getRGB(x, y) & 0xff) + 6)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
    bos.toByteArray
  }

  test("MJPEG-AVI frames extract for real and decode end-to-end") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff,
      0xff00ff)
    val frames = colors.map(jpegSolid)
    val avi = buildAvi(frames)

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

  // ── q189 temporal video signature: decoder-level gates ──

  test("videoFrameHashes: real AVI path — per-frame pHash, re-encode ≤3 bits, truncation keeps a prefix") {
    val scenes = (0 until 6).map(p => jpegScene(p))
    val avi = buildAvi(scenes)
    val sig = Multimodal.Decoders.videoFrameHashes(avi, 1, 16)
    // REAL path: one hash per video chunk, each equal to the frame's
    // own pHash (the fake 256-byte-window path would yield a count
    // keyed to byte length, not frame count)
    assert(sig.length == 6)
    scenes.zipWithIndex.foreach { case (f, i) =>
      assert(sig(i) == Multimodal.Decoders.phash64(f), s"frame $i")
    }
    // distinct scenes carry distinct hashes (the signature is temporal
    // information, not 6 copies of one value)
    assert(sig.distinct.length > 1)
    // determinism
    assert(Multimodal.Decoders.videoFrameHashes(avi, 1, 16).toSeq == sig.toSeq)
    // RE-ENCODE tolerance: the same scenes re-rendered with a
    // few-pixel luma tweak (a lossy re-encode) stay within 3 Hamming
    // bits per frame — inside the q189 mining threshold
    val reenc = Multimodal.Decoders.videoFrameHashes(
      buildAvi((0 until 6).map(p => jpegScene(p, tweak = true))), 1, 16)
    assert(reenc.length == 6)
    sig.zip(reenc).zipWithIndex.foreach { case ((a, b), i) =>
      assert(ham(a, b) <= 3, s"frame $i re-encode drifted ${ham(a, b)} bits")
    }
    // TRUNCATION tolerance: the first-4-frames cut carries exactly the
    // first 4 hashes (fixed-stride sampling — a length-relative sample
    // would re-seat every point), so its bag containment in the full
    // video is 4/4 = 1 ≥ the 60% q189 gate
    val cut = Multimodal.Decoders.videoFrameHashes(
      buildAvi(scenes.take(4)), 1, 16)
    assert(cut.toSeq == sig.take(4).toSeq)
    // stride and cap honored on the real path
    assert(Multimodal.Decoders.videoFrameHashes(avi, 2, 16).toSeq ==
      Seq(sig(0), sig(2), sig(4)))
    assert(Multimodal.Decoders.videoFrameHashes(avi, 1, 2).toSeq ==
      sig.take(2).toSeq)
  }

  test("videoFrameHashes: fake path — 256-byte windows, deterministic, truncation prefix") {
    val text = ("the quick brown fox jumps over the lazy dog " * 40).getBytes
    val sig = Multimodal.Decoders.videoFrameHashes(text, 1, 16)
    assert(sig.length == math.min(16, (text.length + 255) / 256))
    assert(Multimodal.Decoders.videoFrameHashes(text, 1, 16).toSeq == sig.toSeq)
    // each window hashes independently: a one-byte edit in window 2
    // leaves every other window's hash untouched
    val edited = text.clone(); edited(600) = 'X'
    val esig = Multimodal.Decoders.videoFrameHashes(edited, 1, 16)
    assert(esig.length == sig.length)
    sig.indices.filter(_ != 2).foreach { i =>
      assert(esig(i) == sig(i), s"window $i perturbed by a window-2 edit")
    }
    // truncation at a window boundary keeps the prefix
    val cut = Multimodal.Decoders.videoFrameHashes(text.take(512), 1, 16)
    assert(cut.toSeq == sig.take(2).toSeq)
    // degenerates
    assert(Multimodal.Decoders.videoFrameHashes(null, 1, 16).isEmpty)
    assert(Multimodal.Decoders.videoFrameHashes(text, 0, 16).isEmpty)
    assert(Multimodal.Decoders.videoFrameHashes(Array.emptyByteArray, 1, 16).isEmpty)
  }

  // ── q190 audio energy-envelope fingerprint: decoder-level gates ──

  /** 16-bit PCM WAV of a square wave whose per-window amplitude is
    * `amp(j)` for each of the 65 envelope windows (130 samples each —
    * equal windows, so window j's summed |energy| is 130·amp(j)).
    * `extraChunk` prepends a LIST metadata chunk; `dataFirst` emits
    * the data chunk before fmt — both container-level rewrites that
    * must not move a single signature bit.
    */
  private def buildWav16(
      amp: Int => Int,
      extraChunk: Boolean = false,
      dataFirst: Boolean = false): Array[Byte] = {
    val n = 65 * 130
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = amp(i / 130)
      val s = if (i % 2 == 0) a else -a // square wave: mean |x| = a
      pcm(2 * i) = s.toByte
      pcm(2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    val fmt = ccb("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
      le32b(8000) ++ le32b(8000 * 2) ++ le16b(2) ++ le16b(16)
    val data = ccb("data") ++ le32b(pcm.length) ++ pcm
    val extra =
      if (extraChunk) ccb("LIST") ++ le32b(4) ++ ccb("INFO")
      else Array.emptyByteArray
    val body = if (dataFirst) extra ++ data ++ fmt else extra ++ fmt ++ data
    ccb("RIFF") ++ le32b(4 + body.length) ++ ccb("WAVE") ++ body
  }

  /** The SAME waveform requantized to 8-bit unsigned PCM. */
  private def buildWav8(amp: Int => Int): Array[Byte] = {
    val n = 65 * 130
    val pcm = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val a = amp(i / 130) / 256 // 16→8-bit requantization
      val s = if (i % 2 == 0) a else -a
      pcm(i) = (128 + s).toByte
      i += 1
    }
    val fmt = ccb("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
      le32b(8000) ++ le32b(8000) ++ le16b(1) ++ le16b(8)
    val data = ccb("data") ++ le32b(pcm.length) ++ pcm
    val body = fmt ++ data
    ccb("RIFF") ++ le32b(4 + body.length) ++ ccb("WAVE") ++ body
  }

  // per-window amplitude with LARGE adjacent gaps (≥1300), so
  // requantization/noise perturbations (≤ a few units of mean
  // energy) can never flip a window comparison
  private def ampWalk(j: Int): Int = 1500 + (j % 3) * 1400 + j * 10

  test("audioFingerprint64: real PCM path — container/volume/requantization invariant, noise-tolerant") {
    val base = Multimodal.Decoders.audioFingerprint64(buildWav16(ampWalk)).get
    // the envelope codes the DESIGNED derivative signs: amp rises
    // j→j+1 except at each %3 wrap (j=2→3, 5→6, …), so the expected
    // bit pattern is computable independently
    var want = 0L
    (0 until 64).foreach { b =>
      if (ampWalk(b + 1) > ampWalk(b)) want |= (1L << b)
    }
    assert(base == want, f"envelope bits ${base}%016x != designed ${want}%016x")
    // determinism
    assert(Multimodal.Decoders.audioFingerprint64(buildWav16(ampWalk)).get == base)
    // CONTAINER rewrites: extra metadata chunk, data-before-fmt — the
    // PCM is identical, so the fingerprint is identical (bit-for-bit)
    assert(Multimodal.Decoders.audioFingerprint64(
      buildWav16(ampWalk, extraChunk = true)).get == base)
    assert(Multimodal.Decoders.audioFingerprint64(
      buildWav16(ampWalk, dataFirst = true)).get == base)
    // VOLUME: exact ×4 gain scales every window energy together —
    // derivative signs (and so the fingerprint) unchanged
    assert(Multimodal.Decoders.audioFingerprint64(
      buildWav16(j => ampWalk(j) * 4)).get == base)
    // REQUANTIZATION to 8-bit: same waveform, coarser samples — the
    // designed ≥1300 inter-window gaps dwarf the ≤256 quantization
    // error, so the code is again identical
    assert(Multimodal.Decoders.audioFingerprint64(buildWav8(ampWalk)).get == base)
    // additive NOISE: ±1-sample dither shifts window means ≤1 against
    // the ≥1300 gaps — identical code (gate ≤2 bits for headroom)
    val noisy = Multimodal.Decoders.audioFingerprint64(
      buildWav16(j => ampWalk(j) + (if (j % 2 == 0) 1 else -1))).get
    assert(ham(base, noisy) <= 2)
    // a genuinely different envelope is far
    val other = Multimodal.Decoders.audioFingerprint64(
      buildWav16(j => 4000 - ampWalk(j) / 2)).get
    assert(ham(base, other) > 10)
  }

  test("audioFingerprint64: fake path deterministic; degenerate payloads refuse") {
    val text = ("pack my box with five dozen liquor jugs " * 60).getBytes
    val h = Multimodal.Decoders.audioFingerprint64(text).get
    assert(h == Multimodal.Decoders.audioFingerprint64(text.clone()).get)
    // exact duplicate bytes → distance 0; different text → far
    val other = ("sphinx of black quartz judge my vow now ok " * 56).getBytes
    assert(ham(h, Multimodal.Decoders.audioFingerprint64(other).get) > 5)
    // sub-2-per-window payloads refuse OUT-OF-BAND (None, not a 0L
    // sentinel: 0L is a legitimate all-zero envelope code — r8 review)
    assert(Multimodal.Decoders.audioFingerprint64("tiny".getBytes).isEmpty)
    assert(Multimodal.Decoders.audioFingerprint64(null).isEmpty)
    assert(Multimodal.Decoders.audioFingerprint64(Array.emptyByteArray).isEmpty)
    // an all-zero code is VALID and distinct from refusal: a monotone
    // non-increasing (fading) envelope codes 0L and must stay minable
    assert(Multimodal.Decoders.audioFingerprint64(
      buildWav16(j => 9000 - j * 130)).contains(0L))
    // a compressed (non-PCM format tag) WAVE refuses the real path and
    // takes the deterministic fake instead of mis-decoding
    val nonPcm = ccb("RIFF") ++ le32b(200) ++ ccb("WAVE") ++
      ccb("fmt ") ++ le32b(16) ++ le16b(85) ++ le16b(1) ++ le32b(8000) ++
      le32b(8000) ++ le16b(1) ++ le16b(16) ++
      ccb("data") ++ le32b(130 * 65) ++ Array.tabulate(130 * 65)(i => (i % 17).toByte)
    assert(Multimodal.Decoders.audioFingerprint64(nonPcm) ==
      Multimodal.Decoders.audioFingerprint64(nonPcm.clone()))
  }

  test("seeded audio fixture: variants share the envelope, differ as bytes; q190 mines every seeded pair") {
    // the pair group's two payloads are genuinely different media
    // objects (16-bit vs 8-bit PCM, different chunk layout) carrying
    // the same waveform — the fingerprint must land at Hamming 0
    for (g <- 0L to 3L) {
      val a = Multimodal.Fixtures.seededWav(g * 125)
      val b = Multimodal.Fixtures.seededWav(g * 125 + 1)
      assert(!java.util.Arrays.equals(a, b), "variants must differ as bytes")
      assert(a.length != b.length, "bit depths must differ")
      val ha = Multimodal.Decoders.audioFingerprint64(a)
      val hb = Multimodal.Decoders.audioFingerprint64(b)
      assert(ha.isDefined && ha == hb,
        s"group $g: 16-bit and 8-bit variants code different envelopes")
      // determinism: same id → same bytes
      assert(java.util.Arrays.equals(a,
        Multimodal.Fixtures.seededWav(g * 125)))
    }
    // distinct groups must NOT collide (different walks, far apart)
    val h0 = Multimodal.Decoders.audioFingerprint64(
      Multimodal.Fixtures.seededWav(0L)).get
    val h1 = Multimodal.Decoders.audioFingerprint64(
      Multimodal.Fixtures.seededWav(125L)).get
    assert(java.lang.Long.bitCount(h0 ^ h1) > 3,
      "seeded groups collide — the mined pairs would be wrong")
    // end-to-end: the driver-level rows-only check is non-degenerate —
    // q190 on the sf0.001 fixture (500 docs → groups 0..3) reports
    // every seeded pair
    val got = graft.SparkEntry.queries("q190_audio_fp_dedup")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val seeded = (0L to 3L).map(g => (g * 125, g * 125 + 1)).toSet
    assert(seeded.subsetOf(got),
      s"missing seeded pairs: ${seeded -- got}; got ${got.size} rows")
  }
}
