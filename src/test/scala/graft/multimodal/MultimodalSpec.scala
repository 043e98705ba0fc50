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
