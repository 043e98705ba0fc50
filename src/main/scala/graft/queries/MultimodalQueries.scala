package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing exercised as a query (north star): treat
  * content as an opaque binary column, extract typed metadata
  * deterministically. The full typed decode pipeline (schema, batch
  * shape, stubbed decoders) lives in [[graft.multimodal.Multimodal]];
  * this query proves the binary column path end-to-end against the
  * oracle using text bytes as stand-in payloads.
  */
object MultimodalQueries {
  import Q._

  /** pHash signatures, persisted per (session, dir): (doc_id, sig).
    * The decode+DCT is the expensive pass (ImageIO for real payloads),
    * so the signature table materializes once through the stamped
    * persist/durable tier like the shingle and SimHash bases; the q73
    * block index derives from it with bit-ops.
    */
  private val phashCache = new StampedCache("phash_sigs")

  private[graft] def phashSigs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    phashCache.get(s, d) {
      graft.functions.GraftFunctions.register(s)
      // stand-in payload = the canonicalized document bytes (same
      // lower() canonicalization as the q22/q27 text-dedup family —
      // real image payloads would arrive as-is in a binary column)
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.GraftFunctions.phash64(
          lower(col("text")).cast("binary")).as("sig"))
    }

  /** Drop this session's cached media bases. */
  def clearCaches(s: org.apache.spark.sql.SparkSession): Unit = {
    phashCache.clear(s)
    phashPairsCache.clear(s)
    phashClusterCache.clear(s)
    videoSigCache.clear(s)
    videoPairsCache.clear(s)
    audioSigCache.clear(s)
    audioPairsCache.clear(s)
  }

  /** Per-video temporal signatures, persisted per (session, dir):
    * (doc_id, sigs ARRAY<LONG>). The frame decode + per-frame DCT is
    * the expensive pass, so like the pHash base it materializes once
    * through the stamped/durable tier; the store name bakes in the
    * stride/cap layout (the durable-artifact-identity rule — a layout
    * change must MISS the store, not read signatures of another
    * shape). Real RIFF-AVI payloads hash their sampled MJPEG frames;
    * the text fixtures hash deterministic 256-byte windows of the
    * canonicalized bytes (same lower() canonicalization as the
    * q22/q27/q73 dedup family, so exact-dup documents carry identical
    * signatures and near-dups share their unchanged windows).
    */
  private val videoSigCache = new StampedCache(
    s"video_phash_sigs_s${graft.functions.GraftFunctions.VideoStride}" +
      s"f${graft.functions.GraftFunctions.VideoMaxFrames}")

  private[graft] def videoSigs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    videoSigCache.get(s, d) {
      graft.functions.GraftFunctions.register(s)
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.GraftFunctions.videoFrameHashes(
          lower(col("text")).cast("binary")).as("sigs"))
    }

  /** q189's verified near-dup video pairs: candidates from the q73
    * 4×16-bit block index over EVERY sampled frame's pHash (pigeonhole
    * per frame: a frame pair within Hamming 3 shares a block; keying
    * blocks WITHOUT the frame index is what makes a trimmed video
    * still collide with its source), mined through the shared salted
    * self-join, then bag-containment verified: count the shorter
    * video's frames having a Hamming-≤3 match anywhere in the longer
    * one and keep pairs covering ≥ 60%. The k×k verify is bounded by
    * the signature cap (≤16×16 comparisons/pair) — never corpus-
    * scaled. Persisted like the text family's verified pair sets.
    */
  private val videoPairsCache = new StampedCache(
    s"video_phash_pairs_s${graft.functions.GraftFunctions.VideoStride}" +
      s"f${graft.functions.GraftFunctions.VideoMaxFrames}")

  private def videoPairs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    videoPairsCache.get(s, d) {
      val sigs = videoSigs(s, d)
      val frames = sigs.select(col("doc_id"), explode(col("sigs")).as("sig"))
      // distinctBlocks: a video re-emits its static scenes' blocks
      // per frame
      graft.operators.HammingBlocks
        .blockCandidates(frames, "doc_id", "sig",
          relativeHot = graft.queries.DedupQueries.MinerRelativeHot,
          distinctBlocks = true)
        .join(sigs.toDF("doc_a", "sigs_a"), "doc_a")
        .join(sigs.toDF("doc_b", "sigs_b"), "doc_b")
        .withColumn("fs",
          when(size(col("sigs_a")) <= size(col("sigs_b")), col("sigs_a"))
            .otherwise(col("sigs_b")))
        .withColumn("fl",
          when(size(col("sigs_a")) <= size(col("sigs_b")), col("sigs_b"))
            .otherwise(col("sigs_a")))
        .withColumn("matched", expr(
          "CAST(size(filter(fs, x -> exists(fl, y -> bit_count(x ^ y) <= 3))) AS BIGINT)"))
        .withColumn("n_short", size(col("fs")).cast("long"))
        // integer cross-multiply, never a double ratio (exactness rule)
        .filter(col("n_short") > 0 && col("matched") * 10 >= col("n_short") * 6)
        .select(col("doc_a"), col("doc_b"), col("matched"), col("n_short"))
    }

  /** The corpus's derived AUDIO payloads: docs with doc_id % 125 ∈
    * {0,1} publish a real synthesized RIFF-WAVE (the seeded
    * container/bit-depth near-dup pairs —
    * [[graft.multimodal.Multimodal.Fixtures.seededWav]], r9 verdict
    * #4: without them the fixture holds no audio near-dup at all and
    * q190's rows-only driver check was degenerate); every other doc
    * keeps the canonicalized text bytes as the stand-in payload.
    */
  private[graft] def audioPayloads(
      s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    t(s, d, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .map { case (id, txt) =>
        val content =
          if (id % 125 < 2) graft.multimodal.Multimodal.Fixtures.seededWav(id)
          else txt.getBytes("UTF-8")
        (id, content)
      }.toDF("doc_id", "content")
  }

  /** Audio fingerprints, persisted per (session, dir): (doc_id, sig).
    * Real RIFF-WAVE PCM payloads (including the seeded pairs) code
    * their energy envelope; the text-byte stand-ins code the
    * canonicalized bytes as centered 8-bit samples. Store name bakes
    * in the seeding layout (durable-artifact-identity rule).
    */
  private val audioSigCache = new StampedCache("audio_fp_sigs_seed125")

  private[graft] def audioSigs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    audioSigCache.get(s, d) {
      graft.functions.GraftFunctions.register(s)
      audioPayloads(s, d).select(
        col("doc_id"),
        graft.functions.GraftFunctions.audioFp64(col("content")).as("sig"))
    }

  /** q190's verified near-dup audio pairs — the q27/q73 mining shape
    * verbatim over the envelope fingerprint: 4×16-bit block index,
    * salted miner, exact Hamming ≤ 3 verify, persisted pair set.
    */
  private val audioPairsCache = new StampedCache("audio_fp_pairs_seed125")

  private def audioPairs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    audioPairsCache.get(s, d) {
      // NULL is the decoder's refusal (payload too short to envelope)
      // — without this filter every refused payload would pair with
      // every other at Hamming 0, a |refused|² clique of false
      // "duplicates" (caught at sf0.01: 67 short docs → 2211 bogus
      // pairs). Refusal is OUT-OF-BAND (null), not the 0L sentinel it
      // first shipped as: 0L is a legitimate code (monotone
      // non-increasing envelope — fade-outs, silence), and genuine
      // all-zero duplicates must stay minable (r8 review finding).
      val sigs = audioSigs(s, d).filter(col("sig").isNotNull)
      graft.operators.HammingBlocks.hammingPairs(
        sigs, "doc_id", "sig",
        maxBits = 3,
        relativeHot = graft.queries.DedupQueries.MinerRelativeHot)
    }

  /** pHash near-dup pairs (doc_a, doc_b, hamming ≤ 3): the q27-style
    * 4×16-bit block index over the persisted signature base, mined
    * through the salted pair miner, exact-Hamming verified. Shared by
    * q73 (the pair surface) and q75 (cluster assignment) — and, like
    * the text family's verified pair sets, cached/persisted as its own
    * artifact: mine + verify is deterministic per corpus, an
    * ingest-time cost, not a per-query one.
    */
  private val phashPairsCache = new StampedCache("phash_pairs")

  private def phashPairs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    phashPairsCache.get(s, d) {
      graft.operators.HammingBlocks.hammingPairs(
        phashSigs(s, d), "doc_id", "sig",
        maxBits = 3,
        relativeHot = graft.queries.DedupQueries.MinerRelativeHot)
    }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q34_binary_meta",
      (s, d) => {
        t(s, d, "documents")
          .select(
            col("doc_id"),
            octet_length(col("text")).cast("long").as("byte_len"),
            lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("head_hex"),
            lower(hex(expr(
              "CAST(substring(text, CAST(floor(length(text)/2) AS INT), 4) AS BINARY)")))
              .as("mid_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  lower(hex(encode(substring(text, 1, 4)))) AS head_hex,
             |  lower(hex(encode(substring(text,
             |    CAST(floor(length(text)/2) AS INT), 4)))) AS mid_hex
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── q73: image near-dup pairs over the 64-bit DCT pHash (north
    // star: multimodal dedup). Same mining shape as q27's SimHash:
    // 4×16-bit block index (pigeonhole: any pair within Hamming
    // distance 3 shares at least one block) → the shared salted pair
    // miner over the persisted signature base → exact Hamming verify.
    // Real images route through the ImageIO pixel decode; the text
    // fixtures hash their deterministic byte-4-gram histogram grids,
    // so near-identical payloads pair up (measured: recall 0.76 and
    // precision 1.0 against q25's exact-Jaccard pairs at sf0.01). No
    // oracle — DuckDB cannot compute a DCT pHash (rows-only driver
    // check; the pixel path is gated in MultimodalSpec with in-test
    // PNG fixtures, the mining in QueriesSpec against brute force).
    QueryDef(
      "q73_image_phash_dedup",
      (s, d) => phashPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      None),

    // ── q75: image near-dup CLUSTER assignment (the media twin of
    // q36): q73's pairs → iterative min-label connected components →
    // full-corpus map with a keep/drop flag. Same output contract as
    // q36 (cluster = min doc_id of the component; singletons label
    // themselves), so downstream survivor selection is one
    // `filter(is_dup = 0)` regardless of which modality mined the
    // pairs. No oracle — the pairs derive from the pHash (rows-only
    // driver check; MultimodalSpec proves the labeling equals a
    // driver-side union-find over the same pairs).
    QueryDef(
      "q75_image_dedup_clusters",
      (s, d) => phashClusterMap(s, d).orderBy(col("doc_id")),
      None),

    // ── q189: VIDEO content near-dup (the r7 verdict's #1 gap) — a
    // re-encoded, re-containered, or trimmed copy of a video is
    // invisible to byte/exact dedup; the temporal pHash signature
    // pairs it. Per video: ordered phash64 of its sampled frames
    // (real MJPEG/AVI extraction; 256-byte-window fake for non-AVI
    // payloads) → per-frame 4×16-bit block index (frame index NOT in
    // the key, so trims still collide) → salted miner → bounded
    // (≤cap²) bag-containment Hamming verify at ≥60% of the shorter
    // side's frames. No oracle — DuckDB cannot decode frames or DCT
    // (rows-only driver check); MultimodalSpec gates the real-AVI
    // path (JPEG re-encode ≤3 bits/frame, truncation containment=1,
    // block mining ≡ brute force on the fixture corpus).
    QueryDef(
      "q189_video_phash_dedup",
      (s, d) => videoPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      None),

    // ── q190: AUDIO content near-dup (r7 verdict gap #2) — duplicate
    // audio in a different container/bit depth/volume was invisible
    // to the dedup family while q34 read WAV headers only. The
    // 64-bit energy-envelope derivative code is container-, volume-,
    // and requantization-invariant by construction (it reads only
    // PCM and compares adjacent window energies), so re-packaged
    // duplicates land within a few Hamming bits; mining is the
    // q27/q73 block family verbatim. The derived payload base seeds
    // one 16-bit/8-bit container-variant pair per 125 docs
    // ([[audioPayloads]]) so the driver's rows-only check observes
    // real positives (r9 verdict #4). No oracle (rows-only);
    // MultimodalSpec gates container-rewrite identity, exact ×4
    // volume-scale identity, noise ≤2 bits, mining ≡ brute force,
    // and that every seeded pair is mined.
    QueryDef(
      "q190_audio_fp_dedup",
      (s, d) => audioPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      None)
  )

  /** q75's full-corpus media cluster map, cached/persisted like q36's
    * text [[graft.queries.DedupQueries.clusterMap]]: the iterative
    * min-label assignment runs a job per round EAGERLY, so the stamped
    * cache makes it once-per-corpus instead of once per invocation.
    */
  private val phashClusterCache = new StampedCache("phash_cluster_map")

  private def phashClusterMap(
      s: org.apache.spark.sql.SparkSession, d: String) =
    phashClusterCache.get(s, d) {
      val pairs = phashPairs(s, d).select(col("doc_a"), col("doc_b"))
      val labels = graft.operators.DedupClusters
        .assign(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      t(s, d, "documents").select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .withColumn("is_dup",
          when(col("cluster") =!= col("doc_id"), 1).otherwise(0).cast("int"))
    }
}
