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

  private def phashSigs(
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
      val sigs = phashSigs(s, d)
      val blockArr = array((0 until 4).map(k =>
        shiftright(col("sig"), 16 * k).bitwiseAND(lit(0xFFFFL))): _*)
      val blocks = sigs.select(col("doc_id"), posexplode(blockArr))
        .toDF("doc_id", "block_idx", "block_val")
      // exact-duplicate payloads share ALL FOUR blocks — the hottest
      // possible keys — so the block join runs through the shared
      // salted miner; signatures re-join per side for the verify
      graft.operators.SkewJoin
        .saltedSelfPairs(
          blocks.select(
            xxhash64(col("block_idx"), col("block_val")).as("k"),
            col("doc_id")),
          "k", "doc_id",
          relativeHot = graft.queries.DedupQueries.MinerRelativeHot)
        .toDF("doc_a", "doc_b")
        .distinct()
        .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
        .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
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
