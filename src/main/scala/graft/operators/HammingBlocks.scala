package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 4×16-bit Hamming BLOCK index shared by every 64-bit-signature
  * near-dup miner — q27 SimHash, q73 image pHash, q189 video frame
  * bags, q190 audio envelopes. By r8 the mine-and-verify pipeline had
  * been copied verbatim four times (the review flagged the drift
  * hazard: a threshold or salting fix applied to one copy silently
  * desyncs the others) — this is the ONE copy.
  *
  * Completeness (pigeonhole): any two signatures within Hamming
  * distance 3 differ in ≤3 of the four disjoint 16-bit blocks, so at
  * least one ALIGNED block is bit-identical — indexing every
  * (position, value) block and joining on equality is a complete
  * candidate generator at radius ≤3. Block identity hashes position
  * AND value so only aligned blocks collide.
  *
  * Scale shape: exact-duplicate clusters share ALL FOUR blocks — the
  * hottest possible keys — so candidates flow through
  * [[SkewJoin.saltedSelfPairs]] with the corpus-scaled hot guard; the
  * verify joins the signature base per side and runs as codegen'd
  * bit-ops on candidate rows only.
  */
object HammingBlocks {

  /** Deduplicated (doc_a, doc_b) candidate pairs from the block index
    * over `sigs` = (idCol, sigCol: long). `distinctBlocks` collapses
    * repeated (id, position, value) rows BEFORE the join — the
    * multi-signature-per-doc case (q189's frame bags re-emit a static
    * scene's blocks every frame).
    */
  def blockCandidates(
      sigs: DataFrame, idCol: String, sigCol: String,
      relativeHot: Double, distinctBlocks: Boolean = false): DataFrame = {
    val blockArr = array((0 until 4).map(k =>
      shiftright(col(sigCol), 16 * k).bitwiseAND(lit(0xFFFFL))): _*)
    val exploded = sigs.select(col(idCol), posexplode(blockArr))
      .toDF(idCol, "block_idx", "block_val")
    val blocks = if (distinctBlocks) exploded.distinct() else exploded
    SkewJoin
      .saltedSelfPairs(
        blocks.select(
          xxhash64(col("block_idx"), col("block_val")).as("k"),
          col(idCol)),
        "k", idCol, relativeHot = relativeHot)
      .toDF("doc_a", "doc_b")
      .distinct()
  }

  /** [[blockCandidates]] + exact Hamming verify: (doc_a, doc_b,
    * hamming ≤ maxBits) over a one-signature-per-id frame
    * `sigs` = (idCol, sigCol) — the q27/q73/q190 shape.
    */
  def hammingPairs(
      sigs: DataFrame, idCol: String, sigCol: String,
      maxBits: Int, relativeHot: Double): DataFrame =
    blockCandidates(sigs, idCol, sigCol, relativeHot)
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxBits)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
}
