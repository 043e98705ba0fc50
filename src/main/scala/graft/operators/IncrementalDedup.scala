package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup maintenance: when a maintained corpus (see
  * [[graft.streaming.CorpusMaintenance]]) gains a delta of documents,
  * the only NEW exact-Jaccard pairs are (delta × corpus) ∪
  * (delta × delta) — the standing corpus's pair set is already known.
  * Mining just those costs the delta's shingle postings against the
  * stored inverted index instead of replaying the full corpus
  * self-join: the difference between re-sharding 100 TB per delivery
  * and a delta-sized join. The delta side BROADCASTS into the cross
  * join, so the corpus postings stream map-side — no corpus shuffle,
  * and no hot-shingle reducer to pin (a boilerplate shingle costs a
  * wider map task, never a single-key reducer cell).
  *
  * Invariant (spec-proved): pairs(corpus ∪ delta) =
  * pairs(corpus) ∪ deltaPairs(corpus, delta) at the SAME threshold,
  * with the union disjoint when delta ids are fresh.
  */
object IncrementalDedup {

  /** Exact Jaccard-≥`threshold` pairs touching the delta, given both
    * sides as (doc_id, s: array<long>) shingle frames (the stored
    * index shape of [[graft.queries.DedupQueries]]). Output matches
    * the full miner's schema: (doc_a, doc_b, inter_cnt, jaccard),
    * doc_a < doc_b. Delta ids must be disjoint from corpus ids (an
    * UPDATE is a drop + re-add at the caller) — enforced, because a
    * colliding id would silently emit self-pairs and double-counted
    * cardinalities.
    */
  def deltaPairs(
      corpusShingles: DataFrame,
      deltaShingles: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val clash = corpusShingles.select(col("doc_id"))
      .join(broadcast(deltaShingles.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(clash == 0,
      "delta doc_ids must be disjoint from the corpus — drop + re-add " +
        "updated documents before mining the delta")
    val deltaEx = deltaShingles
      .select(col("doc_id"), explode(col("s")).as("g"))
    // delta × corpus: the delivery-sized delta broadcasts; corpus
    // postings stream map-side (no shuffle, no per-key reducer)
    val cross = corpusShingles
      .select(col("doc_id").as("c_id"), explode(col("s")).as("g"))
      .join(broadcast(deltaEx.toDF("d_id", "g")), Seq("g"))
      .select(least(col("d_id"), col("c_id")).as("doc_a"),
        greatest(col("d_id"), col("c_id")).as("doc_b"))
    // delta × delta: through the hot-key-guarded self miner (a
    // delivery can itself contain a near-identical batch)
    val within = SkewJoin
      .saltedSelfPairs(deltaEx, "g", "doc_id")
      .toDF("doc_a", "doc_b")
    // shared scoring tail; broadcastPairs keeps the corpus-spanning
    // cardinality frame map-side (delta-touching pairs are small)
    graft.queries.DedupQueries.scorePairs(
      cross.unionAll(within),
      corpusShingles.unionByName(deltaShingles),
      threshold,
      broadcastPairs = true)
  }
}
