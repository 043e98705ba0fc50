package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup maintenance: when a maintained corpus (see
  * [[graft.streaming.CorpusMaintenance]]) gains a delta of documents,
  * the only NEW exact-Jaccard pairs are (delta × corpus) ∪
  * (delta × delta) — the standing corpus's pair set is already known.
  * Mining just those costs the delta's shingle postings against the
  * stored inverted index instead of replaying the full corpus
  * self-join. With `broadcastDelta` (default — deliveries are
  * micro-batch-sized) the delta broadcasts into the cross join, so
  * corpus postings stream map-side: no corpus shuffle, and no
  * hot-shingle reducer to pin. Pass `broadcastDelta = false` for a
  * bulk delta too large to broadcast — the join falls back to a
  * shuffle, where AQE's skew split handles hot shingles.
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
    * doc_a < doc_b.
    *
    * Delta ids must be disjoint from corpus ids (an UPDATE is a
    * drop + re-add at the caller): a colliding id that shares a
    * shingle with its corpus twin fails LOUDLY at execution (lazy
    * per-row check — no eager corpus scan just to prove
    * disjointness); a collision with zero shared shingles cannot be
    * detected from the postings and remains the caller's contract.
    */
  def deltaPairs(
      corpusShingles: DataFrame,
      deltaShingles: DataFrame,
      threshold: Double = 0.5,
      broadcastDelta: Boolean = true): DataFrame =
    graft.queries.DedupQueries.scorePairs(
      deltaHits(corpusShingles, deltaShingles, broadcastDelta),
      corpusShingles.unionByName(deltaShingles),
      threshold)

  /** The candidates twin of [[deltaPairs]], maintaining the stored
    * `pair_candidates` artifact (both overlap measures, kept at the
    * containment floor): candidates(corpus ∪ delta) =
    * candidates(corpus) ∪ deltaCandidates(corpus, delta) at the same
    * floor, spec-proved like the pairs invariant.
    */
  def deltaCandidates(
      corpusShingles: DataFrame,
      deltaShingles: DataFrame,
      floor: Double = graft.queries.DedupQueries.CandidateFloor,
      broadcastDelta: Boolean = true): DataFrame =
    graft.queries.DedupQueries.scoreCandidates(
      deltaHits(corpusShingles, deltaShingles, broadcastDelta),
      corpusShingles.unionByName(deltaShingles),
      floor)

  /** Raw delta-touching hit rows: (delta × corpus) ∪ (delta × delta),
    * one row per shared shingle.
    */
  private def deltaHits(
      corpusShingles: DataFrame,
      deltaShingles: DataFrame,
      broadcastDelta: Boolean): DataFrame = {
    val deltaEx = deltaShingles
      .select(col("doc_id"), explode(col("s")).as("g"))
    val deltaSide = deltaEx.toDF("d_id", "g")
    // delta × corpus; the id-collision guard rides the join itself
    // (raise_error evaluates only on a clashing row) instead of an
    // eager full-corpus disjointness scan per delivery
    val cross = corpusShingles
      .select(col("doc_id").as("c_id"), explode(col("s")).as("g"))
      .join(if (broadcastDelta) broadcast(deltaSide) else deltaSide, Seq("g"))
      .filter(when(col("d_id") === col("c_id"),
        raise_error(lit("delta doc_id collides with corpus doc_id — " +
          "drop + re-add updated documents before mining the delta"))
          .cast("boolean"))
        .otherwise(lit(true)))
      .select(least(col("d_id"), col("c_id")).as("doc_a"),
        greatest(col("d_id"), col("c_id")).as("doc_b"))
    // delta × delta: through the hot-key-guarded self miner (a
    // delivery can itself contain a near-identical batch), with the
    // batch miners' corpus-scaled hot threshold — here "corpus" is
    // the delivery, which is exactly the grain whose df distribution
    // the salt decision should track
    val within = SkewJoin
      .saltedSelfPairs(deltaEx, "g", "doc_id",
        relativeHot = graft.queries.DedupQueries.MinerRelativeHot)
      .toDF("doc_a", "doc_b")
    cross.unionAll(within)
  }
}
