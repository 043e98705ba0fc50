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
  * and a delta-sized join.
  *
  * Invariant (spec-proved): pairs(corpus ∪ delta) =
  * pairs(corpus) ∪ deltaPairs(corpus, delta), with the union disjoint
  * when delta ids are fresh.
  */
object IncrementalDedup {

  /** Exact Jaccard-≥`threshold` pairs touching the delta, given both
    * sides as (doc_id, s: array<long>) shingle frames (the stored
    * index shape of [[graft.queries.DedupQueries]]). Output matches
    * the full miner's schema: (doc_a, doc_b, inter_cnt, jaccard),
    * doc_a < doc_b. Delta ids must be disjoint from corpus ids (an
    * UPDATE is a drop + re-add at the caller).
    */
  def deltaPairs(
      corpusShingles: DataFrame,
      deltaShingles: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val corpusEx = corpusShingles
      .select(col("doc_id").as("c_id"), explode(col("s")).as("g"))
    val deltaEx = deltaShingles
      .select(col("doc_id").as("d_id"), explode(col("s")).as("g"))
    // delta × corpus: equi-join on the shingle; the delta side is
    // delivery-sized, so output is bounded by the delta's postings ×
    // matching corpus frequency, never corpus²
    val cross = deltaEx.join(corpusEx, Seq("g"))
      .select(least(col("d_id"), col("c_id")).as("doc_a"),
        greatest(col("d_id"), col("c_id")).as("doc_b"))
    // delta × delta: through the hot-key-guarded self miner (a
    // delivery can itself contain a near-identical batch)
    val within = SkewJoin
      .saltedSelfPairs(
        deltaShingles.select(col("doc_id"), explode(col("s")).as("g"))
          .select(col("g"), col("doc_id")),
        "g", "doc_id")
      .toDF("doc_a", "doc_b")
    val inter = cross.unionAll(within)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_cnt"))
    val card = corpusShingles.unionByName(deltaShingles)
      .select(col("doc_id"), size(col("s")).cast("long").as("n"))
    inter
      .join(card.toDF("doc_a", "na"), "doc_a")
      .join(card.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter_cnt").cast("double") /
          (col("na") + col("nb") - col("inter_cnt")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("jaccard"))
  }
}
