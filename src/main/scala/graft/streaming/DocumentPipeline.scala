package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming document-ingest pipeline — the text face of
  * [[VectorIndexMaintenance]], composing the pieces a training corpus
  * actually runs between delivery and release (ref: the ordered
  * per-record stage fold of `Batch Processor.py:334-365`, re-expressed
  * as set-at-a-time maintenance): each micro-batch of raw documents is
  *
  *   1. deduped and null-filtered ([[CorpusMaintenance.dedupBatch]]),
  *   2. PII-scrubbed ([[graft.queries.TextQueries.scrubPii]] — the
  *      stored corpus never holds a raw email/IP/phone),
  *   3. shingled ([[graft.queries.DedupQueries.shingleHashes]]) and
  *      mined for near-dup candidates against the STANDING shingle
  *      index ([[graft.operators.IncrementalDedup.deltaCandidates]] —
  *      delta-sized cost, never a corpus re-mine),
  *   4. committed in lockstep: scrubbed corpus, shingle index, and
  *      pair-candidates artifact all go through the verified staged
  *      commit ([[graft.operators.CommitSink]]).
  *
  * UPDATES are first-class: a batch id that already exists in the
  * corpus replaces its document — its old shingles leave the index,
  * every stored candidate touching it is dropped, and the new content
  * re-mines against the remainder. That lifts
  * [[graft.operators.IncrementalDedup]]'s fresh-ids contract at this
  * layer (the drop step manufactures disjointness before the mine).
  *
  * Replay-idempotent under at-least-once `foreachBatch`: a replayed
  * batch finds its own ids standing, drops exactly the state it
  * committed, and recommits identical state — which also heals a
  * crash that landed between the three commits (the next replay
  * rebuilds all three from the same base). Candidates commit FIRST,
  * while the standing shingle index still describes the pre-batch
  * corpus the mine needs; the shingle and corpus commits follow.
  *
  * Scale shape: the batch side of every join is micro-batch-sized and
  * broadcasts (anti-joins for the drops, the delta side of the mine) —
  * the standing corpus and index never shuffle; per-commit rewrite
  * cost is the same honest plain-parquet contract as
  * [[CorpusMaintenance]] (bound it by partitioning or an ACID table
  * layer at 100 TB).
  */
object DocumentPipeline {

  /** What one micro-batch did: committed corpus/shingle-index rows,
    * committed candidate rows, how many of those candidates are new
    * this batch, and how many standing docs the batch replaced.
    */
  final case class BatchReport(
      corpusRows: Long,
      shingleRows: Long,
      candidateRows: Long,
      newCandidates: Long,
      replacedDocs: Long)

  private val CandSchema =
    Seq("doc_a", "doc_b", "inter_cnt", "na", "nb", "jaccard", "containment")

  /** Ingest one batch of documents (at least `doc_id`, `text`; extra
    * columns ride into the corpus) into the corpus at `corpusPath`,
    * the shingle index at `shinglesPath` (`doc_id, s: array<long>`),
    * and the scored candidates at `candidatesPath` (the
    * `pair_candidates` schema, containment ≥ `floor`).
    */
  def upsertBatch(
      batch: DataFrame,
      corpusPath: String,
      shinglesPath: String,
      candidatesPath: String,
      floor: Double = graft.queries.DedupQueries.CandidateFloor): BatchReport = {
    val spark = batch.sparkSession
    // Healed existence, not bare fs.exists(): a crash inside
    // CommitSink's swap leaves a path absent with the only copy at
    // `.__old__`. Bare exists() here would silently drop ALL standing
    // candidates (and make the mine delta-only, permanently losing
    // delta-vs-standing pairs) on the very replay that is supposed to
    // heal the crash.
    def exists(p: String): Boolean =
      graft.operators.CommitSink.healInterrupted(spark, p)

    val deduped = CorpusMaintenance.dedupBatch(
      batch.filter(col("doc_id").isNotNull && col("text").isNotNull), "doc_id")
    // scrub BEFORE anything downstream sees the text: the shingle
    // index, the candidates, and the stored corpus all describe the
    // redacted document. Evaluated once — the scrubbed batch fans
    // into the mine and three commits.
    val scrubbed = deduped
      .withColumn("text", graft.queries.TextQueries.scrubPii(col("text")))
      .persist()
    try {
      val deltaSh = scrubbed.select(col("doc_id"),
        graft.queries.DedupQueries.shingleHashes(
          filter(split(col("text"), " "), tk => length(tk) > 0)).as("s"))
      val batchIds = scrubbed.select(col("doc_id"))

      // standing state minus everything the batch replaces; the batch
      // side broadcasts, the standing side never shuffles
      val standingSh =
        if (!exists(shinglesPath)) None
        else Some(spark.read.parquet(shinglesPath)
          .join(broadcast(batchIds), Seq("doc_id"), "left_anti"))
      val keptCands =
        if (!exists(candidatesPath)) None
        else Some(spark.read.parquet(candidatesPath)
          .join(broadcast(batchIds.toDF("doc_a")), Seq("doc_a"), "left_anti")
          .join(broadcast(batchIds.toDF("doc_b")), Seq("doc_b"), "left_anti")
          .select(CandSchema.map(col): _*))

      val mined = standingSh match {
        case Some(sh) => graft.operators.IncrementalDedup
          .deltaCandidates(sh, deltaSh, floor)
        case None => graft.queries.DedupQueries
          .candidatesFromShingles(deltaSh, floor = floor)
      }
      val newCands = mined.select(CandSchema.map(col): _*)

      val replaced =
        if (!exists(corpusPath)) 0L
        else spark.read.parquet(corpusPath)
          .join(broadcast(batchIds), Seq("doc_id"), "left_semi").count()

      // candidates first: the mine's plan reads the PRE-batch shingle
      // index from disk, so it must execute before that index is
      // rewritten below
      val candidateRows = graft.operators.CommitSink.writeVerified(
        spark, keptCands.fold(newCands)(_.unionByName(newCands)),
        candidatesPath)
      val newCandidates = newCands.count()
      val shingleRows = CorpusMaintenance.upsertBatch(
        deltaSh, shinglesPath, "doc_id")
      val corpusRows = CorpusMaintenance.upsertBatch(
        scrubbed, corpusPath, "doc_id")
      BatchReport(
        corpusRows, shingleRows, candidateRows, newCandidates, replaced)
    } finally {
      scrubbed.unpersist()
      ()
    }
  }

  /** Continuous ingest: every micro-batch of `docs` (a streaming
    * DataFrame) runs [[upsertBatch]]; `onBatch` receives each
    * [[BatchReport]]. Offsets live in `checkpoint` — restart resumes
    * from the last committed batch, and per-batch idempotence makes
    * the stored trio effectively exactly-once.
    */
  def maintain(
      docs: DataFrame,
      corpusPath: String,
      shinglesPath: String,
      candidatesPath: String,
      checkpoint: String,
      floor: Double = graft.queries.DedupQueries.CandidateFloor,
      onBatch: BatchReport => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(upsertBatch(
          batch, corpusPath, shinglesPath, candidatesPath, floor))
        ()
      }
      .start()
}
