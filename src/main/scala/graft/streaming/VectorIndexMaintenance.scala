package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF index maintenance — the vector face of
  * [[CorpusMaintenance]]: each micro-batch of embeddings upserts into
  * the stored vector corpus AND into the stored assignment table in
  * one pass, with the batch assigned map-side against FIXED centroids
  * ([[graft.operators.IncrementalVectors.assignDelta]]) — a delivery
  * costs the delivery, never a corpus re-scan or a k-means refit.
  *
  * Quantizer staleness surfaces per batch instead of silently decaying
  * recall: the batch's list-share drift against the standing
  * assignment ([[graft.operators.IncrementalVectors.balanceDrift]]) is
  * measured BEFORE the upsert and reported through `onBatch`, so the
  * operator of a long-running ingest sees "refit needed" the moment
  * deliveries stop looking like the corpus the centroids were fitted
  * on. The refit itself is the caller's move (fit with
  * [[graft.functions.KMeansLite]], rebuild the assignment table) — an
  * automatic in-stream refit would silently rewrite a corpus-scale
  * artifact mid-flight.
  *
  * Same durability contract as [[CorpusMaintenance]]: both writes go
  * through the verified staged commit, the batch side broadcasts into
  * the anti-join (the corpus never shuffles), and replay of an
  * at-least-once batch recommits identical state.
  */
object VectorIndexMaintenance {

  /** What one micro-batch did: committed corpus rows, committed
    * assignment rows, the batch's drift vs the standing assignment,
    * and whether that drift demands a quantizer refit.
    */
  final case class BatchReport(
      corpusRows: Long,
      assignedRows: Long,
      drift: Double,
      refitNeeded: Boolean)

  /** Merge one batch of `(vec_id, embedding)` rows into the corpus at
    * `corpusPath` and its NARROW IVF assignment at `assignedPath`
    * (`vec_id, cids` — embeddings live in the corpus, the same
    * store-the-derivation-not-the-data discipline as the durable
    * `ivf_cids` tier; a wide assignment table would commit every
    * embedding twice per batch). Batch rows win on `vec_id`; rows
    * with a null id OR a null embedding drop — an unindexable vector
    * would otherwise poison the stored cids with nulls and crash
    * every later drift pass.
    */
  def upsertBatch(
      batch: DataFrame,
      corpusPath: String,
      assignedPath: String,
      cents: Array[Array[Double]],
      driftThreshold: Double =
        graft.operators.IncrementalVectors.DefaultDriftThreshold,
      layout: Option[graft.operators.PartitionedCommit.Layout] = None): BatchReport = {
    val spark = batch.sparkSession
    // dedup BEFORE measuring anything: the report must describe the
    // state the commit produces, not raw at-least-once duplicates
    // (the upserts below re-dedup idempotently)
    val deduped = CorpusMaintenance.dedupBatch(
      batch.select(col("vec_id"), col("embedding"))
        .filter(col("vec_id").isNotNull && col("embedding").isNotNull),
      "vec_id")
    // one evaluation of the assignment for the whole batch: drift,
    // corpus upsert and assignment upsert all read this persisted
    // frame instead of re-running NearestCentroids per consumer
    val assignedDelta = graft.operators.IncrementalVectors
      .assignDelta(deduped, cents)
      .persist()
    try {
      // drift vs the assignment as it stood BEFORE this delivery (an
      // absent table = first delivery = nothing to drift from); healed
      // existence so a mid-commit crash doesn't read as first delivery
      val hasStanding = layout match {
        case Some(_) => graft.operators.PartitionedCommit
          .healInterrupted(spark, assignedPath)
        case None => graft.operators.CommitSink
          .healInterrupted(spark, assignedPath)
      }
      val drift =
        if (!hasStanding) 0.0
        else graft.operators.IncrementalVectors.balanceDrift(
          spark.read.parquet(assignedPath)
            .drop(graft.operators.PartitionedCommit.BucketCol), assignedDelta)
      val corpusRows = CorpusMaintenance.upsertBatch(
        assignedDelta.select(col("vec_id"), col("embedding")),
        corpusPath, "vec_id", layout)
      val assignedRows = CorpusMaintenance.upsertBatch(
        assignedDelta.select(col("vec_id"), col("cids")),
        assignedPath, "vec_id", layout)
      BatchReport(corpusRows, assignedRows, drift, drift > driftThreshold)
    } finally {
      assignedDelta.unpersist()
      ()
    }
  }

  /** Continuous maintenance: every micro-batch of `vecs` (a streaming
    * `(vec_id, embedding)` DataFrame) runs [[upsertBatch]]; `onBatch`
    * receives each [[BatchReport]] (wire it to alerting / a refit
    * queue). Offsets live in `checkpoint` — restart resumes from the
    * last committed batch, and per-batch idempotence makes the stored
    * state effectively exactly-once.
    */
  def maintain(
      vecs: DataFrame,
      corpusPath: String,
      assignedPath: String,
      cents: Array[Array[Double]],
      checkpoint: String,
      driftThreshold: Double =
        graft.operators.IncrementalVectors.DefaultDriftThreshold,
      layout: Option[graft.operators.PartitionedCommit.Layout] = None,
      onBatch: BatchReport => Unit = _ => ()): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(upsertBatch(
          batch, corpusPath, assignedPath, cents, driftThreshold, layout))
        ()
      }
      .start()

  /** What one PQ micro-batch did — the code-index twin of
    * [[BatchReport]].
    */
  final case class PqBatchReport(
      corpusRows: Long,
      codeRows: Long,
      drift: Double,
      refitNeeded: Boolean)

  /** PQ face of [[upsertBatch]]: merge one batch of
    * `(vec_id, embedding)` rows into the corpus at `corpusPath` and
    * its NARROW PQ codes table at `codesPath` (`vec_id, c0..c{M-1}` —
    * the [[graft.operators.IncrementalPq]] layout; the 32×-compressed
    * scan q172's ADC stage reads). The batch encodes map-side against
    * FIXED codebooks — a delivery costs the delivery, never a corpus
    * re-encode or a codebook refit — and codebook staleness surfaces
    * per batch as the code-share drift
    * ([[graft.operators.IncrementalPq.codeDrift]]) measured BEFORE
    * the upsert. Same durability/idempotence contract as
    * [[upsertBatch]].
    */
  def upsertBatchPq(
      batch: DataFrame,
      corpusPath: String,
      codesPath: String,
      books: Array[Array[Array[Double]]],
      driftThreshold: Double =
        graft.operators.IncrementalPq.DefaultDriftThreshold,
      layout: Option[graft.operators.PartitionedCommit.Layout] = None): PqBatchReport = {
    val spark = batch.sparkSession
    val deduped = CorpusMaintenance.dedupBatch(
      batch.select(col("vec_id"), col("embedding"))
        .filter(col("vec_id").isNotNull && col("embedding").isNotNull),
      "vec_id").persist()
    try {
      val codesDelta = graft.operators.IncrementalPq.encode(deduped, books)
      val hasStanding = layout match {
        case Some(_) => graft.operators.PartitionedCommit
          .healInterrupted(spark, codesPath)
        case None => graft.operators.CommitSink
          .healInterrupted(spark, codesPath)
      }
      val drift =
        if (!hasStanding) 0.0
        else graft.operators.IncrementalPq.codeDrift(
          spark.read.parquet(codesPath)
            .drop(graft.operators.PartitionedCommit.BucketCol), codesDelta)
      val corpusRows = CorpusMaintenance.upsertBatch(
        deduped, corpusPath, "vec_id", layout)
      val codeRows = CorpusMaintenance.upsertBatch(
        codesDelta, codesPath, "vec_id", layout)
      PqBatchReport(corpusRows, codeRows, drift, drift > driftThreshold)
    } finally {
      deduped.unpersist()
      ()
    }
  }

  /** Continuous PQ maintenance — [[maintain]]'s twin over
    * [[upsertBatchPq]]; `onBatch` receives each [[PqBatchReport]]
    * (wire the refit flag to a codebook-refit queue — the refit
    * itself stays the caller's move, as with the IVF face).
    */
  def maintainPq(
      vecs: DataFrame,
      corpusPath: String,
      codesPath: String,
      books: Array[Array[Array[Double]]],
      checkpoint: String,
      driftThreshold: Double =
        graft.operators.IncrementalPq.DefaultDriftThreshold,
      layout: Option[graft.operators.PartitionedCommit.Layout] = None,
      onBatch: PqBatchReport => Unit = _ => ()): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(upsertBatchPq(
          batch, corpusPath, codesPath, books, driftThreshold, layout))
        ()
      }
      .start()
}
