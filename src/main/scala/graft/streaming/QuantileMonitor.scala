package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming QUANTILE monitor — the distribution-shape sibling of
  * [[HeavyHitters]] (counts), [[QualityMonitor]] (rules), and
  * [[EventStream]]'s spike monitor (rates): a mergeable KLL sketch
  * (Karnin–Lang–Liberty; the Datasketches implementation Spark ships)
  * maintained across micro-batches, so "p99 latency this stream has
  * EVER seen" and "where did today's deliveries sit in the standing
  * distribution" are one in-memory read with a PUBLISHED rank-error
  * bound — not a corpus re-scan (the batch twin is q41/q55/q142 over
  * the stored tables).
  *
  * Cost per delivery: one `mapPartitions` pass over the BATCH emitting
  * ≤ P serialized sketches (KB each, size independent of the data),
  * collected and merged on the driver; the standing state is ONE
  * sketch. The published guarantee travels with the report:
  * [[Report.rankEps]] is the sketch's own normalized rank-error bound
  * (≈1.65% at the default k=200, 99% confidence), so a consumer reads
  * the accuracy instead of assuming it.
  *
  * The standing sketch is process-local monitor state (the
  * [[HeavyHitters]] discipline): a restart resets it and replayed
  * deliveries re-merge; the durable distribution read is the declared
  * percentile queries over the stored corpus.
  */
object QuantileMonitor {

  /** One delivery's view of the MERGED standing distribution. */
  final case class Report(
      n: Long, min: Double, p50: Double, p95: Double, p99: Double,
      max: Double, rankEps: Double)

  private[streaming] def report(sk: KllDoublesSketch): Report =
    if (sk.isEmpty) Report(0L, Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN, sk.getNormalizedRankError(false))
    else Report(
      sk.getN,
      sk.getMinItem,
      sk.getQuantile(0.50),
      sk.getQuantile(0.95),
      sk.getQuantile(0.99),
      sk.getMaxItem,
      sk.getNormalizedRankError(false))

  /** Sketch one batch frame's `valueCol` (nulls/NaNs dropped — a NaN
    * would poison every quantile): ≤ P per-partition sketches collect
    * as their serialized form and merge on the driver. Exposed so
    * batch callers and the spec share the exact monitor arithmetic
    * (the [[QualityMonitor.auditBatch]] rule).
    */
  def summarizeBatch(
      batch: DataFrame, valueCol: String, k: Int): KllDoublesSketch = {
    val vals = batch.select(col(valueCol).cast("double")).na.drop()
      .filter(!isnan(col(valueCol)))
      .as(Encoders.scalaDouble)
    val partials = vals.mapPartitions { it =>
      val sk = KllDoublesSketch.newHeapInstance(k)
      it.foreach(sk.update)
      Iterator.single(sk.toByteArray)
    }(Encoders.BINARY).collect()
    val merged = KllDoublesSketch.newHeapInstance(k)
    partials.foreach { bytes =>
      merged.merge(KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(bytes)))
    }
    merged
  }

  /** Continuous monitoring: every micro-batch of `stream` sketches its
    * `valueCol` and merges into the standing sketch; `onBatch`
    * receives the UPDATED standing distribution each delivery.
    * Offsets live in `checkpoint`; the sketch itself is process-local
    * (scaladoc above).
    */
  def monitor(
      stream: DataFrame,
      valueCol: String,
      checkpoint: String,
      onBatch: Report => Unit,
      k: Int = 200): StreamingQuery = {
    val state = KllDoublesSketch.newHeapInstance(k)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state.merge(summarizeBatch(batch, valueCol, k))
        onBatch(report(state))
        ()
      }
      .start()
  }
}
