package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming EXACT-distinct monitor — the zero-error twin of the
  * sketch monitors ([[HeavyHitters]] counts, [[QuantileMonitor]]
  * quantiles): per key, the exact count of distinct ids the stream has
  * EVER seen, maintained as mergeable BITMAP state — the streaming
  * face of q209's two-level bitmap aggregate, sharing its bucketing
  * (`bitmap_bucket_number`/`bitmap_bit_position`, 32768-bit buckets).
  *
  * Why bitmaps and not counters: bitmap union is IDEMPOTENT — an
  * at-least-once redelivery ORs bits that are already set and the
  * count does not inflate (a sum-based distinct monitor over-counts on
  * every replay). And unlike the HLL path (q45/q184) the answer is
  * exact, at the honest price: state is Θ(distinct ids) bits (~1 bit
  * per id in touched buckets). Right when the id domain is dense and
  * bounded (user ids, doc ids); the HLL monitors are the sublinear
  * fallback when it is not.
  *
  * Cost per delivery: ONE bitmap aggregation of the batch (the
  * exchange carries ≤4 KB bitmaps per (key, bucket), never ids),
  * collected and OR-merged into the standing state on the driver.
  * The standing state is process-local monitor state (the
  * [[HeavyHitters]] discipline): a restart resets it and replayed
  * deliveries re-merge — idempotently, see above; the durable read is
  * q209 over the stored corpus.
  */
object DistinctMonitor {

  /** One delivery's view of the standing state: exact distinct ids
    * per key, and the state's total bitmap bytes (the cost readout —
    * a consumer watches it grow with true cardinality).
    */
  final case class Report(perKey: Map[String, Long], stateBytes: Long)

  private def popcount(bm: Array[Byte]): Long = {
    var i = 0
    var n = 0L
    while (i < bm.length) { n += java.lang.Integer.bitCount(bm(i) & 0xff); i += 1 }
    n
  }

  /** OR `src` into `dst` in place (dst must be at least src-sized). */
  private def orInto(dst: Array[Byte], src: Array[Byte]): Unit = {
    var i = 0
    while (i < src.length) { dst(i) = (dst(i) | src(i)).toByte; i += 1 }
  }

  /** Aggregate one batch frame to its (key, bucket, bitmap) partials —
    * q209's level-1 shape verbatim (null keys/ids dropped: a null id
    * has no bit). Exposed so batch callers and the spec share the
    * exact monitor arithmetic.
    */
  def summarizeBatch(
      batch: DataFrame, keyCol: String,
      idCol: String): Seq[(String, Long, Array[Byte])] =
    batch
      .select(col(keyCol).cast("string").as("k"),
        bitmap_bucket_number(col(idCol)).as("bkt"),
        bitmap_bit_position(col(idCol)).as("pos"))
      .filter(col("k").isNotNull && col("pos").isNotNull)
      .groupBy(col("k"), col("bkt"))
      .agg(bitmap_construct_agg(col("pos")).as("bm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2)))
      .toSeq

  /** Mutable standing state: (key, bucket) → bitmap. */
  final class State {
    private[streaming] val m =
      scala.collection.mutable.HashMap.empty[(String, Long), Array[Byte]]

    def absorb(partials: Seq[(String, Long, Array[Byte])]): Unit =
      partials.foreach { case (k, bkt, bm) =>
        m.get((k, bkt)) match {
          case Some(cur) if cur.length >= bm.length => orInto(cur, bm)
          case Some(cur) =>
            val grown = java.util.Arrays.copyOf(bm, bm.length)
            orInto(grown, cur)
            m.update((k, bkt), grown)
          case None =>
            m.update((k, bkt), java.util.Arrays.copyOf(bm, bm.length))
        }
      }

    def report: Report = {
      val perKey = m.toSeq
        .groupBy(_._1._1)
        .map { case (k, es) => k -> es.map(e => popcount(e._2)).sum }
      Report(perKey, m.valuesIterator.map(_.length.toLong).sum)
    }
  }

  /** Continuous monitoring: every micro-batch aggregates to bitmap
    * partials and ORs into the standing state; `onBatch` receives the
    * UPDATED exact distinct counts each delivery. Offsets live in
    * `checkpoint`; the state itself is process-local (scaladoc above).
    */
  def monitor(
      stream: DataFrame,
      keyCol: String,
      idCol: String,
      checkpoint: String,
      onBatch: Report => Unit): StreamingQuery = {
    val state = new State
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state.absorb(summarizeBatch(batch, keyCol, idCol))
        onBatch(state.report)
        ()
      }
      .start()
  }
}
