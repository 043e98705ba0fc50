package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of q91's heavy-hitter machinery — a BOUNDED
  * Misra–Gries summary maintained ACROSS micro-batches by the
  * mergeable-summaries rule (Agarwal et al., PODS'12: sum counters,
  * then subtract the (K+1)-th largest and shed non-positives), so a
  * token that is below every single delivery's radar but hot in
  * aggregate still surfaces — the failure mode a per-batch top-k
  * monitor (reset every delivery) structurally cannot see.
  *
  * Cost per delivery: one `mapPartitions` pass over the BATCH emitting
  * ≤ P bounded summaries (K counters each — the q91 partial shape),
  * collected and merged on the driver; the standing state is ONE
  * K-counter summary. The standing corpus is never touched.
  *
  * Guarantees carried by [[Summary]] (spec-gated, not aspirational):
  * every stored count UNDERCOUNTS (`c(t) ≤ true(t)`), the undercount
  * is bounded by the summary's own `err` (`true(t) ≤ c(t) + err` for
  * EVERY token, stored or shed), and `err ≤ n/(K+1)` — so any token
  * with true mass above `n/(K+1)` is guaranteed present. `err` is
  * data-dependent and usually far smaller; it ships with the summary
  * so the consumer reads the bound instead of assuming the worst.
  *
  * The standing summary is process-local monitor state (the
  * [[EventStream]] spike-monitor discipline): a restart resets it and
  * replayed deliveries re-merge — the DURABLE heavy-hitter read is the
  * batch query (q91) over the stored corpus; this monitor exists to
  * see the current stream's skew the moment it arrives.
  */
object HeavyHitters {

  /** A bounded Misra–Gries summary: at most `k` counters over the
    * `n` tokens absorbed so far, with `err` = the cumulative
    * decrement — the undercount bound every guarantee above is
    * phrased in.
    */
  final case class Summary(
      k: Int, counters: Map[String, Long], n: Long, err: Long) {

    /** Counters in (count desc, token) order — the report shape. */
    def heavy: Seq[(String, Long)] =
      counters.toSeq.sortBy { case (t, c) => (-c, t) }

    /** Tokens GUARANTEED heavy at `frac` of the absorbed mass: stored
      * count + err reaches frac·n only if the true count can; stored
      * count alone reaching frac·n proves it does.
      */
    def atLeast(frac: Double): Seq[(String, Long)] =
      heavy.filter { case (_, c) => c.toDouble >= frac * n.toDouble }
  }

  def empty(k: Int): Summary = Summary(k, Map.empty, 0L, 0L)

  /** Merge two summaries of the SAME k (mergeable-summaries step):
    * counters sum; if more than k survive, the (k+1)-th largest value
    * subtracts from all and non-positives shed. Total mass and error
    * bounds add (plus the cut — the new decrement).
    */
  def merge(a: Summary, b: Summary): Summary = {
    require(a.k == b.k, s"summary widths differ: ${a.k} vs ${b.k}")
    val combined = (a.counters.keySet ++ b.counters.keySet).iterator
      .map(t => t ->
        (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L)))
      .toMap
    if (combined.size <= a.k)
      Summary(a.k, combined, a.n + b.n, a.err + b.err)
    else {
      // (k+1)-th largest count: subtracting it leaves ≤ k positives
      val cut = combined.valuesIterator.toSeq
        .sorted(Ordering[Long].reverse)(a.k)
      val kept = combined.iterator
        .map { case (t, c) => t -> (c - cut) }
        .filter { case (_, c) => c > 0 }
        .toMap
      Summary(a.k, kept, a.n + b.n, a.err + b.err + cut)
    }
  }

  /** One partition's bounded summary — the classic MG loop (the
    * [[graft.queries.TextQueries.mgCandidates]] step, here keeping
    * counts and tracking the decrement total so partials MERGE with
    * an honest error term instead of re-counting).
    */
  private[streaming] def mgPartition(
      it: Iterator[String], k: Int): Summary = {
    val m = scala.collection.mutable.HashMap[String, Long]()
    var n = 0L
    var err = 0L
    it.foreach { t =>
      n += 1
      if (m.contains(t)) m(t) += 1
      else if (m.size < k) m(t) = 1
      else {
        // decrement-all sheds one unit from k counters AND the
        // arriving token — one err unit bounds all k+1 undercounts
        err += 1
        val dead = scala.collection.mutable.ArrayBuffer[String]()
        m.foreach { case (w, c) => if (c == 1) dead += w else m(w) = c - 1 }
        dead.foreach(m.remove)
      }
    }
    Summary(k, m.toMap, n, err)
  }

  /** Summarize one batch frame's `tokenCol` into a single bounded
    * summary: ≤ P partition partials (K counters each) collect and
    * fold through [[merge]]. Exposed so batch callers and the spec
    * share the exact monitor arithmetic (the
    * [[QualityMonitor.auditBatch]] rule).
    */
  def summarizeBatch(batch: DataFrame, tokenCol: String, k: Int): Summary = {
    val toks: Dataset[String] =
      batch.select(col(tokenCol).cast("string")).na.drop()
        .as(Encoders.STRING)
    val partials = toks.mapPartitions(it =>
      Iterator.single(mgPartition(it, k)))(Encoders.product[Summary])
      .collect()
    // deterministic fold order (partition index order is how collect
    // returns them); merge is guarantee-preserving in any order
    partials.foldLeft(empty(k))(merge)
  }

  /** Continuous monitoring: every micro-batch of `stream` summarizes
    * its `tokenCol` and merges into the standing summary; `onBatch`
    * receives the UPDATED standing state each delivery. Offsets live
    * in `checkpoint`; the summary itself is process-local (scaladoc
    * above).
    */
  def monitor(
      stream: DataFrame,
      tokenCol: String,
      k: Int,
      checkpoint: String,
      onBatch: Summary => Unit): StreamingQuery = {
    // monitor state: one K-bounded summary, updated only inside
    // foreachBatch (micro-batches of one query never overlap)
    var state = empty(k)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = merge(state, summarizeBatch(batch, tokenCol, k))
        onBatch(state)
        ()
      }
      .start()
  }
}
