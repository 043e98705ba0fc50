package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of [[graft.operators.QualityRules]] — per-delivery
  * data-quality monitoring, the rule-engine sibling of
  * [[EventStream]]'s spike monitor and [[VectorIndexMaintenance]]'s
  * drift report: every micro-batch runs the ONE-pass audit and hands
  * the per-rule violation counts to `onBatch`, so an upstream
  * producer that starts emitting malformed records surfaces on the
  * batch that delivers them, not in next week's corpus-wide audit.
  *
  * Cost per delivery: one aggregate over the BATCH (map-side
  * combined, a 1×|rules| result — the standing corpus is never
  * touched), plus a |rules|-row collect. The alert policy is the
  * caller's (wire `onBatch` to thresholds/paging); for a hard stop,
  * compose [[graft.operators.QualityRules.gate]] inside a
  * foreachBatch instead — a failing batch then fails the stream
  * loudly rather than reporting quietly.
  */
object QualityMonitor {

  /** What one delivery looked like: batch id, rows audited, and each
    * rule's violation count.
    */
  final case class BatchAudit(
      batchId: Long,
      nRows: Long,
      badByRule: Map[String, Long]) {
    /** Violation rate of `rule` in this delivery. An unknown rule
      * name throws — a typo in alert-threshold wiring would
      * otherwise read every batch as clean forever (r7 review), the
      * exact silent failure the monitor exists to prevent.
      */
    def badFrac(rule: String): Double = {
      require(badByRule.contains(rule),
        s"unknown rule '$rule' — audited rules: ${badByRule.keys.toSeq.sorted
          .mkString(", ")}")
      if (nRows == 0) 0.0 else badByRule(rule).toDouble / nRows
    }
  }

  /** Audit one (batch) frame into a [[BatchAudit]] — exposed so batch
    * callers and tests share the exact monitor arithmetic.
    */
  def auditBatch(
      batch: DataFrame,
      rules: Seq[graft.operators.QualityRules.Rule],
      batchId: Long = -1L): BatchAudit = {
    val rows = graft.operators.QualityRules.audit(batch, rules).collect()
    BatchAudit(
      batchId,
      rows.headOption.map(_.getLong(1)).getOrElse(0L),
      rows.map(r => r.getString(0) -> r.getLong(2)).toMap)
  }

  /** Continuous monitoring: every micro-batch of `stream` audits
    * against `rules`; offsets live in `checkpoint`. The stream itself
    * is pass-through-less (audit only) — compose with a sink stream
    * for the data path, or do both in one foreachBatch caller-side.
    */
  def monitor(
      stream: DataFrame,
      rules: Seq[graft.operators.QualityRules.Rule],
      checkpoint: String,
      onBatch: BatchAudit => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onBatch(auditBatch(batch, rules, id))
        ()
      }
      .start()
}
