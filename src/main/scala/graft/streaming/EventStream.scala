package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Structured-Streaming face of the engine (SURVEY.md §7 step 7).
  *
  * The reference's status stream (D4, `Batch Processor.py:399-418`)
  * is append-only with no time semantics; this extends it with real
  * event-time processing: watermarked tumbling windows and severity
  * classification, over any `events`-shaped streaming DataFrame
  * (`readStream` parquet/kafka/socket — source-agnostic).
  *
  * All transforms are expressed on an unbounded DataFrame, so the same
  * functions also run in batch (feed them a `spark.read` frame) —
  * that's how the scalatest suite and the DuckDB-checked q17 share
  * semantics with this streaming path.
  */
object EventStream {

  /** Tumbling-window counts + exact fixed-point value sums with a
    * watermark for late-data cutoff. Output schema:
    * (window_start TIMESTAMP, event_type STRING, cnt LONG, sum_value DOUBLE).
    */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 day",
      watermark: String = "1 hour"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** Severity classification of the live stream — the q10/A13 CASE
    * WHEN applied before sinking to a status log.
    */
  def classify(events: DataFrame): DataFrame =
    events.withColumn("severity",
      when(col("event_type").contains("error"), "red")
        .when(col("event_type").isin("purchase", "signup"), "green")
        .otherwise("blue"))
}
