package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Event-time semantics under late data: append-mode windows only emit
  * once the watermark passes them, and an event arriving behind the
  * watermark is dropped — the reference's append-only status stream
  * (D4) upgraded with real time semantics.
  */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append mode: late event behind the watermark is dropped") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.tumblingCounts(df,
      windowLen = "1 hour", watermark = "10 minutes")
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("wm_out")
      .start()

    // batch 1: two events in the 00:00 window, one far ahead that
    // advances the watermark past 00:59 (wm = 03:00 - 10 min)
    in.addData(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:20:00"), "click", 2.0),
      (ts("2024-01-01 03:00:00"), "view", 5.0))
    q.processAllAvailable()
    // batch 2: a late click at 00:30 — behind the watermark, must be
    // dropped, not added to the already-emitted 00:00 window
    in.addData((ts("2024-01-01 00:30:00"), "click", 100.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_out")
      .select("window_start", "event_type", "cnt", "sum_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    // the 00:00 click window emitted exactly once, with 2 events —
    // the late 100.0 never appears anywhere
    assert(rows == Set(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
  }

  test("session_window merges gap-close events and emits once the watermark passes") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val agg = EventStream.sessionCounts(
      in.toDF().toDF("ts", "user_id", "value"),
      gap = "30 minutes", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sw_out").start()

    in.addData(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0), // same session (gap 30 m)
      (ts("2024-01-01 12:00:00"), 1L, 4.0)) // new session
    q.processAllAvailable()
    // advance the watermark far past both sessions to flush them
    in.addData((ts("2024-01-01 20:00:00"), 9L, 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sw_out")
      .filter(col("user_id") === 1L)
      .collect().map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4))).toSet
    // end = last event + gap (built-in session_window semantics)
    assert(rows == Set(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0),
      ("2024-01-01 12:00:00.0", "2024-01-01 12:30:00.0", 1L, 4.0)))
  }
}
