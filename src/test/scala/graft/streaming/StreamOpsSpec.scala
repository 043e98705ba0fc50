package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Stateful streaming operators: watermark-bounded dedup and the
  * stream-stream interval join.
  */
class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupStream drops within-watermark duplicates across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = EventStream.dedupStream(
      in.toDF().toDF("ts", "event_id", "event_type"),
      keyCol = "event_id", watermark = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    in.addData(
      (ts("2024-01-01 00:00:00"), 1L, "click"),
      (ts("2024-01-01 00:00:05"), 1L, "click"), // same-batch dup
      (ts("2024-01-01 00:01:00"), 2L, "view"))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 00:02:00"), 1L, "click")) // cross-batch dup
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L))
  }

  test("stream-stream interval join matches purchases within the horizon") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val out = EventStream.clickToPurchase(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().select($"_1".as("ts"), $"_2".as("user_id"),
        $"_3".as("value")),
      horizon = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()

    clicks.addData((ts("2024-01-01 00:00:00"), 1L))
    purchases.addData(
      (ts("2024-01-01 00:30:00"), 1L, 9.5), // within horizon → match
      (ts("2024-01-01 02:00:00"), 1L, 7.0), // past horizon → no match
      (ts("2024-01-01 00:30:00"), 2L, 3.0)) // no click → no match
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_out")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 9.5)))
  }
}
