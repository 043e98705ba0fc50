package graft.streaming

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Structured-Streaming face: the same transforms run (a) in batch and
  * (b) as a file-source stream with AvailableNow trigger into a memory
  * sink, and agree.
  */
class EventStreamSpec extends SparkTestBase {

  test("tumbling counts: stream (file source) == batch on the same data") {
    val events = Tables(spark, sf(), "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)

    val batchOut = EventStream.tumblingCounts(spark.read.parquet(dir))
      .orderBy("window_start", "event_type").collect().toSeq

    val stream = spark.readStream
      .schema(events.schema)
      .parquet(dir)
    val q = EventStream.tumblingCounts(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("tumbling_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamOut = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamOut.nonEmpty)
    assert(streamOut == batchOut)
  }

  test("spike monitor: batch face == q82, stream face == batch face") {
    val events = Tables(spark, sf(), "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val moments = EventStream.hourlyMoments(events)

    // batch face flags exactly the cells q82 flags (shared predicate,
    // same moments — only the hour representation differs)
    val batchFlags = EventStream.spikeFlags(events, moments)
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val q82Flags = graft.SparkEntry.queries("q82_spike_detect")(spark, sf())
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2))).toSet
    assert(batchFlags == q82Flags,
      s"only-stream-face=${batchFlags -- q82Flags}, only-q82=${q82Flags -- batchFlags}")

    // stream face (file source, AvailableNow) agrees with the batch face
    val dir = Files.createTempDirectory("graft-spike-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = EventStream.spikeFlags(stream, moments)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("spike_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamFlags = spark.table("spike_out")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamFlags == batchFlags)
  }

  test("classify tags severities like q10") {
    val out = EventStream.classify(Tables(spark, sf(), "events"))
      .groupBy("severity").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("red", "green", "blue"))
    assert(out.values.sum == Tables(spark, sf(), "events").count())
  }
}
