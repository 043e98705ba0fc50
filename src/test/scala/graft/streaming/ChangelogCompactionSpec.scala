package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** CDC latest-per-key view maintenance: incremental deliveries must
  * converge to the batch compaction of the full changelog (q109's
  * semantics) in ANY arrival order, idempotently under replay, in both
  * the full-rewrite and partition-grain commit modes.
  */
import graft.operators.PartitionedCommit.Layout

class ChangelogCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private val V = Seq("ts_us", "event_id")

  /** The fixture changelog: every event as (key, version..., payload). */
  private def log() = graft.sources.Tables(spark, sf(), "events")
    .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_id"), col("event_type"), col("value"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "ts_us", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet

  test("incremental deliveries converge to the batch compaction (both modes)") {
    val want = asSet(ChangelogCompaction.latestPerKey(log(), "user_id", V))
    // three deliveries split by event_id ranges — arbitrary but disjoint
    val parts = Seq(
      log().filter(col("event_id") % 3 === 0),
      log().filter(col("event_id") % 3 === 1),
      log().filter(col("event_id") % 3 === 2))
    for (buckets <- Seq(None, Some(Layout.Hash(4)))) {
      val path = tmp(s"cdc-${buckets.isDefined}") + "/view"
      parts.foreach(p =>
        ChangelogCompaction.applyDelta(p, path, "user_id", V, buckets))
      val got = asSet(
        spark.read.parquet(path).select(log().columns.map(col): _*))
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("a late out-of-order delivery never regresses the view") {
    val path = tmp("cdc-late") + "/view"
    val newer = Seq((1L, 2000L, 20L, "b", 2.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val older = Seq((1L, 1000L, 10L, "a", 1.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    ChangelogCompaction.applyDelta(newer, path, "user_id", V)
    ChangelogCompaction.applyDelta(older, path, "user_id", V) // late replay
    val got = asSet(spark.read.parquet(path))
    assert(got == Set((1L, 2000L, 20L, "b", 2.0)),
      s"old version must lose: $got")
  }

  test("applyDelta is idempotent under at-least-once replay") {
    val path = tmp("cdc-replay") + "/view"
    val d1 = log().filter(col("event_id") < 500)
    ChangelogCompaction.applyDelta(d1, path, "user_id", V, Some(Layout.Hash(4)))
    val first = asSet(spark.read.parquet(path)
      .select(log().columns.map(col): _*))
    ChangelogCompaction.applyDelta(d1, path, "user_id", V, Some(Layout.Hash(4))) // replay
    val second = asSet(spark.read.parquet(path)
      .select(log().columns.map(col): _*))
    assert(first == second)
  }

  test("the standing view matches q109's declared compaction") {
    val path = tmp("cdc-q109") + "/view"
    ChangelogCompaction.applyDelta(log(), path, "user_id", V, Some(Layout.Hash(4)))
    val got = spark.read.parquet(path)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    val q109 = graft.SparkEntry.queries("q109_cdc_compact")(spark, sf())
      .select("user_id", "last_ts_us", "last_event_id", "last_type",
        "last_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    assert(got == q109)
  }

  test("streaming maintain: micro-batches through a checkpointed query") {
    implicit val sq = spark.sqlContext
    val path = tmp("cdc-stream") + "/view"
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val q = ChangelogCompaction.maintain(
      in.toDF().toDF("user_id", "ts_us", "event_id", "event_type", "value"),
      path, tmp("cdc-ckpt"), "user_id", V, Some(Layout.Hash(2)))
    in.addData((1L, 100L, 1L, "a", 1.0), (2L, 100L, 2L, "a", 1.0))
    q.processAllAvailable()
    in.addData((1L, 200L, 3L, "b", 2.0), (3L, 50L, 4L, "c", 3.0))
    q.processAllAvailable()
    q.stop()
    val got = asSet(spark.read.parquet(path)
      .select("user_id", "ts_us", "event_id", "event_type", "value"))
    assert(got == Set((1L, 200L, 3L, "b", 2.0), (2L, 100L, 2L, "a", 1.0),
      (3L, 50L, 4L, "c", 3.0)))
  }
}
