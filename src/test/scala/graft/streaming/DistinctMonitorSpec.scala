package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The exact-distinct monitor's laws: per-key counts equal the true
  * distinct of everything delivered so far, redelivery is IDEMPOTENT
  * (the property that justifies bitmaps over counters), and state
  * grows with true cardinality, not with delivery count.
  */
class DistinctMonitorSpec extends SparkTestBase {
  import spark.implicits._

  test("batch summarize + absorb == exact distinct per key") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 2L), ("a", 70000L),
      ("b", 1L), ("b", 1L)).toDF("k", "id")
    val st = new DistinctMonitor.State
    st.absorb(DistinctMonitor.summarizeBatch(df, "k", "id"))
    val r = st.report
    assert(r.perKey == Map("a" -> 3L, "b" -> 1L), s"got ${r.perKey}")
    // id 70000 crossed into a second 32768-bit bucket
    assert(st.m.keys.count(_._1 == "a") == 2, "expected two buckets for a")
  }

  test("null keys and ids carry no bits") {
    val df = Seq(
      (Some("a"), Some(1L)), (None, Some(2L)), (Some("a"), None))
      .toDF("k", "id")
    val st = new DistinctMonitor.State
    st.absorb(DistinctMonitor.summarizeBatch(df, "k", "id"))
    assert(st.report.perKey == Map("a" -> 1L))
  }

  test("streaming: exact across deliveries, idempotent under redelivery") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val seen = scala.collection.mutable.ArrayBuffer[DistinctMonitor.Report]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dm").toString
    val q = DistinctMonitor.monitor(
      in.toDF().toDF("k", "id"), "k", "id", ckpt, r => { seen += r; () })
    val b1 = (1L to 500L).map(i => ("a", i)) ++ Seq(("b", 1L))
    val b2 = (251L to 750L).map(i => ("a", i)) // 250 overlap with b1
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    // redelivery of batch 2's content: counts must NOT move
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    assert(seen.size == 3, s"expected 3 deliveries, got ${seen.size}")
    assert(seen(0).perKey == Map("a" -> 500L, "b" -> 1L))
    assert(seen(1).perKey == Map("a" -> 750L, "b" -> 1L))
    assert(seen(2).perKey == seen(1).perKey,
      s"redelivery inflated the count: ${seen(2).perKey}")
    // state bytes grew only when true cardinality grew
    assert(seen(2).stateBytes == seen(1).stateBytes,
      "replay must not grow state")
  }
}
