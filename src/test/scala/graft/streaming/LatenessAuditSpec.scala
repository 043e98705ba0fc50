package graft.streaming

import graft.SparkTestBase
import graft.streaming.LatenessAudit._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming lateness classifier must give the SAME histogram as
  * the batch twin (q194) on the same arrivals — including when the
  * per-user high-water mark has to survive a micro-batch boundary.
  */
class LatenessAuditSpec extends SparkTestBase {
  import spark.implicits._

  // q194's crafted one-case-per-bucket stream (QueriesSpec): user 1
  // event times in seconds at arrival order 0..8, plus a lone user 2
  private val ts1 = Seq(0L, 100L, 70L, 1000L, 500L, 5000L, 2000L, 20000L, 10000L)
  private def arrivals: Seq[Arrival] =
    ts1.zipWithIndex.map { case (sec, i) =>
      Arrival(i.toLong, 1L, sec * 1000000L)
    } :+ Arrival(100L, 2L, 0L)

  private val expectBuckets = Map(
    "a_in_order" -> 4L, "b_lt_1m" -> 1L, "c_lt_10m" -> 1L,
    "d_lt_1h" -> 1L, "e_ge_1h" -> 1L)

  private def run(batches: Seq[Seq[Arrival]], name: String): Seq[Late] = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Arrival]
    val q = LatenessAudit.classify(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    // drain after EACH addData so every block is its own micro-batch
    // and state must carry across the boundary
    batches.foreach { b =>
      in.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[Late].collect().toSeq
  }

  test("one micro-batch classifies like the batch twin") {
    val got = run(Seq(arrivals), "late_one")
    assert(got.size == 8, s"user 1 has 8 events with a predecessor: $got")
    val hist = got.groupBy(_.bucket).map { case (b, xs) => (b, xs.size.toLong) }
    assert(hist == expectBuckets, s"hist=$hist")
    // skews are the exact designed values
    assert(got.map(_.skew_us).toSet ==
      Set(0L, 30000000L, 500000000L, 3000000000L, 10000000000L))
    // the lone user classifies nothing
    assert(!got.exists(_.user_id == 2L))
  }

  test("the high-water mark survives micro-batch boundaries") {
    // split INSIDE user 1's run, right before the worst late event:
    // its 20000 s mark is set in batch 1, the 10000 s event arrives
    // in batch 2 and must still read e_ge_1h from carried state
    val all = arrivals
    val got = run(Seq(all.take(8), all.drop(8)), "late_two")
    val hist = got.groupBy(_.bucket).map { case (b, xs) => (b, xs.size.toLong) }
    assert(hist == expectBuckets, s"hist=$hist")
    val worst = got.find(_.event_id == 8L).get
    assert(worst.bucket == "e_ge_1h" && worst.skew_us == 10000000000L,
      s"cross-batch state lost: $worst")
  }
}
