package graft.streaming

import graft.SparkTestBase
import graft.streaming.Sessionize._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Stateful sessionization: the streaming operator's *closed* sessions
  * must agree with a batch gap-split over the same events (the open
  * tail session stays in state and is correctly absent from output).
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private val gapUs = 100L

  private def batchSessions(evs: Seq[SessEvent]): Set[Session] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val sorted = es.map(_.ts_us).sorted
      val splits = sorted.foldLeft(List.empty[List[Long]]) {
        case (Nil, t) => List(List(t))
        case (cur :: done, t) if t - cur.head > gapUs =>
          List(t) :: cur :: done
        case (cur :: done, t) => (t :: cur) :: done
      }
      // head of `splits` is the open (last) session — drop it
      splits.tail.map(s =>
        Session(uid, s.last, s.head, s.size.toLong))
    }.toSet

  test("closed sessions from the stream match a batch gap-split") {
    val evs = Seq(
      SessEvent(1L, 0L), SessEvent(1L, 50L), SessEvent(1L, 90L), // s1
      SessEvent(1L, 300L), SessEvent(1L, 350L), // s2
      SessEvent(1L, 900L), // open tail
      SessEvent(2L, 10L), SessEvent(2L, 500L), // s1 + open tail
      SessEvent(3L, 5L)) // open tail only — no output
    val dir = Files.createTempDirectory("graft-sess").toString
    evs.toDS().write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(evs.toDS().schema)
      .parquet(dir)
      .as[SessEvent]
    val q = Sessionize.sessions(stream, gapUs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("sess_out").as[Session].collect().toSet
    assert(got == batchSessions(evs))
    assert(!got.exists(_.user_id == 3L))
  }

  test("late cross-batch event merges without moving the session backwards") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val q = Sessionize.sessions(in.toDS(), gapUs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out").start()

    // batch 1: open session [800, 880] (within the 100 us gap)
    in.addData(SessEvent(1L, 800L), SessEvent(1L, 880L))
    q.processAllAvailable()
    // batch 2: a LATE event (810, behind the open session's last=880)
    // then 955 — 955-880=75 <= gap so the session must stay open; with
    // naive last_us overwrite the merge of 810 would set last=810 and
    // 955-810=145 > gap would wrongly close the session
    in.addData(SessEvent(1L, 810L), SessEvent(1L, 955L))
    q.processAllAvailable()
    // batch 3: far future event closes the (single) session
    in.addData(SessEvent(1L, 10000L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_late_out").as[Session].collect().toSet
    assert(got == Set(Session(1L, 800L, 955L, 4L)))
  }

  test("an event gap-older than the open session closes as its own singleton") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val q = Sessionize.sessions(in.toDS(), gapUs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_stale_out").start()

    // batch 1: open session starts at 5000
    in.addData(SessEvent(1L, 5000L), SessEvent(1L, 5050L))
    q.processAllAvailable()
    // batch 2: 1000 precedes the open start by 4000 > gap(100): it
    // must NOT drag the open session's start back to 1000 — it closes
    // as a singleton (its own neighborhood was never seen)
    in.addData(SessEvent(1L, 1000L), SessEvent(1L, 5120L))
    q.processAllAvailable()
    // close the open session
    in.addData(SessEvent(1L, 99999L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_stale_out").as[Session].collect().toSet
    assert(got.contains(Session(1L, 1000L, 1000L, 1L)))
    assert(got.contains(Session(1L, 5000L, 5120L, 3L)))
  }

  test("gap-stale events arriving together merge with each other, not as singletons") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val q = Sessionize.sessions(in.toDS(), gapUs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_stale2_out").start()

    in.addData(SessEvent(1L, 5000L))
    q.processAllAvailable()
    // one batch with two stale events within the gap of EACH OTHER
    // (1000, 1080) and one far-stale loner (3000): batch semantics
    // would make sessions {1000,1080} and {3000}
    in.addData(SessEvent(1L, 1000L), SessEvent(1L, 1080L), SessEvent(1L, 3000L))
    q.processAllAvailable()
    in.addData(SessEvent(1L, 99999L)) // close the open session
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_stale2_out").as[Session].collect().toSet
    assert(got.contains(Session(1L, 1000L, 1080L, 2L)), got.toString)
    assert(got.contains(Session(1L, 3000L, 3000L, 1L)), got.toString)
    assert(got.contains(Session(1L, 5000L, 5000L, 1L)), got.toString)
  }

  test("sessionsWithTimeout flushes an idle user's open session via the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    // gap 10 min; watermark 1 min
    val out = Sessionize.sessionsWithTimeout(
      in.toDF().toDF("user_id", "ts"), gapUs = 600000000L, watermark = "1 minute")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout_out").start()

    // user 1 sends two events then goes idle FOREVER
    in.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    assert(spark.table("sess_timeout_out").count() == 0) // still open
    // OTHER users advance the watermark far past user 1's gap horizon —
    // with NoTimeout semantics user 1's session would never emit
    in.addData((2L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    in.addData((3L, ts("2024-01-01 03:00:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_timeout_out").as[Session].collect().toSet
    val expectStart = ts("2024-01-01 00:00:00").getTime * 1000L
    val expectLast = ts("2024-01-01 00:05:00").getTime * 1000L
    assert(got.contains(Session(1L, expectStart, expectLast, 2L)), got.toString)
  }
}
