package graft.streaming

import graft.SparkTestBase
import graft.streaming.HeavyHitters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming Misra–Gries monitor must honor the classic MG
  * sandwich on REAL merged state — stored ≤ true ≤ stored + err for
  * every token, err ≤ n/(K+1) — and must catch a token that is cold
  * in every single delivery but hot in aggregate (the exact failure a
  * per-batch top-k monitor resets away).
  */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 4

  private def runStream(
      batches: Seq[Seq[String]]): Seq[Summary] = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val seen = scala.collection.mutable.ArrayBuffer[Summary]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-hh").toString
    val q = HeavyHitters.monitor(
      in.toDF(), "value", K, ckpt, s => { seen += s; () })
    batches.foreach { b =>
      in.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    seen.toSeq
  }

  private def sandwich(s: Summary, truth: Map[String, Long]): Unit = {
    assert(s.n == truth.values.sum, s"mass drifted: ${s.n}")
    assert(s.counters.size <= K, "summary over width")
    assert(s.err <= s.n / (K + 1),
      s"err ${s.err} above n/(K+1) = ${s.n / (K + 1)}")
    truth.foreach { case (t, tc) =>
      val c = s.counters.getOrElse(t, 0L)
      assert(c <= tc, s"$t overcounted: $c > $tc")
      assert(tc <= c + s.err, s"$t outside sandwich: $tc > $c + ${s.err}")
    }
    // the guarantee consumers rely on: true mass above err ⇒ present
    truth.foreach { case (t, tc) =>
      if (tc > s.err)
        assert(s.counters.contains(t), s"guaranteed-heavy $t shed")
    }
  }

  test("merged partials honor the MG sandwich on a skewed batch") {
    val toks = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 40).map(i => s"cold_$i")
    val truth = toks.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val s = summarizeBatch(
      toks.toDF("value").repartition(8), "value", K)
    sandwich(s, truth)
    assert(s.heavy.head._1 == "hot")
  }

  test("a steady token no per-batch view ranks first wins the merged state") {
    // per batch: a batch-LOCAL burst token (×7) tops "creep" (×5),
    // plus 8 one-off noise tokens — a monitor that resets per
    // delivery reports a different burst as top-1 every batch and
    // never creep; across 8 batches creep's 40 is the only mass above
    // the aggregate error bound (n/(K+1) = 160/5 = 32), so the MERGED
    // summary must not only hold it (the guarantee) but rank it
    // first: stored(creep) ≥ 40 − 32 = 8 > 7 ≥ stored(any burst) —
    // deterministic by the bounds, not by luck
    val batches = (0 until 8).map { b =>
      Seq.fill(7)(s"burst_$b") ++ Seq.fill(5)("creep") ++
        (0 until 8).map(i => s"noise_${b}_$i")
    }
    val truth = batches.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val states = runStream(batches)
    assert(states.size == batches.size)
    val fin = states.last
    sandwich(fin, truth)
    assert(truth("creep") == 40L && fin.n == 160L && fin.err <= 32L,
      s"fixture broke: n=${fin.n} err=${fin.err}")
    assert(fin.counters.contains("creep"),
      "the aggregate-heavy token was lost across micro-batch merges")
    assert(fin.heavy.head._1 == "creep",
      s"creep must outrank every batch-local burst: ${fin.heavy}")
    assert(fin.atLeast(0.04).map(_._1).contains("creep"),
      s"creep not provably ≥4%: ${fin.heavy}")
  }

  test("monitor state accumulates across deliveries; empty delivery is a no-op") {
    val states = runStream(Seq(
      Seq.fill(10)("a") ++ Seq.fill(3)("b"),
      Seq.empty,
      Seq.fill(7)("b")))
    assert(states.map(_.n) == Seq(13L, 13L, 20L))
    val fin = states.last
    assert(fin.counters("a") == 10L && fin.counters("b") == 10L,
      s"small-vocab counts must stay exact: ${fin.heavy}")
    assert(fin.err == 0L, "no decrement can occur under K distinct tokens")
  }

  test("merge is width-checked and guarantee-preserving in either order") {
    val x = summarizeBatch(
      (Seq.fill(9)("x") ++ Seq("p", "q", "r", "s", "t"))
        .toDF("value"), "value", K)
    val y = summarizeBatch(
      (Seq.fill(6)("y") ++ Seq("u", "v", "w", "p", "p"))
        .toDF("value"), "value", K)
    val truth = Map("x" -> 9L, "y" -> 6L, "p" -> 3L, "q" -> 1L,
      "r" -> 1L, "s" -> 1L, "t" -> 1L, "u" -> 1L, "v" -> 1L, "w" -> 1L)
    Seq(merge(x, y), merge(y, x)).foreach(sandwich(_, truth))
    intercept[IllegalArgumentException] {
      merge(x, empty(K + 1))
    }
    ()
  }
}
