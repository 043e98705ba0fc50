package graft.streaming

import graft.SparkTestBase
import graft.streaming.QuantileMonitor._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming KLL monitor's quantiles must sit within the sketch's
  * OWN published rank-error bound of the exact distribution — gated at
  * 3× the 99%-confidence bound so the randomized compaction can never
  * flake the suite — and the standing sketch must keep absorbing
  * deliveries across micro-batch boundaries.
  */
class QuantileMonitorSpec extends SparkTestBase {
  import spark.implicits._

  /** Exact normalized rank of `x` in `sorted` (≤ x share). */
  private def exactRank(sorted: Vector[Double], x: Double): Double =
    sorted.count(_ <= x).toDouble / sorted.size

  private def gateRanks(
      r: Report, sorted: Vector[Double], slack: Double): Unit = {
    assert(r.n == sorted.size, s"mass drifted: ${r.n} vs ${sorted.size}")
    assert(r.min == sorted.head && r.max == sorted.last,
      "KLL keeps exact extremes")
    Seq(0.50 -> r.p50, 0.95 -> r.p95, 0.99 -> r.p99).foreach {
      case (q, v) =>
        val got = exactRank(sorted, v)
        assert(math.abs(got - q) <= slack,
          s"p${(q * 100).toInt}: value $v has exact rank $got, " +
            s"off by ${math.abs(got - q)} > $slack")
    }
  }

  test("batch sketch quantiles sit inside 3x the published rank error") {
    // a deliberately skewed mix: bulk uniform + a heavy tail
    val vals = ((1 to 9000).map(_.toDouble) ++
      (1 to 1000).map(i => 9000.0 + i * 100.0)).toVector
    val sk = summarizeBatch(
      vals.toDF("v").repartition(8), "v", 200)
    val r = report(sk)
    assert(r.rankEps > 0.0 && r.rankEps < 0.05,
      s"default-k bound should be ~1.65%: ${r.rankEps}")
    gateRanks(r, vals.sorted, 3.0 * r.rankEps)
  }

  test("the standing sketch accumulates across deliveries; empty is a no-op") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Double]
    val seen = scala.collection.mutable.ArrayBuffer[Report]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-qm").toString
    val q = QuantileMonitor.monitor(
      in.toDF(), "value", ckpt, r => { seen += r; () })
    val b1 = (1 to 4000).map(_.toDouble)
    val b3 = (4001 to 10000).map(_.toDouble)
    Seq(b1, Seq.empty[Double], b3).foreach { b =>
      if (b.nonEmpty) in.addData(b: _*) else in.addData()
      q.processAllAvailable()
    }
    q.stop()
    // MemoryStream delivers an empty addData as no batch in some
    // versions — gate on at least the two data deliveries
    assert(seen.map(_.n).lastOption.contains(10000L),
      s"final mass: ${seen.map(_.n)}")
    assert(seen.head.n == 4000L, "first delivery must report alone")
    val fin = seen.last
    gateRanks(fin, (1 to 10000).map(_.toDouble).toVector,
      3.0 * fin.rankEps)
    // the merged p50 must reflect BOTH deliveries: batch 1 alone has
    // p50 ≈ 2000, merged ≈ 5000 — state provably crossed the boundary
    assert(fin.p50 > 4000.0,
      s"merged median ${fin.p50} still reads like batch 1's")
  }

  test("nulls and NaNs are dropped, not absorbed into quantiles") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0), Some(2.0))
      .toDF("v")
    val sk = summarizeBatch(df, "v", 200)
    val r = report(sk)
    assert(r.n == 3L && r.min == 1.0 && r.max == 3.0, s"got $r")
  }
}
