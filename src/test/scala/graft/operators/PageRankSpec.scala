package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gates for the exact integer-scaled PageRank ([[PageRank]]):
  * the two faces (driver-local over a collected edge list; distributed
  * graph-grain joins) must agree bit-for-bit, the arithmetic must be
  * edge-order independent (what makes q204 oracle-checkable at all),
  * and the rank mass must obey the sink-leak bounds the scaladoc
  * declares.
  */
class PageRankSpec extends SparkTestBase {

  // a small directed graph with a hub (everything points at "hub"),
  // a chain, and a SINK ("leaf" has no out-edges — the dangling case)
  private val edges: Seq[(String, String, Long)] = Seq(
    ("a", "hub", 3L), ("b", "hub", 2L), ("c", "hub", 5L),
    ("hub", "a", 1L), ("hub", "leaf", 4L),
    ("a", "b", 1L), ("b", "c", 2L), ("c", "leaf", 1L))

  test("local face: deterministic, edge-order independent, mass-bounded") {
    val r1 = PageRank.ranksLocal(edges, 10)
    val r2 = PageRank.ranksLocal(scala.util.Random.shuffle(edges), 10)
    assert(r1 == r2, "rank must not depend on edge order")
    val n = r1.size
    assert(n == 5)
    val tele = 15L * PageRank.Scale / (100L * n)
    val total = r1.map(_._2).sum
    // sink leak: mass stays under Scale but every node keeps >= tele
    assert(total <= PageRank.Scale, s"mass $total exceeds Scale")
    assert(r1.forall(_._2 >= tele), "every node keeps the teleport floor")
    // the hub receives the most weighted in-mass and must outrank
    // every node that forwards its mass on; only the SINK (which
    // keeps everything it receives) may sit above it
    val rm = r1.toMap
    assert(Seq("a", "b", "c").forall(nd => rm("hub") > rm(nd)),
      s"hub must outrank the forwarding nodes: $r1")
    assert(rm("leaf") > rm("a"), s"the sink accumulates: $r1")
  }

  test("distributed face ≡ local face, bit for bit") {
    val df = spark.createDataFrame(edges).toDF("src", "dst", "w")
    val out = PageRank.ranks(df, 7)
    val dist = out.collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    out.unpersist()
    val local = PageRank.ranksLocal(edges, 7).sortBy(_._1)
    assert(dist.toSeq == local,
      s"faces diverge:\n dist=$dist\n local=$local")
  }

  test("distributed face survives a wide-weight graph (no long overflow)") {
    // weights near 1e12 × full rank mass cross 2^63 in the 85·r·w
    // product — the DECIMAL(38,0)/BigInt carry is what keeps both
    // faces exact; a long-arithmetic regression overflows negative
    val wide = Seq(("s", "t", 900000000000L), ("t", "s", 800000000000L),
      ("s", "u", 100000000000L))
    val df = spark.createDataFrame(wide).toDF("src", "dst", "w")
    val out = PageRank.ranks(df, 4)
    val dist = out.collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    out.unpersist()
    val local = PageRank.ranksLocal(wide, 4).sortBy(_._1)
    assert(dist.toSeq == local)
    assert(dist.forall(_._2 > 0L), s"overflow sign flip: $dist")
  }

  test("q204 grain: the declared query's edge frame stays dimension-bounded") {
    // the declared query collects the edge frame — this pins the bound
    // that makes that collect legitimate at ANY scale factor:
    // |edges| ≤ |nations|²
    val q = graft.SparkEntry.queries("q204_nation_pagerank")(spark, sf())
    val nations = spark.read.parquet(s"${sf()}/nation.parquet").count()
    assert(q.count() <= nations, "one rank row per participating nation")
    val ranks = q.collect()
    // rank column mirrors units exactly (display-only derivation)
    ranks.foreach { r =>
      val units = r.getLong(r.fieldIndex("rank_units"))
      val disp = r.getDouble(r.fieldIndex("rank"))
      assert(math.abs(disp - units.toDouble / 1e12) < 1e-6)
    }
  }
}
