package graft.operators

import graft.SparkTestBase

class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("known graph: components get min-id labels") {
    // components: {1,2,3} via 1-2, 2-3; {10,11}; {20} self-pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
      .toDF("a", "b")
    val got = DedupClusters.assign(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("chain needing multiple propagation rounds converges") {
    // a path 0-1-2-...-9: min label must travel the whole chain
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val got = DedupClusters.assign(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 10 && got.values.forall(_ == 0L))
  }

  test("a component deeper than maxIters fails loudly instead of mislabeling") {
    // a path 0-1-...-8 needs ~8 propagation rounds; maxIters=3 must
    // throw NotConverged, never return partial labels
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[DedupClusters.NotConverged] {
      DedupClusters.assign(pairs, "a", "b", maxIters = 3)
    }
    assert(e.stillChanging > 0)
  }

  test("large/small-star converges logarithmically on a chain too deep for min-label") {
    // a 61-node path has diameter 60: min-label would need ~60 rounds,
    // large/small-star must finish well inside its default 25
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val got = DedupClusters.assignLogRounds(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 61 && got.values.forall(_ == 0L))
  }

  test("large/small-star agrees with min-label on a mixed component graph") {
    // components: {1,2,3,4}, {10,11}, {20} (self-pair), plus a 12-chain
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L)) ++
      (100L until 111L).map(i => (i, i + 1))).toDF("a", "b")
    val a = DedupClusters.assign(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    val b = DedupClusters.assignLogRounds(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("empty pair set yields an empty label frame, not an error") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(DedupClusters.assign(pairs, "a", "b").count() == 0)
  }

  test("survivors: one min-id survivor per cluster with size") {
    val pairs = Seq((5L, 7L), (7L, 6L), (100L, 42L)).toDF("a", "b")
    val got = DedupClusters.survivors(pairs, "a", "b")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((5L, 5L, 3L), (42L, 42L, 2L)))
  }
}
