package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {

  // bind each frame ONCE per use: a fresh read carries fresh
  // expression ids, and mixing two reads' attributes in one join
  // fails analysis
  private lazy val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
  private lazy val dim = spark.read.parquet(s"${sf()}/orders.parquet")
    .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
    .select(col("o_orderkey"))

  test("prune admits every true match (no false negatives)") {
    val pruned = BloomPrune.prune(li, "l_orderkey", dim, "o_orderkey")
    val exact = li.join(dim, li("l_orderkey") === dim("o_orderkey"),
      "left_semi")
    // every exact-semi-join row must survive the bloom prefilter
    val lost = exact.join(pruned.select(col("l_orderkey"), col("l_linenumber")),
      Seq("l_orderkey", "l_linenumber"), "left_anti").count()
    assert(lost == 0L, s"bloom dropped $lost true matches")
  }

  test("prune ∘ exact-join ≡ exact-join, and the prefilter actually cuts") {
    val pruned = BloomPrune.prune(li, "l_orderkey", dim, "o_orderkey")
    val viaBloom = pruned.join(dim, pruned("l_orderkey") === dim("o_orderkey"),
      "left_semi")
    val exact = li.join(dim, li("l_orderkey") === dim("o_orderkey"),
      "left_semi")
    assert(viaBloom.count() == exact.count())
    // realized reduction: the pruned side must be far below the fact
    // count (the dim is selective) and within fpp slack of the truth
    val n = li.count().toDouble
    val p = pruned.count().toDouble
    val e = exact.count().toDouble
    assert(p < n * 0.9, s"bloom pruned nothing: $p of $n")
    assert(p >= e, "pruned side cannot be smaller than the true matches")
    assert(p - e <= n * 0.05 + 10,
      s"false-positive mass too high: pruned=$p exact=$e fact=$n")
  }

  test("probe expression evaluates membership over integral keys") {
    val keys = spark.range(0, 1000).toDF("k")
    val bloom = BloomPrune.buildFor(keys, "k", 1000, 0.01)
    val probe = spark.range(0, 2000).toDF("k")
      .filter(BloomPrune.mightContain(bloom, col("k")))
    val got = probe.count()
    // all 1000 true keys pass; ≤ ~3% of the 1000 non-keys may alias
    assert(got >= 1000 && got <= 1030, s"unexpected probe count $got")
  }

  test("buildFor refuses a driver-unsafe key count loudly") {
    val keys = spark.range(0, 10).toDF("k")
    intercept[IllegalArgumentException] {
      BloomPrune.buildFor(keys, "k", BloomPrune.MaxKeys + 1)
    }
  }
}
