package graft.operators

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join preserves inner-join semantics on a skewed key") {
    // 90% of rows share key 1 (the hot key), plus two cold keys
    val large = ((1 to 900).map(i => (1L, s"hot$i")) ++
      Seq((2L, "cold-a"), (3L, "cold-b"), (4L, "no-match")))
      .toDF("k", "payload")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3"), (5L, "unused"))
      .toDF("k", "dim")

    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = SkewJoin.saltedJoin(large, small, "k", salts = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted == plain)
    assert(plain.size == 902)
  }

  test("saltedSelfPairs: hot-key path emits the identical pair multiset") {
    // occurrences: hot key 0 shared by ids 0..29 (df=30 > hotDf=4),
    // cold keys 100+i shared by id pairs (i, i+1) for i in 0..9
    val occ = ((0 until 30).map(i => (0L, i.toLong)) ++
      (0 until 10).flatMap(i => Seq((100L + i, i.toLong), (100L + i, i + 1L))))
      .toDF("k", "id")
    def pairs(hotDf: Int) = SkewJoin.saltedSelfPairs(occ, "k", "id", hotDf, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val plain = pairs(hotDf = Int.MaxValue)
    val salted = pairs(hotDf = 4)
    assert(plain == salted, "pair multisets must match")
    // 30*29/2 hot pairs + 10 cold pairs; (i,i+1) pairs for i<10 appear
    // twice (once via hot key 0, once via their cold key)
    assert(plain.values.sum == 30 * 29 / 2 + 10)
    assert(plain((0L, 1L)) == 2)
  }

  test("salt actually spreads the hot key across sub-partitions") {
    import org.apache.spark.sql.functions._
    val large = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salts = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected >=6 distinct salts, got $salts")
  }
}
