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

  test("salt actually spreads the hot key across sub-partitions") {
    import org.apache.spark.sql.functions._
    val large = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salts = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected >=6 distinct salts, got $salts")
  }
}
