package graft.plans

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkTestBase {

  test("matches the window formulation on lineitem") {
    val li = Tables(spark, sf(), "lineitem")
    val got = GroupedTopK.topK(li, Seq("l_orderkey"),
        Seq(("l_extendedprice", true), ("l_linenumber", false)), 2)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val expected = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

    assert(got == expected && got.nonEmpty)
  }

  test("plans partial (pre-shuffle) and final execs around one exchange") {
    val li = Tables(spark, sf(), "lineitem")
    val plan = GroupedTopK.topK(li, Seq("l_orderkey"),
        Seq(("l_extendedprice", true), ("l_linenumber", false)), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialGroupedTopK"), plan)
    assert(plan.contains("FinalGroupedTopK"), plan)
    // partial must sit BELOW the exchange (map side)
    val px = plan.indexOf("PartialGroupedTopK")
    val ex = plan.indexOf("Exchange")
    assert(ex >= 0 && ex < px, s"exchange must be above partial:\n$plan")
  }

  test("map-side reduction bounds rows through the shuffle") {
    import spark.implicits._
    // one hot group with 10k rows across partitions; k=3
    val df = (1 to 10000).map(i => (1L, i.toLong)).toDF("g", "v")
      .repartition(4)
    val out = GroupedTopK.topK(df, Seq("g"), Seq(("v", true)), 3)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10000L), (1L, 9999L), (1L, 9998L)))
  }
}
