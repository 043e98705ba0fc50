package graft.sources

import graft.SparkTestBase

/** Bucketed layout ⇒ co-located, exchange-free joins — the pay-the-
  * shuffle-once scale strategy (SURVEY.md §2.4 engine components).
  */
class BucketedSpec extends SparkTestBase {

  test("joining two same-bucketed tables plans no Exchange") {
    val orders = Tables(spark, sf(), "orders")
    val lineitem = Tables(spark, sf(), "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    // clean any leftover table location from a previous JVM (the
    // catalog is fresh per session but the warehouse dir may not be)
    Seq("b_orders", "b_lineitem").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), tbl)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Bucketed.write(orders, "b_orders", "o_orderkey", 4)
    Bucketed.write(lineitem, "b_lineitem", "o_orderkey", 4)

    // force the sort-merge path (the tables are tiny, so the planner
    // would otherwise broadcast and never consult bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.join(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // and it computes the same rows as the plain shuffled join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
