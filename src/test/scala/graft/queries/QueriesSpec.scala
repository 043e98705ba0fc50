package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Per-query smoke + targeted semantics at sf0.001, plus physical-plan
  * assertions for the scale-critical shapes (SURVEY.md §5.3). The
  * exact value gate is the driver's DuckDB compare (tools/check.py
  * locally); these tests pin invariants that survive data changes.
  */
class QueriesSpec extends SparkTestBase {

  test("every declared query runs and yields a deterministic result at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df1 = fn(spark, sf())
      val n = df1.count()
      assert(n >= 0, s"$name failed")
      // q29's buckets can be empty at tiny sf; everything else returns rows
      if (name != "q29_ann_lsh") assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key exists in queries, names are aligned") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k)))
  }

  test("smoke entry returns region revenue (rows > 0)") {
    assert(SparkEntry.entry(spark).count() == 5)
  }

  test("q07 plan broadcasts the dims and pushes the shipdate filter") {
    val plan = SparkEntry.queries("q07_join_denorm")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filter should push into the parquet scan")
  }

  test("q12 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("q12_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q01 pushes all three predicates to the scan") {
    val plan = SparkEntry.queries("q01_scan_filter")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate")
      && plan.contains("l_quantity"))
  }

  test("q02 prunes columns at the scan (ReadSchema has only 3 fields)") {
    val plan = SparkEntry.queries("q02_project_prune")(spark, sf())
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && !readSchema.contains("o_orderstatus"))
  }

  test("dedup idempotence: q22 survivors are all distinct hashes") {
    val out = SparkEntry.queries("q22_dedup_docs")(spark, sf())
    assert(out.select("h").distinct().count() == out.count())
  }

  test("q09 ratios sum to 1") {
    val s = SparkEntry.queries("q09_ratio_of_total")(spark, sf())
      .agg(org.apache.spark.sql.functions.sum("ratio")).head().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
  }

  test("q20 rollup grand total equals sum of leaves") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q20_grouping_rollup")(spark, sf()).cache()
    val grand = df.filter(col("r_name").isNull).select("n_orders").head().getLong(0)
    val leaves = df.filter(col("r_name").isNotNull && col("n_name").isNotNull)
      .agg(sum("n_orders")).head().getLong(0)
    assert(grand == leaves)
    df.unpersist()
  }

  test("anti ⊎ semi partitions customer on the same predicate") {
    import org.apache.spark.sql.functions._
    val d = sf()
    val anti = SparkEntry.queries("q05_anti_join")(spark, d).count()
    val cust = graft.sources.Tables(spark, d, "customer").count()
    val semi = graft.sources.Tables(spark, d, "customer")
      .join(graft.sources.Tables(spark, d, "orders")
        .filter(col("o_orderdate") < lit("1995-07-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + semi == cust)
  }

  test("q26 minhash candidates verify to a subset of q25 exact pairs") {
    val exact = SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sf())
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("q26_dedup_minhash")(spark, sf())
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact))
    // 16 bands x 2 rows at j>=0.5 → recall should be high on the fixture
    assert(mh.size >= exact.size / 2, s"minhash recall too low: ${mh.size}/${exact.size}")
  }
}
