package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Map-typed column capability (SURVEY.md §2.2 scalar-fn families:
  * string/date/math/array/json are exercised by the declared queries;
  * maps live here because map key order is engine-specific, so no
  * cross-engine oracle — semantics are pinned by value assertions).
  */
class MapFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("build, probe, merge, and transform map columns") {
    val df = Seq((1L, Seq("a", "b"), Seq(10, 20)))
      .toDF("id", "ks", "vs")
      .withColumn("m", map_from_arrays(col("ks"), col("vs")))

    val probed = df.select(
      element_at(col("m"), "b").as("b_val"),
      map_keys(col("m")).as("keys"),
      size(col("m")).as("n"))
      .head()
    assert(probed.getInt(0) == 20)
    assert(probed.getSeq[String](1).toSet == Set("a", "b"))
    assert(probed.getInt(2) == 2)

    val merged = df.select(
      map_concat(col("m"), map(lit("c"), lit(30))).as("m2"))
      .select(element_at(col("m2"), "c"), size(col("m2"))).head()
    assert(merged.getInt(0) == 30 && merged.getInt(1) == 3)

    val doubled = df.select(
      transform_values(col("m"), (_, v) => v * 2).as("m3"))
      .select(element_at(col("m3"), "a")).head()
    assert(doubled.getInt(0) == 20)

    // map ↔ entries roundtrip keeps content
    val roundtrip = df.select(
      map_from_entries(map_entries(col("m"))).as("m4"))
      .select(element_at(col("m4"), "a"), element_at(col("m4"), "b")).head()
    assert(roundtrip.getInt(0) == 10 && roundtrip.getInt(1) == 20)
  }

  test("per-group map aggregation via map_from_entries(collect_list)") {
    val events = Seq((1L, "click", 2L), (1L, "view", 5L), (2L, "click", 1L))
      .toDF("user_id", "etype", "cnt")
    val m = events.groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("etype"), col("cnt"))))
        .as("counts"))
      .select(col("user_id"), element_at(col("counts"), "click").as("clicks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 2L, 2L -> 1L))
  }
}
