package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name without running the whole
  * bench — median-of-N with the same noop-sink methodology as
  * [[Bench]], same local[32] shape as the driver's bench run.
  *
  * Usage: runMain graft.TimeQuery q26_dedup_minhash [q25_...] —
  * env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_RUNS
  * as in Bench.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // opt-in durable index tier, same env contract as Bench/Verify —
    // without this a cold-vs-warm store measurement silently measures
    // store-off twice
    graft.sources.IndexStore.enableFromEnv(spark)
    args.foreach { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"TIME $name%-28s median=$med%7.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
