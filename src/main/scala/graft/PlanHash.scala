package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: verify a query's [[graft.plans.PlanFingerprint]] is
  * SESSION-STABLE — the property the bench's attribution anchor
  * stands on. Runs each named query in two fresh sessions of one JVM
  * (fresh sessions = empty session caches, so index bases rebuild —
  * the store-cold/store-warm axis is driven by the usual
  * `SPARK_GRAFT_INDEX_ROOT` env), prints the two hashes, and on
  * mismatch the first differing plan lines — which is how the r8
  * unordered-collect literals (survivors/centroids/hot sets) were
  * found.
  *
  * Usage: runMain graft.PlanHash q91_heavy_hitters [q40_...] —
  * env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object PlanHash {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    graft.sources.IndexStore.enableFromEnv(s1)
    graft.sources.IndexStore.enableFromEnv(s2)
    val printFull = sys.env.get("SPARK_GRAFT_PLAN_PRINT").contains("1")
    var bad = 0
    args.foreach { name =>
      val a = plans.PlanFingerprint.normalizedPlan(
        SparkEntry.queries(name)(s1, sfDir))
      if (printFull) println(s"PLAN_BEGIN $name\n$a\nPLAN_END $name")
      val b = plans.PlanFingerprint.normalizedPlan(
        SparkEntry.queries(name)(s2, sfDir))
      def h(s: String) =
        f"${scala.util.hashing.MurmurHash3.stringHash(s)}%08x"
      println(s"HASH $name ${h(a)} ${h(b)} same=${a == b}")
      if (a != b) {
        bad += 1
        a.linesIterator.zipAll(b.linesIterator, "<missing>", "<missing>")
          .filter { case (x, y) => x != y }
          .take(3)
          .foreach { case (x, y) =>
            println("  A: " + x.take(240))
            println("  B: " + y.take(240))
          }
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
