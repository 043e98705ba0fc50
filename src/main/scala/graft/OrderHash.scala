package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: verify every query's [[graft.plans.PlanFingerprint]] is
  * RUN-ORDER-STABLE — the property that makes cross-round hash
  * equality a valid attribution anchor even as the suite grows (the
  * r8 control's two exceptions, q91/q209, were run-order flips: a
  * shared cached frame's population point moved when a new reader
  * joined the suite, and a collected-literal list rendered
  * order-sensitively).
  *
  * One session, ALL queries, built (and hashed) in the order given by
  * the arg: `forward`, `reverse`, or an integer seed for a
  * deterministic shuffle. Prints one `HASH <name> <hash>` line per
  * query; run twice with different orders and diff the outputs —
  * identical output = run-order stable. `SPARK_GRAFT_PLAN_PRINT=1`
  * additionally dumps each normalized plan for diffing a flip.
  *
  * Usage: runMain graft.OrderHash reverse [qNN ...]
  * (optional trailing names restrict the hashed set — the ORDER still
  * covers the full suite so shared frames populate realistically, but
  * only the named queries print).
  */
object OrderHash {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass forward | reverse | <int seed>")
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
    graft.sources.IndexStore.enableFromEnv(spark)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val ordered = args(0) match {
      case "forward" => names
      case "reverse" => names.reverse
      case seed =>
        new scala.util.Random(seed.toLong).shuffle(names)
    }
    val only = args.drop(1).toSet
    val printFull = sys.env.get("SPARK_GRAFT_PLAN_PRINT").contains("1")
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    ordered.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (only.isEmpty || only(name)) {
        // THE fingerprint definition, not a restatement — these HASH
        // lines must be the hashes BENCH_DETAIL records
        out += ((name, plans.PlanFingerprint.hash(df)))
        if (printFull) {
          val p = plans.PlanFingerprint.normalizedPlan(df)
          println(s"PLAN_BEGIN $name\n$p\nPLAN_END $name")
        }
      }
    }
    // stable print order regardless of build order, so two runs diff
    out.sortBy(_._1).foreach { case (n, h) => println(s"HASH $n $h") }
    spark.stop()
  }
}
