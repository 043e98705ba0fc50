package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: split each query's bench-methodology wall time into its
  * phases — (1) DataFrame CONSTRUCTION (table reads + logical plan
  * building), (2) ANALYSIS+OPTIMIZATION+PHYSICAL PLANNING (forcing
  * `queryExecution.executedPlan`), (3) EXECUTION (noop sink) — so the
  * optimization round attacks the phase the time actually goes to
  * (guide §1.1: empirical before clever). At bench SF the corpus is
  * small; a large fixed planning share would mean the suite total is
  * dominated by per-query constant overheads, not data work.
  *
  * Usage: runMain graft.TimePhases [queryName...] (all when none
  * given) — env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_BENCH_RUNS as in Bench.
  */
object TimePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "64m"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
          graft.sources.Tables.suggestedInitPartitions(
            sfDir, cpus.toInt).toString))
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.IndexStore.enableFromEnv(spark)
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // same untimed warmup as Bench
    Seq("q14_multi_measure_summary", "q33_fingerprint", "q08_hash_agg")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val acc = scala.collection.mutable.LinkedHashMap[String,
      (scala.collection.mutable.ListBuffer[Double],
        scala.collection.mutable.ListBuffer[Double],
        scala.collection.mutable.ListBuffer[Double])]()
    names.foreach(n => acc(n) = (
      scala.collection.mutable.ListBuffer[Double](),
      scala.collection.mutable.ListBuffer[Double](),
      scala.collection.mutable.ListBuffer[Double]()))
    for (_ <- 0 until runs; name <- names) {
      try {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis→physical planning
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        val (b, p, e) = acc(name)
        b += (t1 - t0) / 1e9; p += (t2 - t1) / 1e9; e += (t3 - t2) / 1e9
      } catch { case ex: Throwable =>
        System.err.println(s"[phases] $name failed: ${ex.getMessage}")
      }
    }
    println(f"${"query"}%-36s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    var (tb, tp, te) = (0.0, 0.0, 0.0)
    names.foreach { n =>
      val (b, p, e) = acc(n)
      if (b.nonEmpty) {
        val (mb, mp, me) = (med(b.toSeq), med(p.toSeq), med(e.toSeq))
        tb += mb; tp += mp; te += me
        println(f"$n%-36s $mb%8.3f $mp%8.3f $me%8.3f ${mb + mp + me}%8.3f")
      }
    }
    println(f"${"TOTAL"}%-36s $tb%8.3f $tp%8.3f $te%8.3f ${tb + tp + te}%8.3f")
    spark.stop()
  }
}
