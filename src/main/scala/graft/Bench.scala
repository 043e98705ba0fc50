package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Container timing noise is ±30–40% per run — and round-3's bench
    // recorded 2–5× "regressions" on untouched code that a later
    // median-of-5 could not reproduce. A single sample cannot gate a
    // 2× regression; neither, evidently, can a median-of-3 under
    // concurrent load. Each query runs `runs` times (default 5) and
    // reports the per-query MEDIAN; the headline total is the sum of
    // medians over successfully-executed queries only. `spread` (max
    // minus min, per query) and `plans` (canonicalized-plan hash, per
    // query) ship alongside so a cross-round delta is attributable:
    // same plan hash + wide spread = load noise; changed hash = a real
    // plan change to investigate.
    //
    // Repetitions are ROUND-ROBIN over the whole suite (pass 1 runs
    // every query once, then pass 2, …), NOT back-to-back per query:
    // the r7 official record proved that with 5 consecutive runs, a
    // multi-minute container load burst lands on ALL 5 samples of one
    // alphabetically-contiguous block (q121–q159 inflated 3–8× at
    // identical plan hashes) and the median absorbs nothing. Spread
    // across passes, a burst touches at most one sample of each query
    // it overlaps and the median-of-5 rejects it.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // 64m is sized for the 8–30 g bench heaps; constrained-memory
      // runs pass SPARK_GRAFT_BROADCAST (see TimeQuery — the sf10
      // 4 GiB probe's sizing rule: threshold scales with executor
      // memory, or AQE promotes fact sides the heap can't host)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "64m"))
      .config("spark.ui.enabled", "false")
      // data-derived initial shuffle partitions (see
      // Tables.suggestedInitPartitions): floors at cpus for the
      // official sf0.1 bench — byte-identical plans to the fixed-cpus
      // sessions this bench always ran — and scales with input bytes
      // on larger rungs so state-heavy aggregates split before they
      // spill-thrash (r12 verdict ask #6)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
          graft.sources.Tables.suggestedInitPartitions(
            sfDir, cpus.toInt).toString))
      // Round-robin repetitions expose Spark's whole-stage-codegen
      // cache default (100 entries) as a benchmark artifact: ~194
      // queries × several generated stages per pass evict the entire
      // cache every pass, so EVERY timed run recompiles (and re-JITs)
      // every stage — measured +35% on the suite vs back-to-back
      // repetitions, uniformly across queries (the very comparison
      // round-robin exists to protect). Size the cache to hold the
      // whole suite's stages so a timed run measures the query, not
      // Janino. Static conf — must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // opt-in durable index tier (cold-vs-warm index cost measurable
    // with SPARK_GRAFT_BENCH_RUNS=1 + a pre-populated root)
    graft.sources.IndexStore.enableFromEnv(spark)
    // Stamp the store state BEFORE anything populates it: with plan
    // hashes normalized across store states (below), the record itself
    // must say which tier the timings came from.
    val storeState = graft.sources.IndexStore.root(spark) match {
      case None => "disabled"
      case Some(r) =>
        val p = new org.apache.hadoop.fs.Path(r)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p) && fs.listStatus(p).nonEmpty) "warm" else "cold"
    }
    // Untimed warmup: JIT + codegen caches, parquet footer reads —
    // otherwise the alphabetically-first query absorbs all of it.
    Seq("q14_multi_measure_summary", "q33_fingerprint", "q08_hash_agg")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Stable fingerprint of a query's optimized plan: identical across
    // runs/JVMs/sessions/store states of the same code, different when
    // the plan genuinely changed — the noise-vs-plan-change attribution
    // anchor. One shared definition (normalization rationale there):
    def planHash(df: org.apache.spark.sql.DataFrame): String =
      graft.plans.PlanFingerprint.hash(df)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ListBuffer[Double]]()
    names.foreach(n => times(n) = scala.collection.mutable.ListBuffer[Double]())
    val lastDf =
      scala.collection.mutable.HashMap[String, org.apache.spark.sql.DataFrame]()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    for (pass <- 0 until runs; name <- names if !failed.contains(name)) {
      val t0 = System.nanoTime()
      // noop sink: forces full computation of every output column
      // (count() would let Catalyst prune projections and under-report)
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        lastDf(name) = df
        times(name) += (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        // a failed query must be VISIBLE, not a fast timing: record it
        // and keep it OUT of the summed total (a fast failure would
        // otherwise deflate the regression-gate metric). Later passes
        // skip it.
        failed += name
        System.err.println(s"[bench] $name (pass $pass) failed: ${e.getMessage}")
      }
    }
    val results = names.map { name =>
      val ts = times(name).toSeq
      val ok = !failed.contains(name)
      // hash OUTSIDE the timed region: plan stringification on the last
      // run would inflate exactly the spread metric this exists to read
      val plan =
        if (ok && lastDf.contains(name)) planHash(lastDf(name)) else ""
      val spread = if (ts.isEmpty) 0.0 else ts.max - ts.min
      // pass-1 wall time, reported per query as `cold`: with the index
      // store enabled and starting empty, the first pass of every
      // stamped-cache query (q25-family, q36, q73/q75, q77, q295, …)
      // carries its one-time mine/build while the median measures the
      // SERVING path — so the suite-wide amortization claim ("mine at
      // ingest, read forever") is measured in the committed artifact,
      // not just in ad-hoc probes. For non-cached queries cold ≈ median
      // (plus first-pass JIT warmth), a useful noise floor.
      val first = ts.headOption.getOrElse(0.0)
      (name, if (ts.isEmpty) 0.0 else median(ts), spread, plan, ok, first)
    }
    // failed queries appear ONLY in `failed`, never in `queries` — a
    // median contaminated by a fast-failure duration would read as a
    // valid timing to anyone consuming the map without cross-checking
    val qs = results.collect { case (k, v, _, _, true, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    val spreads = results.collect { case (k, _, sp, _, true, _) =>
      s"\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, sp)
    }.mkString("{", ",", "}")
    val plans = results.collect { case (k, _, _, p, true, _) =>
      s"\"" + k + "\":\"" + p + "\"" }.mkString("{", ",", "}")
    val colds = results.collect { case (k, _, _, _, true, f) =>
      s"\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, f)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, _, true, _) => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The regression-gate slice: the FIXED q01–q54 query set of the
    // round-2 ≈30.5 s baseline record. The suite keeps growing (140+
    // queries), so "total ≤ 2× of a 54-query baseline" is meaningless as
    // a gate — the comparable metric is the sum over the SAME queries
    // the baseline measured. Membership is by declared query number
    // (q01…q54), which is stable: queries are never renumbered, only
    // appended.
    def qNum(name: String): Int =
      name.drop(1).takeWhile(_.isDigit) match { case "" => Int.MaxValue; case d => d.toInt }
    val sliceResults = results.filter { case (k, _, _, _, ok, _) => ok && qNum(k) <= 54 }
    val slice = sliceResults.map(_._2).sum
    val nSlice = sliceResults.size
    val nQueries = results.count(_._5)
    // Rounds 4, 5 AND 6 each lost part of the official record to stdout
    // tail truncation — the per-query map and the spread/plan-hash
    // diagnostics never survived the driver's capture window. The full
    // record therefore goes to a FILE (BENCH_DETAIL.json, overwritten
    // per run, committed per round), and stdout carries ONLY bounded-
    // size lines: the fixed-slice gate metric and the headline total.
    // Any tail window, however small, keeps a parsable record; anyone
    // needing per-query attribution reads the file artifact.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val detail =
      s"""{"metric":"bench_detail","value":$total,"unit":"sec","runs":$runs,
         |"n_queries":$nQueries,"slice_q01_q54":$slice,"n_slice":$nSlice,
         |"queries":$qs,
         |"spread":$spreads,
         |"cold":$colds,
         |"plans":$plans,
         |"failed":$failedJson,"sf":"$sfDir","cpus":"$cpus",
         |"order":"round_robin","index_store":"$storeState"}
         |""".stripMargin
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      // a detail-write failure must not sink the run; the stdout lines
      // below still carry the gate metrics
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    println(s"""{"metric":"slice_q01_q54","value":$slice,"unit":"sec","runs":$runs,"n_slice":$nSlice,"sf":"$sfDir"}""")
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","runs":$runs,"n_queries":$nQueries,"failed":$failedJson,"sf":"$sfDir","detail":"$detailPath"}""")
    spark.stop()
  }
}
