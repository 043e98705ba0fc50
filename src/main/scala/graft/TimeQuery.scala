package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name without running the whole
  * bench — median-of-N with the same noop-sink methodology as
  * [[Bench]], same local[32] shape as the driver's bench run.
  *
  * Also reports per-query SPILL bytes (memory + disk, summed over the
  * tasks of the run whose time is the median) — the constrained-heap
  * scale probe's evidence
  * channel: a query that completes at sf10 under a small heap either
  * fit (spill 0) or degraded gracefully (spill > 0, still finished),
  * and the table in BASELINE records which.
  *
  * Usage: runMain graft.TimeQuery q26_dedup_minhash [q25_...] —
  * env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_RUNS
  * as in Bench; heap via SPARK_DRIVER_MEM (build.sbt -Xmx).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the broadcast threshold must scale with executor memory: 64m
      // serialized ≈ several× that deserialized, ×concurrent tasks —
      // fine on the 8–30 g bench heaps, fatal at 4 g (the probe's q274
      // catch: AQE promoted a 15 M-row fact side that fit the 64 m
      // rule and the driver died building it). Constrained runs pass
      // SPARK_GRAFT_BROADCAST=16m — the same sizing a real cluster
      // does per executor-memory tier.
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "64m"))
      .config("spark.ui.enabled", "false")
    // Partition sizing (the spill-probe lesson): with AQE on, raising
    // the INITIAL shuffle partition count lets each reduce task hold
    // 1/Nth the state — AQE coalesces the cheap stages back down, so
    // well-sized stages pay nothing. This is exactly the
    // partition-sizing move a real cluster makes when per-task state
    // outgrows executor memory (q135's pair-grain aggregate at sf10
    // under a 4 GiB heap OOMs at 32 partitions, completes at 256).
    // The DEFAULT is data-derived from the input bytes
    // ([[graft.sources.Tables.suggestedInitPartitions]] — r12 verdict
    // ask #6); the env var remains as an explicit override for
    // constrained-memory probes.
    builder.config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
        graft.sources.Tables.suggestedInitPartitions(sfDir, cpus.toInt)
          .toString))
    // Second constrained-memory knob: by default HALF the unified pool
    // is protected for cached blocks (spark.memory.storageFraction
    // 0.5), so a multi-query session whose earlier queries stamped
    // their index caches leaves later agg-heavy queries only ~1/2 the
    // execution memory their solo run had (q274 at sf10/4 GiB passed
    // solo, OOMed ninth-in-session). Lowering the PROTECTED fraction
    // lets execution evict cache instead of dying — the tuning an
    // agg-heavy production executor runs with.
    sys.env.get("SPARK_GRAFT_STORAGE_FRACTION").foreach(f => builder
      .config("spark.memory.storageFraction", f))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // task-grain spill accumulation across the whole JVM; reset (read
    // current value as the run's baseline) around each timed run
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    // opt-in durable index tier, same env contract as Bench/Verify —
    // without this a cold-vs-warm store measurement silently measures
    // store-off twice
    graft.sources.IndexStore.enableFromEnv(spark)
    args.foreach { name =>
      val measured = (1 to runs).map { _ =>
        val mem0 = memSpill.get(); val disk0 = diskSpill.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give the bus a moment
        // so the run's spill lands in its own window (best-effort — a
        // straggler task-end past 200 ms attributes to the next run;
        // acceptable tolerance for a dev tool, noted here so the
        // numbers are read with it)
        Thread.sleep(200)
        (secs, memSpill.get() - mem0, diskSpill.get() - disk0)
      }
      val times = measured.map(_._1).sorted
      val med = times(times.size / 2)
      // spill of the run WHOSE TIME IS THE MEDIAN — the run the
      // headline figure describes (matches the object doc)
      val (_, spillMem, spillDisk) = measured.find(_._1 == med).get
      println(f"TIME $name%-28s median=$med%7.3f s  " +
        f"all=${times.map(t => f"$t%.3f").mkString(",")}  " +
        f"spill_mem=${spillMem / (1 << 20)}%d MiB spill_disk=${spillDisk / (1 << 20)}%d MiB")
    }
    spark.stop()
  }
}
