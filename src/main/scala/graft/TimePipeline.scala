package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the STREAMING maintenance path's micro-batch
  * latency/throughput — the batch-bench twin the r9 verdict asked for,
  * so regressions in [[graft.streaming.DocumentPipeline.upsertBatch]]
  * become measurable like query regressions.
  *
  * Seeds a standing state with the first `initDocs` documents of the
  * corpus (one untimed bulk upsert), then times `batches` delta
  * upserts of `deltaSize` docs each against the growing standing
  * state, with the FULL five-artifact config (bucketed corpus +
  * shingle index + candidates + pHash signatures + bigram LM) — the
  * heaviest honest maintenance shape. Prints ONE JSON line with the
  * per-batch seconds and the derived band.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   runMain graft.TimePipeline [initDocs] [deltaSize] [batches] [mode]
  *     [layout] [compact<EVERY>x<FACTOR>]
  * (defaults 3000 / 500 / 4 / par / hash16 — sf0.1's 5000 docs leave
  * 4 full deltas; mode `par` overlaps the four independent artifact
  * commits, `seq` is the pre-r11 sequential order for A/B comparison;
  * `layout` is `hash<N>` (fixed key-hash buckets — commit cost
  * O(touched-bucket mass), degrading to O(corpus) once batches span
  * the bucket set, the r11 sweep's finding) or `range<SPAN>`
  * (arrival-order buckets — the O(batch) commit contract for
  * monotone doc ids; SPAN ≈ deltaSize makes each batch land in ~one
  * new bucket). A bare integer is accepted as `hash<N>` for
  * compatibility with the r11 sweep invocations.)
  */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val initDocs = args.headOption.map(_.toLong).getOrElse(3000L)
    val deltaSize = if (args.length > 1) args(1).toLong else 500L
    val batches = if (args.length > 2) args(2).toInt else 4
    val parallel = if (args.length > 3) args(3) == "par" else true
    val layoutArg = if (args.length > 4) args(4) else "hash16"
    // optional 6th arg `compact<EVERY>x<FACTOR>` (e.g. compact16x8):
    // every EVERY timed batches, fold the cold fine range buckets into
    // FACTOR-times-larger coarse ones (DocumentPipeline.compact) — the
    // census-bounding tier for long range-layout runs. Compactions run
    // BETWEEN batches and report their own seconds, so the batch band
    // stays comparable to uncompacted runs.
    // trailing args (any order past the layout): `compact<E>x<F>` and
    // `postings<B>` (maintain the w1h-bucketed postings artifact with
    // B buckets and mine through it — the r13 bucket-pruned-mine rung)
    val trailing = args.drop(5)
    // `compact<E>x<F>` or `compact<E>x<F>c<CAP>` — CAP re-tiers the
    // coarse tier whenever it exceeds CAP dirs (the geometric ladder)
    val compactArg = trailing.find(_.startsWith("compact"))
    val (compactEvery, compactFactor, coarseCap) = compactArg match {
      case Some(s) =>
        val Array(e, fct0) = s.stripPrefix("compact").split("x", 2)
        val (fct, cap) = fct0.split("c", 2) match {
          case Array(a, b) => (a.toInt, b.toInt)
          case Array(a) => (a.toInt, 0)
        }
        (e.toInt, fct, cap)
      case None => (0, 0, 0)
    }
    val postingsBuckets = trailing.find(_.startsWith("postings"))
      .map(_.stripPrefix("postings").toInt)
    trailing.filterNot(a =>
      a.startsWith("compact") || a.startsWith("postings")).foreach(a =>
      sys.error(s"unrecognized arg: $a"))
    import graft.operators.PartitionedCommit.Layout
    val layout: Layout =
      if (layoutArg.startsWith("range")) Layout.Range(layoutArg.drop(5).toLong)
      else if (layoutArg.startsWith("hash")) Layout.Hash(layoutArg.drop(4).toInt)
      else Layout.Hash(layoutArg.toInt)
    require(compactEvery == 0 || layout.isInstanceOf[Layout.Range],
      "compaction applies to the range layout only")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft-timepipe").toString
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    // per-batch per-stage seconds, in the order upsertBatch reports them
    val stageRows =
      scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    def upsert(lo: Long, hi: Long, record: Boolean) = {
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val rep = graft.streaming.DocumentPipeline.upsertBatch(
        slice(lo, hi),
        corpusPath = s"$root/corpus",
        shinglesPath = s"$root/shingles",
        candidatesPath = s"$root/cands",
        layout = Some(layout),
        signaturesPath = Some(s"$root/sigs"),
        lmPath = Some(s"$root/lm"),
        postingsPath = postingsBuckets.map(_ => s"$root/postings"),
        postingsBuckets = postingsBuckets.getOrElse(
          graft.operators.ShingleIndex.DefaultBuckets),
        // parallel mode fires onStage from pool threads — synchronize
        onStage = (name, s) => acc.synchronized {
          acc(name) = acc.getOrElse(name, 0.0) + s
          ()
        },
        parallelCommits = parallel)
      if (record) stageRows += acc.toMap
      rep
    }
    // even-n median averages the two middle elements (exact for the
    // default batches=4, where upper-middle alone biased the band)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // untimed seed: the standing state the deltas run against
    upsert(0L, initDocs, record = false)
    val compactSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def compactAll(): Seq[graft.operators.PartitionedCommit.CompactionReport] =
      graft.streaming.DocumentPipeline.compact(
        spark, s"$root/corpus", s"$root/shingles", s"$root/cands",
        span = layout.asInstanceOf[Layout.Range].span,
        factor = compactFactor,
        signaturesPath = Some(s"$root/sigs"), lmPath = Some(s"$root/lm"),
        coarseCap = coarseCap)
    // with compaction configured, fold the SEED census before timing
    // (untimed, reported separately): a large seed otherwise leaves
    // every timed batch paying its one-dir-per-delivery census — the
    // r13 sf10 rung's "compact after seed" methodology
    if (compactEvery > 0) {
      val c0 = System.nanoTime()
      val reps = compactAll()
      System.err.println(f"seed compact: ${(System.nanoTime() - c0) / 1e9}%.1f s " +
        reps.map(r => s"${r.compacted}->${r.coarseCreated}").mkString(","))
    }
    val secs = (0 until batches).map { b =>
      val lo = initDocs + b * deltaSize
      val t0 = System.nanoTime()
      val rep = upsert(lo, lo + deltaSize, record = true)
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"batch $b: $s%.2f s ($rep)")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0) {
        val c0 = System.nanoTime()
        val reps = compactAll()
        val cs = (System.nanoTime() - c0) / 1e9
        compactSecs += cs
        System.err.println(f"compact after batch $b: $cs%.2f s " +
          reps.map(r => s"${r.compacted}->${r.coarseCreated}").mkString(","))
      }
      s
    }
    // final directory census per artifact: the bounded-count claim
    def census(p: String): (Int, Int) = {
      val d = new java.io.File(p)
      if (!d.exists()) (0, 0)
      else {
        val ids = d.listFiles().toSeq
          .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
          .map(_.getName.stripPrefix("__bucket=").toInt)
        (ids.count(_ >= 0), ids.count(_ < 0))
      }
    }
    val censusJson = (Seq("corpus", "shingles", "cands", "sigs", "lm") ++
      postingsBuckets.map(_ => "postings"))
      .map { a =>
        val (fine, coarse) = census(s"$root/$a")
        s""""$a":{"fine":$fine,"coarse":$coarse}"""
      }.mkString(",")
    val med = median(secs)
    // per-stage medians across the timed batches, plus the residual
    // (driver/planning time between stages) so the table sums to the
    // batch wall clock and the biggest term is visible at a glance
    val stageNames = stageRows.flatMap(_.keys).distinct
    // "<stage>.<phase>" entries are commit INTERNALS (PartitionedCommit
    // phase hook) — they are parts of their parent stage's time, so
    // they report in their own map and stay out of the residual math
    val (phaseNames, topNames) = stageNames.partition(_.contains('.'))
    val stageMed = topNames
      .map(n => n -> median(stageRows.map(_.getOrElse(n, 0.0)).toSeq))
    val phaseMed = phaseNames.sorted
      .map(n => n -> median(stageRows.map(_.getOrElse(n, 0.0)).toSeq))
    val residual = med - stageMed.map(_._2).sum
    val stagesJson = (stageMed :+ ("residual" -> residual))
      .map { case (n, s) => f""""$n":$s%.3f""" }.mkString(",")
    val phasesJson = phaseMed
      .map { case (n, s) => f""""$n":$s%.3f""" }.mkString(",")
    // NOTE: in `par` mode stage times overlap, so their sum exceeds the
    // batch wall clock and `residual` goes negative — the stage table
    // then reads as attribution of concurrent work, not a waterfall.
    println(s"""{"metric":"pipeline_upsert_batch","sf_dir":"$sfDir",""" +
      s""""mode":"${if (parallel) "par" else "seq"}","layout":"$layoutArg",""" +
      s""""init_docs":$initDocs,"delta_size":$deltaSize,""" +
      s""""batches":[${secs.map(x => f"$x%.3f").mkString(",")}],""" +
      f""""median_sec":$med%.3f,"min_sec":${secs.min}%.3f,""" +
      f""""max_sec":${secs.max}%.3f,""" +
      f""""docs_per_sec":${deltaSize / med}%.1f,""" +
      s""""stage_median_sec":{$stagesJson},""" +
      s""""commit_phase_median_sec":{$phasesJson},""" +
      s""""compact_every":$compactEvery,"compact_factor":$compactFactor,""" +
      s""""coarse_cap":$coarseCap,""" +
      s""""postings_buckets":${postingsBuckets.getOrElse(0)},""" +
      s""""compact_secs":[${compactSecs.map(x => f"$x%.3f").mkString(",")}],""" +
      s""""bucket_census":{$censusJson}}""")
    spark.stop()
    // the standing five-artifact state can reach tens of GB on the
    // sf100 ladder — never leave it behind
    java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.delete(p); () })
  }
}
