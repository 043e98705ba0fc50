package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-grain variant of [[CommitSink]] for the standing
  * maintenance artifacts (corpus, shingle index, pair candidates):
  * the table is laid out hive-partitioned by a stable key-hash bucket
  * (`<root>/__bucket=<b>/…`), and a commit stages and swaps ONLY the
  * bucket directories a batch touches — an unrelated bucket's files
  * are never rewritten, renamed, or even listed by the swap.
  *
  * This is the 100 TB upgrade of the full-rewrite contract documented
  * on [[graft.streaming.CorpusMaintenance]]: per-micro-batch cost
  * becomes O(touched buckets) ≈ O(batch keys), not O(corpus). Reads
  * of batch-relevant slices prune at planning time (partition filters
  * on `__bucket`); corpus-wide reads (the near-dup mine's standing
  * side) still scan everything but never rewrite it.
  *
  * Crash contract, per bucket (same shape as [[CommitSink]]'s whole
  * -table swap): the old bucket dir is parked under
  * `<root>.__old__/__bucket=<b>` — OUTSIDE the partition-discovery
  * tree, so a half-swapped table never serves a backup as data — and
  * the staged dir renamed in; a crash between the two renames leaves
  * that one bucket restorable, and [[healInterrupted]] restores it
  * before any standing-state read. The backup root is deleted only
  * after every touched bucket has swapped.
  */
object PartitionedCommit {

  /** Hive partition column carrying the key-hash bucket. Internal to
    * the storage layout: exposed reads keep it (callers prune/commit
    * by it) and drop it at their API boundary.
    */
  val BucketCol = "__bucket"

  /** How a partitioned standing table maps keys to bucket directories —
    * chosen at table creation and REQUIRED consistent across every
    * later commit (span/bucket-count included): a key must land in the
    * same directory on every call or the merge anti-join misses its
    * standing rows.
    *
    *   - [[Layout.Hash]]: `pmod(xxhash64(key), n)` — mass-uniform for
    *     any key distribution, but a batch of random keys touches
    *     ~min(batch, n) buckets, so commit cost degrades to
    *     O(corpus) once batches span the bucket set (the r11
    *     standing-size sweep's finding).
    *   - [[Layout.Range]]: `floor(key / span)` over a monotone numeric
    *     key — an arrival-ordered ingest batch (the next id range)
    *     touches ONE new bucket and commit cost is O(batch) at ANY
    *     corpus size; bucket count grows with the data. The trade:
    *     bucket mass follows key-range density.
    */
  sealed trait Layout { def bucketOf(key: Column): Column }
  object Layout {
    final case class Hash(numBuckets: Int) extends Layout {
      require(numBuckets > 0, "numBuckets must be positive")
      def bucketOf(key: Column): Column =
        PartitionedCommit.bucketOf(key, numBuckets)
    }
    final case class Range(span: Long) extends Layout {
      require(span > 0, "span must be positive")
      def bucketOf(key: Column): Column =
        PartitionedCommit.rangeBucketOf(key, span)
    }

    /** A range table with a compacted COLD tier: keys in `[0,
      * frontier)` live in coarse buckets of `coarseSpan` (directory id
      * `-(1 + key div coarseSpan)` — the negative namespace, disjoint
      * from the fine tier's non-negative ids), keys at or above the
      * frontier in fine `span` buckets as before. Produced by
      * [[PartitionedCommit.resolveRange]] from the table's own
      * directories after a [[PartitionedCommit.compactRange]] — never
      * constructed statically, because the frontier is table state.
      *
      * Non-negative keys ONLY: a negative key's fine id would collide
      * with the coarse namespace, so routing raises loudly instead of
      * silently splitting a key across two directories.
      */
    final case class RangeTiered(span: Long, coarseSpan: Long, frontier: Long)
        extends Layout {
      require(span > 0, "span must be positive")
      require(coarseSpan > span && coarseSpan % span == 0,
        s"coarseSpan must be a multiple of span above it: $coarseSpan/$span")
      require(frontier > 0 && frontier % coarseSpan == 0,
        s"frontier must be a positive multiple of coarseSpan: $frontier")
      def bucketOf(key: Column): Column = {
        val k = key.cast("long")
        when(k < 0L,
          raise_error(concat(lit("range-tiered layout requires " +
            "non-negative keys, got "), k.cast("string"))).cast("int"))
          .when(k < frontier,
            PartitionedCommit.coarseBucketOf(k, coarseSpan))
          .otherwise(PartitionedCommit.rangeBucketOf(k, span))
      }
    }
  }

  /** Coarse-tier directory id of a non-negative key: `-(1 + key div
    * coarseSpan)` — the mirror-image namespace of [[rangeBucketOf]],
    * so compacted buckets can coexist with fine ones in the single
    * int-typed [[BucketCol]].
    */
  def coarseBucketOf(key: Column, coarseSpan: Long): Column = {
    require(coarseSpan > 0, "coarseSpan must be positive")
    val k = key.cast("long")
    (lit(-1) - call_function("div", k - pmod(k, lit(coarseSpan)),
      lit(coarseSpan))).cast("int")
  }

  /** Stable bucket of a key: `pmod(xxhash64(key), n)` — deterministic
    * across engines/sessions, uniform for any key type, independent of
    * every payload column (so a document update never migrates
    * buckets).
    */
  def bucketOf(key: Column, numBuckets: Int): Column =
    pmod(xxhash64(key), lit(numBuckets.toLong)).cast("int")

  /** RANGE bucket of a monotone numeric key: `floor(key / span)` —
    * the append-ingest layout the r11 standing-size sweep motivated.
    * Hash bucketing spreads every batch over ~all buckets, so commit
    * cost grows with corpus once batches span the bucket set; under
    * range bucketing an arrival-ordered batch (new ids are the next
    * id range — the normal ingest shape) lands in ONE new bucket
    * (two at a span boundary) and the commit stages + swaps only
    * that — true O(batch) write cost at ANY corpus size, with the
    * bucket count growing alongside the data instead of being fixed
    * at table creation. Updates to old keys still touch exactly the
    * bucket holding them (a key never migrates). The trade: bucket
    * mass follows key-range density, so a skewed id allocation skews
    * bucket sizes where hash bucketing would not.
    */
  def rangeBucketOf(key: Column, span: Long): Column = {
    require(span > 0, "span must be positive")
    // EXACT long arithmetic, not Column `/` (double division): keys
    // above 2^53 would otherwise round before dividing and a key near
    // a span boundary could land in the wrong bucket — breaking the
    // "a key never migrates" invariant the merge relies on. Subtract
    // the floor-remainder first so the integral division (`div`,
    // truncating) is exact and truncation coincides with floor even
    // for negative keys: k=-1, span=2 → pmod=1 → (-2 div 2)=-1.
    // The int cast is safe by construction of the LAYOUT, not the key:
    // bucket id = key range / span = the table's directory count, and
    // a table with >2^31 partition directories is unoperable long
    // before the cast wraps (span is chosen to keep bucket count in
    // the thousands).
    val k = key.cast("long")
    call_function("div", k - pmod(k, lit(span)), lit(span)).cast("int")
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketDirs(
      spark: SparkSession, root: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val f = fsOf(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
  }

  /** Restore any bucket whose swap was interrupted (dest dir absent,
    * backup present under `<root>.__old__`), then report whether the
    * table has data. Every read of a partitioned standing table goes
    * through this — the per-bucket twin of
    * [[CommitSink.healInterrupted]]. A backup bucket whose destination
    * EXISTS is an already-swapped bucket of an interrupted commit (or
    * a legitimately emptied one): left alone — replaying the batch
    * recommits the correct state and clears it.
    */
  def healInterrupted(spark: SparkSession, root: String): Boolean = {
    val rootPath = new Path(root)
    val f = fsOf(spark, rootPath)
    // an interrupted COMPACTION owns the backup root for its whole
    // swap (its parked fine dirs have no same-name destination, so the
    // per-bucket restore below would resurrect them NEXT TO the coarse
    // copies — duplicate rows); the manifest marks that ownership and
    // routes to the all-or-nothing compaction heal instead
    if (f.exists(new Path(rootPath, CompactionManifestFile)))
      healCompaction(spark, root)
    val backupRoot = new Path(root + ".__old__")
    if (f.exists(backupRoot)) {
      bucketDirs(spark, backupRoot).foreach { st =>
        val dest = new Path(rootPath, st.getPath.getName)
        if (!f.exists(dest)) {
          if (!f.exists(rootPath)) f.mkdirs(rootPath)
          if (!f.rename(st.getPath, dest))
            // tolerate a concurrent healer winning the same bucket
            require(f.exists(dest),
              s"could not restore $dest from interrupted-commit backup")
        }
      }
    }
    bucketDirs(spark, rootPath).nonEmpty
  }

  /** Healed read of the whole table; the result carries [[BucketCol]]
    * as its last column. Callers wanting a batch-relevant slice filter
    * on [[BucketCol]] — Spark prunes the untouched partition
    * directories at planning time.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    healInterrupted(spark, root)
    spark.read.parquet(root)
  }

  /** Single-heal standing read: heal once, None when the table has no
    * buckets. The per-batch form — `healInterrupted(p)` followed by
    * `read(p)` would pay the backup-root probe and bucket listing
    * twice per artifact per micro-batch (several redundant LIST
    * round-trips on an object store).
    */
  def readIfAny(spark: SparkSession, root: String): Option[DataFrame] =
    if (!healInterrupted(spark, root)) None
    else Some(spark.read.parquet(root))

  /** Commit `df` (which must carry [[BucketCol]] and contain only rows
    * of `touched` buckets) into the table at `root`, staging and
    * swapping ONLY the touched bucket directories. A touched bucket
    * with no staged rows (every row dropped) has its directory parked
    * and not replaced — the delete case. Returns the committed row
    * count over the touched buckets, read-back verified like
    * [[CommitSink.writeVerified]].
    */
  /** Name of the per-bucket marker file (leading `_` so every parquet
    * reader ignores it as data). A marker rides its bucket DIRECTORY
    * through stage, swap, park, and heal — so whatever it records is
    * exactly as atomic as the bucket's rows, which is what makes it
    * usable as an applied-batch stamp for non-idempotent (additive)
    * merges: see [[graft.operators.IncrementalLm]]'s counts artifact.
    *
    * Line 1 is always `rows=<n>` (the bucket's committed row count,
    * derived from the same job that verifies the staged write); any
    * further lines are caller payload via the `markers` parameter of
    * [[commitPartitions]]. The rows line is what lets
    * [[standingCount]] answer from O(buckets) driver-side reads
    * instead of an O(table) count job per micro-batch.
    */
  val BucketMarkerFile = "_applied"

  /** Commit-internals attribution hook (dev tooling — TimePipeline):
    * while set on the calling thread, [[commitPartitions]] and the
    * upsert helpers report their phase wall-seconds (`touched_probe`,
    * `stage_write`, `verify`, `swap`, `standing_count`) through it.
    * A DynamicVariable so concurrent commits on a pool each see the
    * hook their own caller installed.
    */
  val phaseHook: scala.util.DynamicVariable[Option[(String, Double) => Unit]] =
    new scala.util.DynamicVariable(None)

  private[graft] def timedPhase[T](name: String)(f: => T): T =
    phaseHook.value match {
      case None => f
      case Some(h) =>
        val t0 = System.nanoTime()
        val r = f
        h(name, (System.nanoTime() - t0) / 1e9)
        r
    }

  private def parseMarkerRows(content: String): Option[Long] =
    content.linesIterator.toSeq.headOption
      .filter(_.startsWith("rows="))
      .flatMap(l => scala.util.Try(l.stripPrefix("rows=").toLong).toOption)

  /** Caller payload of a marker (everything after the rows line). */
  def markerPayload(content: String): String =
    content.linesIterator.drop(1).mkString("\n")

  /** Read the per-bucket markers of a partitioned table: bucket id →
    * marker content. Driver-side, O(buckets) small-file reads.
    */
  def readBucketMarkers(spark: SparkSession, root: String): Map[Int, String] = {
    val f = fsOf(spark, new Path(root))
    bucketDirs(spark, new Path(root)).flatMap { st =>
      val m = new Path(st.getPath, BucketMarkerFile)
      if (!f.exists(m)) None
      else {
        val in = f.open(m)
        try {
          val bytes = new Array[Byte](f.getFileStatus(m).getLen.toInt)
          in.readFully(bytes)
          Some(st.getPath.getName.stripPrefix(BucketCol + "=").toInt ->
            new String(bytes, "UTF-8"))
        } finally in.close()
      }
    }.toMap
  }

  def commitPartitions(
      spark: SparkSession, df: DataFrame, root: String,
      touched: Seq[Int]): Long =
    commitPartitions(spark, df, root, touched, Map.empty)

  /** As [[commitPartitions]], additionally writing `markers(b)` as the
    * bucket's [[BucketMarkerFile]] (staged with the bucket, so marker
    * and rows swap in atomically). A touched bucket that stages no
    * rows (emptied) keeps no marker — absence reads as "no stamp",
    * which callers must treat as apply-needed.
    */
  def commitPartitions(
      spark: SparkSession, df: DataFrame, root: String,
      touched: Seq[Int], markers: Map[Int, String]): Long = {
    require(df.columns.contains(BucketCol), s"df must carry $BucketCol")
    val staging = root + ".__staging__"
    val obs = new org.apache.spark.sql.Observation()
    timedPhase("stage_write") {
      // one file per bucket dir, not one per (upstream task × bucket):
      // partitionBy splits EVERY writing task's rows into its own file
      // per dir, so a wide-touched commit (a bulk seed touching
      // thousands of range buckets; a vocabulary artifact touching
      // ~30 hash buckets from 32 tasks) staged tasks× that many small
      // files and every later pruned read paid the accumulated file
      // census (measured: the 30-bucket postings commit at 7 s,
      // file-open bound, before this). The repartition's shuffle moves
      // only the staged bytes the write pays for anyway — commit
      // inputs are touched-slice-sized by the callers' contract.
      df.repartition(col(BucketCol))
        .observe(obs, count(lit(1)).as("rows"))
        .write.partitionBy(BucketCol).mode("overwrite").parquet(staging)
    }
    val expected = obs.get("rows").asInstanceOf[Long]
    val stagingPath = new Path(staging)
    val f = fsOf(spark, stagingPath)
    val stagedDirs = bucketDirs(spark, stagingPath).map(_.getPath.getName).toSet
    // the swap loop only renames TOUCHED buckets in: a staged bucket
    // outside `touched` (caller bucketed by a different column than it
    // derived `touched` from) would pass the count verify and then be
    // DELETED with staging — turn that silent loss into an error here
    val undeclared = stagedDirs -- touched.map(b => s"$BucketCol=$b").toSet
    require(undeclared.isEmpty,
      s"staged buckets $undeclared not declared touched — rows would be dropped")
    // read-back verify, at BUCKET grain: the same one job both checks
    // the staged rows against the observed write count and yields each
    // bucket's rows line for its marker (so standingCount can answer
    // from markers without an O(table) count job later)
    val perBucket: Map[Int, Long] = timedPhase("verify") {
      if (stagedDirs.isEmpty) Map.empty
      else spark.read.parquet(staging).groupBy(col(BucketCol)).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val actual = perBucket.values.sum
    if (actual != expected)
      throw CommitSink.CommitVerificationFailed(root, expected, actual)
    // markers are staged WITH their buckets, so marker and rows swap
    // in atomically
    perBucket.foreach { case (b, n) =>
      val payload = markers.get(b).map("\n" + _).getOrElse("")
      writeFile(f, new Path(new Path(stagingPath, s"$BucketCol=$b"),
        BucketMarkerFile), s"rows=$n$payload")
    }

    timedPhase("swap") {
      val rootPath = new Path(root)
      val backupRoot = new Path(root + ".__old__")
      // a backup root surviving a COMPLETED commit cannot exist (deleted
      // below); one found here belongs to an interrupted commit whose
      // replay this is — heal restored what it needed, clear the rest
      if (f.exists(backupRoot)) f.delete(backupRoot, true)
      f.mkdirs(backupRoot)
      if (!f.exists(rootPath)) f.mkdirs(rootPath)
      touched.foreach { b =>
        val name = s"$BucketCol=$b"
        val destDir = new Path(rootPath, name)
        val stagedDir = new Path(stagingPath, name)
        // park the old bucket first (dest left briefly absent, backup
        // recoverable — the CommitSink swap contract, per bucket)
        if (f.exists(destDir))
          require(f.rename(destDir, new Path(backupRoot, name)),
            s"could not stage out old $destDir")
        if (stagedDirs.contains(name))
          require(f.rename(stagedDir, destDir),
            s"could not commit $stagedDir -> $destDir")
      }
      f.delete(backupRoot, true)
      f.delete(stagingPath, true)
      // A commit that empties the table (every staged bucket empty, all
      // standing dirs parked) must leave it READABLE: zero bucket dirs
      // would make the next spark.read fail schema inference, where the
      // unpartitioned layout serves an empty-but-schema-bearing parquet.
      // Write one empty marker bucket carrying the data schema — zero
      // rows, swapped away by whichever later commit touches it.
      if (bucketDirs(spark, rootPath).isEmpty) {
        val emptyDir = new Path(rootPath,
          s"$BucketCol=${touched.headOption.getOrElse(0)}")
        df.drop(BucketCol).limit(0).write.mode("overwrite")
          .parquet(emptyDir.toString)
        writeFile(f, new Path(emptyDir, BucketMarkerFile), "rows=0")
      }
    }
    actual
  }

  private def writeFile(
      f: org.apache.hadoop.fs.FileSystem, p: Path, content: String): Unit = {
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  /** Total standing rows of the table. Fast path: when EVERY bucket
    * carries a rows marker (any table written only by marker-aware
    * commits does), the total is the driver-side sum of the markers —
    * O(buckets) small-file reads, no listing of data files, no Spark
    * job, so the per-micro-batch report total stops costing O(table)
    * as the corpus grows. A table with any unmarked bucket (written
    * before markers existed) falls back to the count job.
    */
  def standingCount(spark: SparkSession, root: String): Long = {
    if (!healInterrupted(spark, root)) return 0L
    val counts = timedPhase("standing_count") {
      val dirs = bucketDirs(spark, new Path(root)).map(_.getPath.getName
        .stripPrefix(BucketCol + "=").toInt)
      val markers = readBucketMarkers(spark, root)
      dirs.map(b => markers.get(b).flatMap(parseMarkerRows))
    }
    if (counts.forall(_.isDefined)) counts.flatten.sum
    else timedPhase("standing_count_scan")(spark.read.parquet(root).count())
  }

  // ───────────────────────── range-bucket compaction ──────────────────────
  //
  // The Range layout's O(batch) commit works BECAUSE every
  // arrival-ordered batch creates its own new bucket — which means
  // bucket count grows linearly with deliveries (a year of 15-minute
  // batches ≈ 35 k directories per artifact), and partition discovery
  // plus small-file overhead eventually dominates: the directory-grain
  // twin of the row-file disease [[graft.sources.Compact]] documents.
  // compactRange merges the COLD prefix of fine buckets into coarse
  // ones (factor × larger span) behind the same stage/verify/swap
  // discipline, so the census stays bounded while the hot tail keeps
  // its O(batch) appends.

  /** Marker file at the table root while a compaction swap is in
    * flight. Its presence means the backup root belongs to the
    * compaction (see [[healInterrupted]]); its content is the full
    * swap plan, so [[healCompaction]] can roll the table to exactly
    * one of the two consistent states.
    */
  val CompactionManifestFile = "_compacting"

  /** Static layout descriptor written at first compaction (content
    * never changes afterwards — the frontier itself is derived from
    * the directory census, so it is exactly as atomic as the swap).
    */
  val LayoutFile = "_layout"

  /** Effective layout of a range table: plain `Range(span)` until a
    * compaction has run, `RangeTiered` with the frontier read from the
    * coarse directory census afterwards. Pipelines resolve ONCE per
    * batch per artifact (an O(buckets) driver listing they already pay
    * for healing); committing with the unresolved layout against a
    * compacted table would route updates of compacted keys to fine
    * buckets and the merge anti-join would miss their standing rows.
    */
  def resolveRange(spark: SparkSession, root: String, span: Long): Layout = {
    val f = fsOf(spark, new Path(root))
    val lf = new Path(root, LayoutFile)
    if (!f.exists(lf)) return Layout.Range(span)
    val content = readSmallFile(f, lf)
    val kv = content.linesIterator.map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    val fileSpan = kv("span").toLong
    require(fileSpan == span,
      s"table at $root was compacted under span=$fileSpan, caller says $span")
    val coarseSpan = kv("coarse_span").toLong
    val coarseIdx = bucketDirs(spark, new Path(root))
      .map(_.getPath.getName.stripPrefix(BucketCol + "=").toInt)
      .filter(_ < 0).map(c => -(c + 1))
    if (coarseIdx.isEmpty) Layout.Range(span)
    else Layout.RangeTiered(span, coarseSpan,
      (coarseIdx.max.toLong + 1L) * coarseSpan)
  }

  /** As [[resolveRange]] for any layout: Hash and already-tiered
    * layouts pass through untouched.
    */
  def resolve(spark: SparkSession, root: String, layout: Layout): Layout =
    layout match {
      case Layout.Range(span) => resolveRange(spark, root, span)
      case other => other
    }

  final case class CompactionReport(
      root: String,
      fineBefore: Int, compacted: Int, coarseCreated: Int,
      frontierBefore: Long, frontierAfter: Long, rows: Long)

  /** Merge the cold prefix of fine range buckets into coarse ones of
    * `factor × span`, keeping at least the `keepFine` highest fine
    * buckets untouched (the hot append tail). Marker `rows=` lines are
    * re-derived from the verified staged write; caller payloads are
    * merged with `mergePayloads` (source-id order) — the default
    * refuses to merge non-empty payloads, because stamp semantics
    * belong to the caller ([[IncrementalLm]]'s applied-batch stamps
    * must not be silently concatenated).
    *
    * RE-TIERING (the geometric census ladder, r13 verdict ask #2):
    * when the table was previously compacted at a SMALLER coarse span
    * and `span × factor` is a multiple of it, this run folds the
    * existing coarse tier too — every old coarse directory plus the
    * cold fine prefix re-buckets into the new, larger coarse span, and
    * the layout descriptor advances with the same all-or-nothing
    * manifest. A caller that re-tiers whenever the coarse census
    * exceeds a cap gets a census bounded by the cap at ANY corpus
    * size, paying one cold-tier rewrite per geometric doubling —
    * amortized O(log corpus) rewrites per row, the LSM bargain. A
    * re-tier whose new frontier would not cover the existing one
    * (`frontier0` not aligned to the new span and too little cold
    * fine mass to bridge the gap) returns a no-op report — retry
    * after more deliveries.
    *
    * Crash contract: the swap is ALL-OR-NOTHING across every group of
    * this run (per-group outcomes would tear the frontier — a hole in
    * the coarse prefix routes updates of that range to a fine bucket
    * its standing rows are not in). The manifest written before the
    * first rename records the full plan INCLUDING the old and new
    * coarse spans; [[healCompaction]] completes the run iff every
    * coarse directory landed (rewriting the layout to the new span),
    * and rolls everything back otherwise (restoring the old span).
    */
  def compactRange(
      spark: SparkSession, root: String, span: Long, factor: Int,
      keepFine: Int = 4,
      mergePayloads: Seq[String] => String = defaultMergePayloads)
      : CompactionReport = {
    require(factor > 1, s"factor must merge buckets: $factor")
    require(keepFine >= 0, s"keepFine must be non-negative: $keepFine")
    healInterrupted(spark, root)
    val rootPath = new Path(root)
    val f = fsOf(spark, rootPath)
    val coarseSpan = span * factor
    val ids = bucketDirs(spark, rootPath)
      .map(_.getPath.getName.stripPrefix(BucketCol + "=").toInt)
    val fineIds = ids.filter(_ >= 0).sorted
    val coarseIds = ids.filter(_ < 0)
    // the coarse span the EXISTING negative ids are keyed by (differs
    // from coarseSpan exactly when this run re-tiers)
    var oldCoarseSpan = coarseSpan
    if (!coarseIds.isEmpty) {
      // negative ids with no layout descriptor are FINE buckets of
      // negative keys (plain Range allows them) — compaction's coarse
      // namespace would collide with them, so refuse loudly
      require(f.exists(new Path(rootPath, LayoutFile)),
        s"table at $root has negative buckets but no $LayoutFile — " +
          "negative-key range tables cannot be compacted")
      val lf = readSmallFile(f, new Path(rootPath, LayoutFile))
      val prior = lf.linesIterator.map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      oldCoarseSpan = prior("coarse_span").toLong
      require(prior("span").toLong == span &&
        coarseSpan % oldCoarseSpan == 0 && coarseSpan >= oldCoarseSpan,
        s"table at $root compacted under ${prior("span")}/$oldCoarseSpan, " +
          s"caller says $span/$coarseSpan — the new coarse span must be " +
          "an equal-or-larger multiple of the recorded one")
    }
    val retier = oldCoarseSpan != coarseSpan
    val coarseIdx = coarseIds.map(c => -(c + 1))
    val frontier0 =
      if (coarseIdx.isEmpty) 0L
      else (coarseIdx.max.toLong + 1L) * oldCoarseSpan
    // fine ids below the existing frontier would already be mis-routed
    val stray = fineIds.filter(fid => (fid.toLong + 1L) * span <= frontier0)
    require(stray.isEmpty,
      s"fine buckets $stray sit below the coarse frontier $frontier0")
    // the hot tail stays fine; the new frontier is the largest
    // coarse-aligned boundary at or below the first kept fine bucket
    val tailFloorKey =
      if (fineIds.size <= keepFine) frontier0 // nothing eligible
      else if (keepFine == 0) (fineIds.max.toLong + 1L) * span
      else fineIds.takeRight(keepFine).head.toLong * span
    val frontier1 = (tailFloorKey / coarseSpan) * coarseSpan
    val toCompact = fineIds.filter(fid => (fid.toLong + 1L) * span <= frontier1)
    val rowsStanding = standingCount(spark, root)
    // a plain run needs the frontier to ADVANCE; a re-tier must at
    // least COVER the old frontier (equality folds coarse-only), and
    // must have something to fold
    val sources: Seq[Int] =
      (if (retier) coarseIds.sorted else Seq.empty[Int]) ++ toCompact
    if (frontier1 < frontier0 || (!retier && frontier1 <= frontier0) ||
        sources.isEmpty)
      return CompactionReport(root, fineIds.size, 0, 0,
        frontier0, frontier0, rowsStanding)
    // range start of a source directory (old coarse ids sit below the
    // old frontier, fine ids above it — both fold by where their KEYS
    // live, which is what the new coarse index is a function of)
    def startOf(id: Int): Long =
      if (id >= 0) id.toLong * span else (-(id + 1)).toLong * oldCoarseSpan
    val groups: Map[Int, Seq[Int]] = sources
      .groupBy(id => (startOf(id) / coarseSpan).toInt)
    val destOf: Map[Int, Int] = groups.flatMap { case (gi, ss) =>
      ss.map(_ -> -(gi + 1)) }
    val staging = root + ".__compact__"
    val stagingPath = new Path(staging)
    if (f.exists(stagingPath)) f.delete(stagingPath, true)
    // stage: rows re-bucket by directory id alone (a source bucket's
    // keys all share one coarse group by construction — spans divide
    // evenly), no key column knowledge needed
    val obs = new org.apache.spark.sql.Observation()
    timedPhase("compact_stage") {
      spark.read.parquet(root)
        .filter(col(BucketCol).isin(sources.map(Int.box): _*))
        .withColumn(BucketCol,
          element_at(typedLit(destOf), col(BucketCol)))
        .observe(obs, count(lit(1)).as("rows"))
        .write.partitionBy(BucketCol).mode("overwrite").parquet(staging)
    }
    val expected = obs.get("rows").asInstanceOf[Long]
    val perBucket: Map[Int, Long] = timedPhase("compact_verify") {
      spark.read.parquet(staging).groupBy(col(BucketCol)).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    require(perBucket.values.sum == expected,
      s"compaction staged ${perBucket.values.sum} rows, wrote $expected")
    // an all-empty group stages no dir: write an empty (schema-bearing)
    // one so the namespace stays a contiguous prefix (routing relies on
    // it). This MUST run before the marker loop — writeFile's create()
    // makes parent dirs, so once any marker lands the exists() probe
    // can no longer tell "staged data" from "marker only" (r13 ADVICE:
    // the backfill was dead code when it ran after the markers).
    groups.keys.foreach { gi =>
      val c = -(gi + 1)
      val dir = new Path(stagingPath, s"$BucketCol=$c")
      if (!f.exists(dir))
        spark.read.parquet(root).filter(lit(false)).drop(BucketCol)
          .write.mode("overwrite").parquet(dir.toString)
    }
    // merged markers ride the staged coarse dirs, same atomicity as
    // rows; the loop covers every group, including the backfilled
    // all-empty ones (rows=0 + their source markers' merged payload)
    val srcMarkers = readBucketMarkers(spark, root)
    groups.foreach { case (gi, ss) =>
      val c = -(gi + 1)
      val payload = mergePayloads(
        ss.sorted.flatMap(sid => srcMarkers.get(sid).map(markerPayload)))
      val sep = if (payload.isEmpty) "" else "\n" + payload
      writeFile(f, new Path(new Path(stagingPath, s"$BucketCol=$c"),
        BucketMarkerFile), s"rows=${perBucket.getOrElse(c, 0L)}$sep")
    }
    // layout descriptor: static + idempotent on a plain run, so it can
    // land before the manifest; a RE-TIER's descriptor must move in
    // lockstep with the swap, so it is written inside the protected
    // window below and healed to whichever side the swap resolves
    if (!retier)
      writeFile(f, new Path(rootPath, LayoutFile),
        s"span=$span\ncoarse_span=$coarseSpan")
    // manifest = the full swap plan (including both coarse spans, so
    // heal can restore the matching layout descriptor); from here
    // until its deletion the backup root belongs to this compaction
    // (healInterrupted routes to healCompaction on seeing it)
    val manifest = (Seq(s"frontier=$frontier1", s"span=$span",
      s"coarse_span_old=$oldCoarseSpan", s"coarse_span_new=$coarseSpan") ++
      groups.toSeq.sortBy(_._1).map { case (gi, ss) =>
        s"group=${-(gi + 1)}:${ss.sorted.mkString(",")}" }).mkString("\n")
    timedPhase("compact_swap") {
      val backupRoot = new Path(root + ".__old__")
      if (f.exists(backupRoot)) f.delete(backupRoot, true)
      f.mkdirs(backupRoot)
      writeFile(f, new Path(rootPath, CompactionManifestFile), manifest)
      // park EVERY source before committing ANY destination: a re-tier
      // destination can share its name with an old coarse source (the
      // key-0 group is -1 under both spans), and heal disambiguates
      // "old source" from "new destination" at that name by whether
      // the backup holds the source — which only works if no
      // destination lands while an unparked source remains
      sources.foreach { sid =>
        val name = s"$BucketCol=$sid"
        require(f.rename(new Path(rootPath, name), new Path(backupRoot, name)),
          s"could not park source bucket $name")
      }
      groups.keys.toSeq.sorted.foreach { gi =>
        val name = s"$BucketCol=${-(gi + 1)}"
        require(f.rename(new Path(stagingPath, name), new Path(rootPath, name)),
          s"could not commit coarse bucket $name")
      }
      if (retier)
        writeFile(f, new Path(rootPath, LayoutFile),
          s"span=$span\ncoarse_span=$coarseSpan")
      f.delete(stagingPath, true)
      f.delete(backupRoot, true)
      f.delete(new Path(rootPath, CompactionManifestFile), false)
    }
    val rowsAfter = standingCount(spark, root)
    require(rowsAfter == rowsStanding,
      s"compaction changed standing rows: $rowsStanding -> $rowsAfter")
    CompactionReport(root, fineIds.size, sources.size, groups.size,
      frontier0, frontier1, rowsAfter)
  }

  /** Default payload merger: only empty payloads merge (to empty).
    * Stamp-bearing buckets (e.g. applied-batch stamps) need semantics
    * only their writer knows.
    */
  def defaultMergePayloads(payloads: Seq[String]): String = {
    require(payloads.forall(_.isEmpty),
      "buckets carry marker payloads; pass a mergePayloads that owns them")
    ""
  }

  /** Roll an interrupted compaction to a consistent state: COMPLETE it
    * when every coarse directory of the manifest landed and every
    * parked source left (delete the backup), ROLL BACK otherwise
    * (delete the destination dirs that landed — their rows are still
    * in the parked source dirs — and restore the parks). A RE-TIER
    * run's layout descriptor is rewritten to whichever coarse span the
    * resolved side uses, so routing and census never disagree.
    * Idempotent: a crash during heal re-enters the same branch.
    *
    * Name collisions (re-tier only): a destination can share its
    * directory name with an old coarse SOURCE (key-0's group is -1
    * under every span). The swap parks all sources before committing
    * any destination, so at such a name "backup holds it" ⟺ the root
    * copy, if any, is the new destination; heal keys on that.
    */
  def healCompaction(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val f = fsOf(spark, rootPath)
    val mf = new Path(rootPath, CompactionManifestFile)
    if (!f.exists(mf)) return
    val lines = readSmallFile(f, mf).linesIterator.toSeq
    val kv = lines.filterNot(_.startsWith("group="))
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    val plan: Seq[(Int, Seq[Int])] = lines.filter(_.startsWith("group=")).map { l =>
      val Array(c, fs0) = l.stripPrefix("group=").split(":", 2)
      (c.toInt, if (fs0.isEmpty) Seq.empty[Int] else fs0.split(",").map(_.toInt).toSeq)
    }
    val sourceIds = plan.flatMap(_._2).toSet
    val backupRoot = new Path(root + ".__old__")
    val staging = new Path(root + ".__compact__")
    def parked(id: Int) = f.exists(new Path(backupRoot, s"$BucketCol=$id"))
    def inRoot(id: Int) = f.exists(new Path(rootPath, s"$BucketCol=$id"))
    // a collision-named root dir only counts as the DESTINATION when
    // its source twin is parked (sources park before any commit)
    def destLanded(c: Int) =
      inRoot(c) && (!sourceIds.contains(c) || parked(c))
    // the swap creates the backup root BEFORE the manifest and deletes
    // it only after every rename landed — so "no backup root" by
    // itself proves the swap completed (and makes the collision-named
    // destination unambiguous even though its parked twin is gone)
    val complete = !f.exists(backupRoot) ||
      (plan.forall { case (c, _) => destLanded(c) } &&
        sourceIds.forall(s => plan.exists(_._1 == s) || !inRoot(s)))
    // a re-tier moves the layout descriptor WITH the swap; old
    // manifests (no span lines) belong to plain runs whose descriptor
    // was static — leave it alone for those
    def writeLayoutSpan(csKey: String): Unit =
      (kv.get("span"), kv.get(csKey)) match {
        case (Some(sp), Some(cs))
            if kv.get("coarse_span_old") != kv.get("coarse_span_new") =>
          writeFile(f, new Path(rootPath, LayoutFile),
            s"span=$sp\ncoarse_span=$cs")
        case _ => ()
      }
    if (complete) {
      writeLayoutSpan("coarse_span_new")
      if (f.exists(backupRoot)) f.delete(backupRoot, true)
      if (f.exists(staging)) f.delete(staging, true)
      f.delete(mf, false)
    } else {
      // pass 1: remove every landed destination — BEFORE any restore,
      // because a landed dest can occupy the root name of a DIFFERENT
      // group's parked source (re-tier: source -2 of group 0, dest -2
      // of group 1), and a restore skipped for "name taken" whose
      // taker is then deleted would strand the source in the backup
      plan.foreach { case (c, _) =>
        val destDir = new Path(rootPath, s"$BucketCol=$c")
        // keep the root copy when it is an UNPARKED source wearing the
        // destination's name — deleting it would destroy standing rows
        if (f.exists(destDir) && (!sourceIds.contains(c) || parked(c)))
          f.delete(destDir, true)
      }
      // pass 2: restore every parked source
      plan.foreach { case (_, ss) =>
        ss.foreach { sid =>
          val name = s"$BucketCol=$sid"
          val park = new Path(backupRoot, name)
          val dest = new Path(rootPath, name)
          if (f.exists(park) && !f.exists(dest))
            require(f.rename(park, dest), s"could not restore $dest")
        }
      }
      writeLayoutSpan("coarse_span_old")
      // manifest BEFORE backup: a crash between the two re-enters the
      // non-compaction heal (which leaves restored dests alone), never
      // the complete branch above — whose layout rewrite would undo
      // the rollback's (the backup-absent shortcut would claim it)
      f.delete(mf, false)
      if (f.exists(staging)) f.delete(staging, true)
      if (f.exists(backupRoot)) f.delete(backupRoot, true)
    }
  }

  private def readSmallFile(
      f: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
  }
}
