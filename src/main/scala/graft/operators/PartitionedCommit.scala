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
      df.observe(obs, count(lit(1)).as("rows"))
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
}
