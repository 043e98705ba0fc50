package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.operators.CommitSink

/** Small-file COMPACTION — the table-maintenance pass every
  * streaming-ingested corpus needs (ref's corpus is file-set-shaped,
  * `Batch Processor.py:228-244`; a micro-batch upsert discipline like
  * [[graft.streaming.CorpusMaintenance]] or
  * [[graft.operators.PartitionedCommit]] accretes one-or-more files
  * per delivery, and a year of 1-minute batches is half a million
  * part-files whose open/footer cost eventually dominates every scan).
  *
  * `compact` rewrites a parquet directory into ~`targetBytes` outputs
  * through the verified staging-swap commit ([[CommitSink]]): the
  * rewrite reads `dir` while writing `dir.__staging__` (never
  * overwriting what it reads — SURVEY §7's hard-parts rule), count-
  * verifies the staging copy, then backup-renames into place, so a
  * crash at any point leaves a complete copy on disk.
  *
  * Scale shape: the rewrite is COALESCE, not repartition — Spark's
  * file-scan partitioning already bin-packs small files into
  * ~`maxPartitionBytes` read splits, so coalescing to the byte-derived
  * output count merges those splits WITHOUT an exchange; a 100 TB
  * table compacts at pure read+write cost, no shuffle. Already-compact
  * directories (file count ≤ target count) are left byte-identical —
  * a no-op report, not a pointless rewrite.
  */
object Compact {

  final case class CompactReport(
      path: String,
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long,
      rows: Long, rewritten: Boolean)

  private def dataFiles(
      spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** Compact the parquet table at `dir` to ceil(bytes/targetBytes)
    * files (min 1). Heals an interrupted prior commit first (the
    * [[CommitSink.healInterrupted]] read discipline), skips the
    * rewrite when the directory is already at-or-under the target
    * file count, and otherwise rewrites through the verified commit.
    */
  def compact(
      spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): CompactReport = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // refuse a bucket-partitioned standing table OUTRIGHT: this
    // rewriter reads the dir flat and would fold the `__bucket=`
    // directories into plain row files, destroying the partition
    // layout and every `_applied` marker (exactly-once stamps, the
    // marker-held row counts). Those tables compact at the BUCKET
    // grain instead — [[graft.operators.PartitionedCommit
    // .compactRange]].
    locally {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(!fs.exists(p) || !fs.listStatus(p).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith(
          graft.operators.PartitionedCommit.BucketCol + "=")),
        s"$dir is a bucket-partitioned standing table — use " +
          "PartitionedCommit.compactRange, not the flat-file compactor")
    }
    CommitSink.healInterrupted(spark, dir)
    val before = dataFiles(spark, dir)
    val bytesBefore = before.map(_._2).sum
    val nOut = math.max(1L,
      (bytesBefore + targetBytes - 1) / targetBytes).toInt
    if (before.size <= nOut) {
      // already compact: leave the files untouched (byte-identical),
      // report rows from a metadata-only count
      val rows = spark.read.parquet(dir).count()
      return CompactReport(dir, before.size, before.size,
        bytesBefore, bytesBefore, rows, rewritten = false)
    }
    // coalesce only REDUCES partition count: when the scan packs the
    // small input files into fewer partitions than nOut (file packing
    // is driven by maxPartitionBytes/openCost, not by our target),
    // coalesce(nOut) silently under-produces. Keep the shuffle-free
    // coalesce on the common merge-down path and pay one round-robin
    // shuffle only when the scan arrives under-partitioned.
    val scan = spark.read.parquet(dir)
    val shaped =
      if (scan.rdd.getNumPartitions >= nOut) scan.coalesce(nOut)
      else scan.repartition(nOut)
    val rows = CommitSink.writeVerified(spark, shaped, dir)
    val after = dataFiles(spark, dir)
    CompactReport(dir, before.size, after.size,
      bytesBefore, after.map(_._2).sum, rows, rewritten = true)
  }
}
