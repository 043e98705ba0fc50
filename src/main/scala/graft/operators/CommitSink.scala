package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** At-least-once commit with post-commit verification (ref A14's
  * QSAVE/CLOSE + verify-closed re-check, `Batch Processor.py:347-361`).
  *
  * The reference saves in place; Spark cannot safely overwrite a path
  * it is reading (SURVEY.md §7 hard parts), so commit is
  * write-to-staging → read-back verify → backup-rename swap. The
  * contract: data is only ever destroyed AFTER the new copy is fully
  * written and verified — a crash mid-swap can leave `dest` briefly
  * absent, but a complete copy always exists (at `dest` or
  * `dest.__old__`/staging). Strictly stronger than the reference's
  * in-place save; true atomic visibility would need a metadata layer.
  */
object CommitSink {

  final case class CommitVerificationFailed(
      path: String, expected: Long, actual: Long)
    extends RuntimeException(
      s"read-back verify failed for $path: expected $expected rows, read $actual")

  /** Heal an interrupted swap before READING standing state at `dest`:
    * [[writeVerified]]'s backup-rename swap can crash between its two
    * renames, leaving `dest` absent with the only complete copy at
    * `dest.__old__`. Any reader that gates on bare `exists(dest)`
    * would then treat the standing state as empty — and the next
    * commit would delete the backup, making the loss permanent. Every
    * read of a CommitSink-managed path must go through this helper
    * first. Returns whether `dest` exists after healing.
    */
  def healInterrupted(spark: SparkSession, dest: String): Boolean = {
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(destPath)) {
      val backup = new Path(dest + ".__old__")
      if (fs.exists(backup) && !fs.rename(backup, destPath))
        // a failed rename is fine iff a CONCURRENT healer won the
        // race (dest now present) — two readers healing the same
        // crash must both proceed, not fail one spuriously
        require(fs.exists(destPath),
          s"could not restore $dest from interrupted-commit backup")
    }
    fs.exists(destPath)
  }

  /** Write `df` to `dest` via staging with read-back count
    * verification; returns committed row count.
    */
  def writeVerified(spark: SparkSession, df: DataFrame, dest: String): Long = {
    val staging = dest + ".__staging__"
    // The expected count is OBSERVED on the same execution that writes
    // the staging copy — not recomputed with a second df.count() pass:
    // a nondeterministic df (rand, sampling, source files changing
    // under the plan) would make a recomputed count spuriously
    // mismatch, and every commit would pay the full plan twice.
    val obs = new org.apache.spark.sql.Observation("commit_rows")
    df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(staging)
    val expected = obs.get("rows").asInstanceOf[Long]

    // Post-commit verification (ref `:351-361`): re-open what was
    // written and check it is complete before the swap.
    val actual = spark.read.parquet(staging).count()
    if (actual != expected) throw CommitVerificationFailed(dest, expected, actual)

    val conf = spark.sparkContext.hadoopConfiguration
    val destPath = new Path(dest)
    val stagingPath = new Path(staging)
    val fs = destPath.getFileSystem(conf)
    // Swap via backup-rename, not delete-then-rename: if the process
    // dies between the two renames, the old data still exists at
    // `dest.__old__` and is recoverable — a crash can leave dest
    // momentarily absent but never destroys the only copy. (True
    // atomicity needs a metadata layer; this is the strongest contract
    // plain rename offers, and strictly stronger than the reference's
    // in-place save.)
    val backupPath = new Path(dest + ".__old__")
    if (fs.exists(backupPath)) fs.delete(backupPath, true)
    val hadOld = fs.exists(destPath)
    if (hadOld && !fs.rename(destPath, backupPath))
      throw new RuntimeException(s"could not stage out old $dest")
    if (!fs.rename(stagingPath, destPath)) {
      if (hadOld) fs.rename(backupPath, destPath) // roll back
      throw new RuntimeException(s"could not commit $staging -> $dest")
    }
    if (hadOld) fs.delete(backupPath, true)
    actual
  }
}
