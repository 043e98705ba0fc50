package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** At-least-once commit with post-commit verification (ref A14's
  * QSAVE/CLOSE + verify-closed re-check, `Batch Processor.py:347-361`).
  *
  * The reference saves in place; Spark cannot safely overwrite a path
  * it is reading (SURVEY.md §7 hard parts), so commit is
  * write-to-staging → read-back verify → atomic swap. This is a
  * deliberate semantic deviation documented here: the observable
  * contract (either the old or the fully-written new data is visible)
  * is strictly stronger than the reference's in-place save.
  */
object CommitSink {

  final case class CommitVerificationFailed(
      path: String, expected: Long, actual: Long)
    extends RuntimeException(
      s"read-back verify failed for $path: expected $expected rows, read $actual")

  /** Write `df` to `dest` via staging with read-back count
    * verification; returns committed row count.
    */
  def writeVerified(spark: SparkSession, df: DataFrame, dest: String): Long = {
    val staging = dest + ".__staging__"
    df.write.mode("overwrite").parquet(staging)

    // Post-commit verification (ref `:351-361`): re-open what was
    // written and check it is complete before the swap.
    val expected = df.count()
    val actual = spark.read.parquet(staging).count()
    if (actual != expected) throw CommitVerificationFailed(dest, expected, actual)

    val conf = spark.sparkContext.hadoopConfiguration
    val destPath = new Path(dest)
    val stagingPath = new Path(staging)
    val fs = destPath.getFileSystem(conf)
    if (fs.exists(destPath) && !fs.delete(destPath, true))
      throw new RuntimeException(s"could not replace $dest")
    if (!fs.rename(stagingPath, destPath))
      throw new RuntimeException(s"could not commit $staging -> $dest")
    actual
  }
}
