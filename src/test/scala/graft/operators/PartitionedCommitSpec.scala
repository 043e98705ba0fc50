package graft.operators

import graft.SparkTestBase
import graft.streaming.CorpusMaintenance
import org.apache.spark.sql.functions._

/** Partition-grain commits: the partitioned upsert is semantically the
  * full-rewrite upsert (same merged corpus, batch wins on key), but a
  * commit physically rewrites ONLY the bucket directories the batch
  * touches — untouched buckets keep their exact files. Crash healing
  * restores a bucket parked mid-swap; an emptied bucket's directory is
  * removed.
  */
import graft.operators.PartitionedCommit.Layout

class PartitionedCommitSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def bucketOf(id: Long, n: Int): Int =
    Seq(id).toDF("k")
      .select(PartitionedCommit.bucketOf(col("k"), n)).head().getInt(0)

  /** Per-bucket file snapshot: dir name -> set of (file, len, mtime).
    * Parquet part-file names embed a fresh write UUID, so a rewritten
    * bucket ALWAYS changes its snapshot; an untouched bucket must
    * keep it bit-identical.
    */
  private def snapshot(root: String): Map[String, Set[(String, Long, Long)]] = {
    val rootDir = new java.io.File(root)
    rootDir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map { d =>
        d.getName -> d.listFiles().toSeq
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
  }

  test("partitioned upsert equals the full-rewrite merge, batch by batch") {
    val flat = tmp("pc-flat") + "/docs"
    val part = tmp("pc-part") + "/docs"
    val batches = Seq(
      Seq((1L, "a", "s1"), (2L, "b", "s1"), (2L, "b", "s1")), // in-batch dupe
      Seq((2L, "b-v2", "s2"), (3L, "c", "s2")),               // update + insert
      Seq((1L, "a-v2", "s3"), (9L, "i", "s3")))
    batches.foreach { rows =>
      val df = rows.toDF("doc_id", "text", "source")
      val nFlat = CorpusMaintenance.upsertBatch(df, flat, "doc_id")
      val nPart = CorpusMaintenance.upsertBatch(df, part, "doc_id", Some(Layout.Hash(8)))
      assert(nFlat == nPart, "standing row counts must agree")
      val a = spark.read.parquet(flat)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val b = spark.read.parquet(part).drop(PartitionedCommit.BucketCol)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(a == b, s"partitioned corpus diverged: $b vs $a")
    }
  }

  test("a staged bucket not declared touched is an error, not silent loss") {
    val root = tmp("pc-undeclared") + "/docs"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .withColumn(PartitionedCommit.BucketCol,
        PartitionedCommit.bucketOf(col("doc_id"), 8))
    val allBuckets = df.select(PartitionedCommit.BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(allBuckets.size > 1, "fixture should span several buckets")
    // declare only one of the touched buckets: the other staged rows
    // would be swapped nowhere and deleted with staging — the commit
    // must refuse instead
    val e = intercept[IllegalArgumentException] {
      PartitionedCommit.commitPartitions(spark, df, root, allBuckets.take(1))
    }
    assert(e.getMessage.contains("not declared touched"))
    // a correctly-declared commit then succeeds
    assert(PartitionedCommit.commitPartitions(spark, df, root, allBuckets) == 3L)
  }

  test("a commit rewrites only the touched buckets; no residue dirs") {
    val root = tmp("pc-touch") + "/docs"
    val n = 8
    val b1 = (1L to 24L).map(i => (i, s"t$i", "s1")).toDF("doc_id", "text", "source")
    CorpusMaintenance.upsertBatch(b1, root, "doc_id", Some(Layout.Hash(n)))
    val before = snapshot(root)
    assert(before.size > 1, "fixture must span several buckets")

    val updated = 1L
    CorpusMaintenance.upsertBatch(
      Seq((updated, "t1-v2", "s2")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Hash(n)))
    val after = snapshot(root)
    val touchedDir = s"__bucket=${bucketOf(updated, n)}"
    before.keySet.foreach { dir =>
      if (dir == touchedDir)
        assert(after(dir) != before(dir), s"$dir should have been rewritten")
      else
        assert(after(dir) == before(dir),
          s"untouched $dir was rewritten: ${after(dir)} vs ${before(dir)}")
    }
    // commit hygiene: staging and backup roots cleaned up
    val siblings = new java.io.File(root).getParentFile.listFiles().map(_.getName)
    assert(siblings.toSet == Set("docs"), siblings.mkString(","))
    // and the update actually landed
    assert(spark.read.parquet(root).filter(col("doc_id") === updated)
      .head().getString(1) == "t1-v2")
  }

  test("an emptied touched bucket's directory is removed") {
    val root = tmp("pc-empty") + "/t"
    val n = 4
    val all = (1L to 12L).map(i => (i, s"v$i")).toDF("k", "v")
      .withColumn(PartitionedCommit.BucketCol, PartitionedCommit.bucketOf(col("k"), n))
    PartitionedCommit.commitPartitions(spark, all, root, (0 until n).toSeq)
    val dropBucket = bucketOf(1L, n)
    // recommit everything EXCEPT dropBucket's rows, with dropBucket touched
    val kept = all.filter(col(PartitionedCommit.BucketCol) =!= dropBucket)
    PartitionedCommit.commitPartitions(spark, kept, root, (0 until n).toSeq)
    assert(!new java.io.File(root, s"__bucket=$dropBucket").exists(),
      "emptied bucket dir must be removed")
    val expect = (1L to 12L).filter(bucketOf(_, n) != dropBucket).toSet
    assert(spark.read.parquet(root).select("k")
      .collect().map(_.getLong(0)).toSet == expect)
  }

  test("a crash between partition renames heals on the next read") {
    val root = tmp("pc-crash") + "/docs"
    val n = 8
    CorpusMaintenance.upsertBatch(
      (1L to 24L).map(i => (i, s"t$i", "s")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Hash(n)))
    val standing = spark.read.parquet(root)
      .drop(PartitionedCommit.BucketCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // simulate dying between the two renames of ONE bucket: its dir
    // absent, the only copy parked under <root>.__old__
    val victim = snapshot(root).keySet.head
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backupRoot = new org.apache.hadoop.fs.Path(root + ".__old__")
    fs.mkdirs(backupRoot)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(root + "/" + victim),
      new org.apache.hadoop.fs.Path(backupRoot, victim)))
    // the healed read restores the bucket; a later upsert merges into
    // the RECOVERED table instead of losing the parked bucket
    val healed = PartitionedCommit.read(spark, root)
      .drop(PartitionedCommit.BucketCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(healed == standing, "parked bucket must be restored on read")
    CorpusMaintenance.upsertBatch(
      Seq((99L, "new", "s")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Hash(n)))
    assert(spark.read.parquet(root).count() == 25)
  }
}
