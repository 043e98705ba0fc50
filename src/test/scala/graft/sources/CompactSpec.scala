package graft.sources

import graft.SparkTestBase
import graft.operators.CommitSink
import org.apache.hadoop.fs.Path

class CompactSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-compact").toString

  private def writeFragmented(dir: String, rows: Int, files: Int): Unit = {
    import spark.implicits._
    (1 to rows).map(i => (i.toLong, s"doc $i body", i % 7))
      .toDF("id", "body", "tag")
      .repartition(files)
      .write.mode("overwrite").parquet(dir)
  }

  private def partFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  private def contents(dir: String): Set[(Long, String, Int)] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("body")),
        r.getInt(r.fieldIndex("tag")))).toSet

  test("compaction merges small files, preserves content, and reports honestly") {
    val dir = s"${tmp()}/t"
    writeFragmented(dir, rows = 2000, files = 40)
    val before = contents(dir)
    assert(partFiles(dir).size == 40)

    val rep = Compact.compact(spark, dir, targetBytes = 1L << 30)
    assert(rep.rewritten && rep.filesBefore == 40 && rep.filesAfter == 1,
      rep.toString)
    assert(rep.rows == 2000)
    assert(contents(dir) == before, "compaction must not change content")
    // fewer, larger files — and the report's byte counts describe disk
    assert(rep.bytesAfter > 0 && rep.bytesAfter < rep.bytesBefore,
      s"merged parquet should shed per-file overhead: $rep")
  }

  test("an already-compact directory is a byte-identical no-op") {
    val dir = s"${tmp()}/t"
    // a single file under any byte target IS the compact layout —
    // ceil(bytes/target) = 1 = file count, so nothing to do
    writeFragmented(dir, rows = 100, files = 1)
    val stamps = partFiles(dir).map { p =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (p.getName, fs.getFileStatus(p).getModificationTime)
    }.toSet
    val rep = Compact.compact(spark, dir, targetBytes = 1L << 30)
    assert(!rep.rewritten && rep.filesBefore == 1 && rep.filesAfter == 1)
    assert(rep.rows == 100)
    val after = partFiles(dir).map { p =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (p.getName, fs.getFileStatus(p).getModificationTime)
    }.toSet
    assert(after == stamps, "no-op compaction must not touch files")
  }

  test("compaction heals an interrupted prior commit before reading") {
    val dir = s"${tmp()}/t"
    writeFragmented(dir, rows = 500, files = 10)
    val before = contents(dir)
    // simulate a crash between writeVerified's two renames: the only
    // complete copy is parked at the backup path, dest is absent
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new Path(dir + ".__old__")))
    val rep = Compact.compact(spark, dir, targetBytes = 1L << 30)
    assert(rep.rows == 500 && rep.rewritten)
    assert(contents(dir) == before, "healed state must compact losslessly")
    assert(!fs.exists(new Path(dir + ".__old__")), "backup consumed by commit")
  }

  test("target bytes derives the output count (ceil division)") {
    val dir = s"${tmp()}/t"
    writeFragmented(dir, rows = 4000, files = 32)
    val bytes = partFiles(dir).map { f =>
      val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getFileStatus(f).getLen
    }.sum
    // pick a target yielding 3 outputs: ceil(bytes / (bytes/3 + 1)) = 3
    val rep = Compact.compact(spark, dir, targetBytes = bytes / 3 + 1)
    assert(rep.rewritten && rep.filesAfter == 3, rep.toString)
    assert(spark.read.parquet(dir).count() == 4000)
  }

  test("a bucket-partitioned standing table is refused outright") {
    // the flat rewriter would fold __bucket= dirs into plain row files
    // and destroy the _applied marker discipline — those tables
    // compact at the bucket grain (PartitionedCommit.compactRange)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = s"${tmp()}/t"
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
      .withColumn(graft.operators.PartitionedCommit.BucketCol,
        graft.operators.PartitionedCommit.rangeBucketOf(col("k"), 5L))
    graft.operators.PartitionedCommit.commitPartitions(
      spark, df, dir, (0 to 4))
    val e = intercept[IllegalArgumentException] {
      Compact.compact(spark, dir)
    }
    assert(e.getMessage.contains("compactRange"), e.getMessage)
    // untouched: still reads back whole
    assert(spark.read.parquet(dir).count() == 20)
  }

  test("a compacted table still round-trips the verified-commit read path") {
    val dir = s"${tmp()}/t"
    writeFragmented(dir, rows = 300, files = 12)
    Compact.compact(spark, dir, targetBytes = 1L << 30)
    // the standard standing-state read discipline still applies
    assert(CommitSink.healInterrupted(spark, dir))
    assert(spark.read.parquet(dir).count() == 300)
  }
}
