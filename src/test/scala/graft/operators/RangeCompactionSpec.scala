package graft.operators

import graft.SparkTestBase
import graft.streaming.CorpusMaintenance
import org.apache.spark.sql.functions._

import graft.operators.PartitionedCommit.{BucketCol, Layout}

/** Range-bucket compaction ([[PartitionedCommit.compactRange]]): the
  * cold prefix of fine range buckets folds into coarse negative-id
  * buckets, byte-equal standing state, markers re-derived, frontier
  * self-described by the directory census; upserts after compaction
  * route compacted keys to their coarse directory; the manifest-gated
  * swap heals all-or-nothing from every crash point.
  */
class RangeCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private val Span = 10L
  private val Factor = 4

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def mkTable(root: String, nBatches: Int): Unit =
    (0 until nBatches).foreach { b =>
      val rows = (0 until 10).map(i => (b * 10L + i, s"t$b-$i", s"s$b"))
      CorpusMaintenance.upsertBatch(
        rows.toDF("doc_id", "text", "source"), root, "doc_id",
        Some(Layout.Range(Span)))
    }

  private def rows(root: String): Set[(Long, String, String)] =
    spark.read.parquet(root).drop(BucketCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private def dirIds(root: String): Set[Int] =
    new java.io.File(root).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(BucketCol + "="))
      .map(_.getName.stripPrefix(BucketCol + "=").toInt).toSet

  test("compaction preserves state exactly and bounds the census") {
    val root = tmp("rc-basic") + "/docs"
    mkTable(root, 10) // fine ids 0..9, 100 rows
    val before = rows(root)
    val markersBefore = PartitionedCommit.readBucketMarkers(spark, root)
    assert(markersBefore.values.map(_.linesIterator.next()
      .stripPrefix("rows=").toLong).sum == 100L)
    val rep = PartitionedCommit.compactRange(spark, root, Span, Factor,
      keepFine = 2)
    // kept fine tail = ids 8,9 → frontier = floor(80/40)*40 = 80 →
    // fine 0..7 fold into coarse groups 0 (keys 0..39) and 1 (40..79)
    assert(rep.frontierAfter == 80L, rep.toString)
    assert(rep.compacted == 8 && rep.coarseCreated == 2, rep.toString)
    assert(dirIds(root) == Set(-1, -2, 8, 9), dirIds(root).toString)
    assert(rows(root) == before, "compaction must not change standing rows")
    // markers re-derived: totals preserved, standingCount stays
    // marker-fast (no count job needed)
    val markersAfter = PartitionedCommit.readBucketMarkers(spark, root)
    assert(markersAfter.keySet == Set(-1, -2, 8, 9))
    assert(PartitionedCommit.standingCount(spark, root) == 100L)
    // resolve reads the frontier back from the census
    PartitionedCommit.resolveRange(spark, root, Span) match {
      case Layout.RangeTiered(s, cs, f) =>
        assert(s == Span && cs == Span * Factor && f == 80L)
      case other => fail(s"expected tiered layout, got $other")
    }
    // idempotent no-op: nothing new to fold
    val rep2 = PartitionedCommit.compactRange(spark, root, Span, Factor,
      keepFine = 2)
    assert(rep2.compacted == 0 && rep2.frontierAfter == 80L)
  }

  test("post-compaction upserts route updates to the coarse tier") {
    val root = tmp("rc-route") + "/docs"
    mkTable(root, 10)
    PartitionedCommit.compactRange(spark, root, Span, Factor, keepFine = 2)
    val fineSnapshot = dirIds(root)
    // update a compacted key (5 lives in coarse -1) and a hot key (95)
    CorpusMaintenance.upsertBatch(
      Seq((5L, "t0-5-v2", "sX"), (95L, "t9-5-v2", "sX"))
        .toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Range(Span)))
    assert(dirIds(root) == fineSnapshot, "no new directory for an update")
    val got = rows(root)
    assert(got.contains((5L, "t0-5-v2", "sX")) &&
      !got.exists(r => r._1 == 5L && r._2 == "t0-5"),
      "compacted key's standing row must be replaced, not duplicated")
    assert(got.contains((95L, "t9-5-v2", "sX")))
    assert(spark.read.parquet(root).count() == 100L, "no duplicates")
    // appends still create fine buckets past the frontier
    CorpusMaintenance.upsertBatch(
      (100L to 109L).map(i => (i, s"n$i", "sN")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Range(Span)))
    assert(dirIds(root).contains(10), "append lands in its own fine bucket")
    assert(spark.read.parquet(root).count() == 110L)
  }

  test("a second compaction extends the frontier over the grown tail") {
    val root = tmp("rc-second") + "/docs"
    mkTable(root, 10)
    PartitionedCommit.compactRange(spark, root, Span, Factor, keepFine = 2)
    (10 until 18).foreach { b =>
      CorpusMaintenance.upsertBatch(
        (0 until 10).map(i => (b * 10L + i, s"t$b-$i", s"s$b"))
          .toDF("doc_id", "text", "source"),
        root, "doc_id", Some(Layout.Range(Span)))
    }
    val before = rows(root)
    val rep = PartitionedCommit.compactRange(spark, root, Span, Factor,
      keepFine = 2)
    assert(rep.frontierBefore == 80L && rep.frontierAfter == 160L, rep.toString)
    assert(dirIds(root) == Set(-1, -2, -3, -4, 16, 17), dirIds(root).toString)
    assert(rows(root) == before)
    assert(PartitionedCommit.standingCount(spark, root) == 180L)
  }

  test("crash matrix: the manifest-gated swap heals all-or-nothing") {
    import org.apache.hadoop.fs.Path
    val fsConf = spark.sparkContext.hadoopConfiguration

    def fineName(i: Int) = s"$BucketCol=$i"
    def park(root: String, ids: Seq[Int]): Unit = {
      val f = new Path(root).getFileSystem(fsConf)
      val backup = new Path(root + ".__old__")
      f.mkdirs(backup)
      ids.foreach { i =>
        assert(f.rename(new Path(root, fineName(i)),
          new Path(backup, fineName(i))))
      }
    }
    def writeManifest(root: String): Unit = {
      val f = new Path(root).getFileSystem(fsConf)
      val out = f.create(new Path(root, PartitionedCommit.CompactionManifestFile), true)
      out.write(("frontier=80\ngroup=-1:0,1,2,3\ngroup=-2:4,5,6,7")
        .getBytes("UTF-8"))
      out.close()
    }

    // (a) manifest written, nothing moved → heal is a no-op rollback
    val a = tmp("rc-crash-a") + "/docs"
    mkTable(a, 10)
    val aBefore = rows(a)
    writeManifest(a)
    assert(PartitionedCommit.healInterrupted(spark, a))
    assert(rows(a) == aBefore && dirIds(a) == (0 to 9).toSet)
    assert(!new java.io.File(a, PartitionedCommit.CompactionManifestFile).exists())

    // (b) some fine buckets parked, no coarse landed → rolled back
    val b = tmp("rc-crash-b") + "/docs"
    mkTable(b, 10)
    val bBefore = rows(b)
    writeManifest(b)
    park(b, Seq(0, 1, 5))
    assert(PartitionedCommit.healInterrupted(spark, b))
    assert(rows(b) == bBefore && dirIds(b) == (0 to 9).toSet)
    assert(!new java.io.File(b + ".__old__").exists())

    // (c) all parked, ONE coarse landed → still rolled back (a torn
    // frontier would route updates of the missing group to a fine
    // bucket their standing rows are not in)
    val c = tmp("rc-crash-c") + "/docs"
    mkTable(c, 10)
    val cBefore = rows(c)
    // produce a REAL coarse dir to land: compact a twin table and copy
    val twin = tmp("rc-crash-c-twin") + "/docs"
    mkTable(twin, 10)
    PartitionedCommit.compactRange(spark, twin, Span, Factor, keepFine = 2)
    writeManifest(c)
    park(c, 0 to 7)
    val fC = new Path(c).getFileSystem(fsConf)
    org.apache.hadoop.fs.FileUtil.copy(
      fC, new Path(twin, s"$BucketCol=-1"),
      fC, new Path(c, s"$BucketCol=-1"), false, fsConf)
    assert(PartitionedCommit.healInterrupted(spark, c))
    assert(rows(c) == cBefore && dirIds(c) == (0 to 9).toSet,
      "partial coarse landing must roll back fully")

    // (d) every coarse landed, manifest still present → completed
    val d = tmp("rc-crash-d") + "/docs"
    mkTable(d, 10)
    val dBefore = rows(d)
    PartitionedCommit.compactRange(spark, d, Span, Factor, keepFine = 2)
    writeManifest(d) // crash was between backup delete and manifest delete
    assert(PartitionedCommit.healInterrupted(spark, d))
    assert(rows(d) == dBefore && dirIds(d) == Set(-1, -2, 8, 9))

    // a later upsert works on every healed table
    Seq(a, b, c, d).foreach { root =>
      CorpusMaintenance.upsertBatch(
        Seq((5L, "healed-v2", "sH")).toDF("doc_id", "text", "source"),
        root, "doc_id", Some(Layout.Range(Span)))
      assert(spark.read.parquet(root).count() == 100L,
        s"$root: update after heal must not duplicate")
      assert(rows(root).contains((5L, "healed-v2", "sH")))
    }
  }

  test("negative-key tables refuse compaction; tiered routing refuses negative keys") {
    val root = tmp("rc-neg") + "/docs"
    CorpusMaintenance.upsertBatch(
      Seq((-5L, "n", "s"), (3L, "p", "s")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Range(Span)))
    val e = intercept[IllegalArgumentException] {
      PartitionedCommit.compactRange(spark, root, Span, Factor)
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
    val tiered = Layout.RangeTiered(Span, Span * Factor, 80L)
    val ex = intercept[Exception] {
      Seq(-1L).toDF("k").select(tiered.bucketOf(col("k"))).collect()
    }
    assert(ex.getMessage.contains("non-negative"), ex.getMessage)
  }

  test("marker payloads: default merger refuses, a caller merger owns them") {
    val root = tmp("rc-payload") + "/t"
    val df = (0L until 40L).map(i => (i, s"v$i")).toDF("k", "v")
      .withColumn(BucketCol, PartitionedCommit.rangeBucketOf(col("k"), Span))
    PartitionedCommit.commitPartitions(spark, df, root, (0 to 3),
      markers = (0 to 3).map(b => b -> s"stamp=$b").toMap)
    val e = intercept[IllegalArgumentException] {
      PartitionedCommit.compactRange(spark, root, Span, Factor, keepFine = 0)
    }
    assert(e.getMessage.contains("payload"), e.getMessage)
    // a caller-supplied merger folds the stamps into the coarse marker
    val rep = PartitionedCommit.compactRange(spark, root, Span, Factor,
      keepFine = 0, mergePayloads = ps => ps.mkString(";"))
    assert(rep.coarseCreated == 1)
    val m = PartitionedCommit.readBucketMarkers(spark, root)
    assert(PartitionedCommit.markerPayload(m(-1)) ==
      "stamp=0;stamp=1;stamp=2;stamp=3")
    assert(PartitionedCommit.standingCount(spark, root) == 40L)
  }
}
