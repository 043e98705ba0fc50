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

  test("an all-empty coarse group lands schema-bearing, not marker-only") {
    val root = tmp("rc-empty-group") + "/docs"
    // fine 0 (keys 0..9), then retire every key: the emptying commit
    // leaves one empty marker bucket (dir 0, rows=0, schema-bearing)
    mkTable(root, 1)
    import org.apache.spark.sql.types._
    val emptyRows = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
    CorpusMaintenance.upsertGroups(emptyRows, root, "doc_id",
      Some(Layout.Range(Span)),
      retireKeys = Some((0L until 10L).toDF("doc_id")))
    assert(spark.read.parquet(root).count() == 0L)
    // later appends land past the gap (keys 40..99 → fine 4..9)
    (4 until 10).foreach { b =>
      val rows = (0 until 10).map(i => (b * 10L + i, s"t$b-$i", s"s$b"))
      CorpusMaintenance.upsertBatch(
        rows.toDF("doc_id", "text", "source"), root, "doc_id",
        Some(Layout.Range(Span)))
    }
    // compaction folds [0] → coarse -1 (ALL-EMPTY group) and [4..7] →
    // coarse -2; the empty group must still produce a parquet data
    // file, or the swapped-in dir is marker-only and the next
    // spark.read of that dir (and the routed upsert below) fails
    // (r13 ADVICE: the backfill ran after the marker loop, whose
    // writeFile had already created the dir — dead code)
    val rep = PartitionedCommit.compactRange(spark, root, Span, Factor,
      keepFine = 2)
    assert(rep.compacted == 5 && rep.coarseCreated == 2, rep.toString)
    assert(dirIds(root) == Set(-1, -2, 8, 9), dirIds(root).toString)
    val emptyCoarse = new java.io.File(root, s"$BucketCol=-1")
    assert(emptyCoarse.listFiles().exists(_.getName.startsWith("part-")),
      "all-empty coarse group must carry a schema-bearing parquet file")
    val markers = PartitionedCommit.readBucketMarkers(spark, root)
    assert(markers(-1).linesIterator.next() == "rows=0")
    assert(spark.read.parquet(root).count() == 60L)
    assert(PartitionedCommit.standingCount(spark, root) == 60L)
    // a key of the empty coarse range routes INTO dir -1 and commits
    CorpusMaintenance.upsertBatch(
      Seq((5L, "reborn", "sZ")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Range(Span)))
    assert(dirIds(root) == Set(-1, -2, 8, 9), "no new directory")
    assert(rows(root).contains((5L, "reborn", "sZ")))
    assert(PartitionedCommit.standingCount(spark, root) == 61L)
  }

  test("re-tier folds coarse → coarser exactly (the geometric ladder)") {
    val root = tmp("rc-retier") + "/docs"
    mkTable(root, 20) // fine 0..19, 200 rows
    PartitionedCommit.compactRange(spark, root, Span, Factor, keepFine = 2)
    // cs=40, frontier 160: coarse -1..-4, fine 16..19
    assert(dirIds(root) == Set(-1, -2, -3, -4, 16, 17, 18, 19))
    val before = rows(root)
    // re-tier to cs=160 (factor 16): folds the four coarse dirs into
    // ONE (key-0 group collides with old -1 by name), fine tail stays
    val rep = PartitionedCommit.compactRange(spark, root, Span, 16,
      keepFine = 2)
    assert(rep.compacted == 4 && rep.coarseCreated == 1, rep.toString)
    assert(rep.frontierBefore == 160L && rep.frontierAfter == 160L)
    assert(dirIds(root) == Set(-1, 16, 17, 18, 19), dirIds(root).toString)
    assert(rows(root) == before, "re-tier must not change standing rows")
    assert(PartitionedCommit.standingCount(spark, root) == 200L)
    PartitionedCommit.resolveRange(spark, root, Span) match {
      case Layout.RangeTiered(s, cs, fr) =>
        assert(s == Span && cs == 160L && fr == 160L)
      case other => fail(s"expected re-tiered layout, got $other")
    }
    // updates route into the new coarse dir; appends stay fine-grained
    CorpusMaintenance.upsertBatch(
      Seq((5L, "retier-v2", "sR")).toDF("doc_id", "text", "source"),
      root, "doc_id", Some(Layout.Range(Span)))
    assert(dirIds(root) == Set(-1, 16, 17, 18, 19), "no new directory")
    assert(rows(root).contains((5L, "retier-v2", "sR")))
    assert(spark.read.parquet(root).count() == 200L)
    // a SMALLER coarse span than the recorded one refuses loudly
    val e = intercept[IllegalArgumentException] {
      PartitionedCommit.compactRange(spark, root, Span, Factor)
    }
    assert(e.getMessage.contains("multiple"), e.getMessage)
    // the ladder keeps absorbing growth at the new span: 14 more fine
    // batches, then a factor-16 compaction folds them to coarse -2
    (20 until 34).foreach { b =>
      CorpusMaintenance.upsertBatch(
        (0 until 10).map(i => (b * 10L + i, s"t$b-$i", s"s$b"))
          .toDF("doc_id", "text", "source"),
        root, "doc_id", Some(Layout.Range(Span)))
    }
    val rep2 = PartitionedCommit.compactRange(spark, root, Span, 16,
      keepFine = 2)
    assert(rep2.coarseCreated == 1 && rep2.frontierAfter == 320L,
      rep2.toString)
    assert(dirIds(root) == Set(-1, -2, 32, 33), dirIds(root).toString)
    assert(PartitionedCommit.standingCount(spark, root) == 340L)
  }

  test("coarseCap re-tiers automatically and bounds the census") {
    val root = tmp("rc-cap") + "/docs"
    mkTable(root, 26) // fine 0..25
    // factor 2 (cs=20) with cap 3: the plain fold would leave 12
    // coarse dirs (frontier 240); the cap re-tiers to the smallest
    // factor multiple that fits — census ends ≤ cap + keepFine
    val reps = graft.streaming.DocumentPipeline.compact(
      spark, root, root + "-none1", root + "-none2",
      span = Span, factor = 2, keepFine = 2, coarseCap = 3)
    val census = dirIds(root)
    val nCoarse = census.count(_ < 0)
    assert(nCoarse > 0 && nCoarse <= 3, s"census $census after cap")
    assert(PartitionedCommit.standingCount(spark, root) == 260L)
    assert(rows(root).size == 260)
    // absent sibling artifacts no-op quietly
    assert(reps.size == 3 && reps.tail.forall(_.compacted == 0))
  }

  test("two-tier crash matrix: re-tier swap heals all-or-nothing") {
    import org.apache.hadoop.fs.Path
    val fsConf = spark.sparkContext.hadoopConfiguration
    def fs(root: String) = new Path(root).getFileSystem(fsConf)
    def park(root: String, ids: Seq[Int]): Unit = {
      val f = fs(root)
      val backup = new Path(root + ".__old__")
      f.mkdirs(backup)
      ids.foreach { i =>
        assert(f.rename(new Path(root, s"$BucketCol=$i"),
          new Path(backup, s"$BucketCol=$i")))
      }
    }
    val retierManifest = ("frontier=160\nspan=10\ncoarse_span_old=40\n" +
      "coarse_span_new=160\ngroup=-1:-4,-3,-2,-1")
    def writeManifest(root: String): Unit = {
      val out = fs(root).create(
        new Path(root, PartitionedCommit.CompactionManifestFile), true)
      out.write(retierManifest.getBytes("UTF-8"))
      out.close()
    }
    // every fixture: 20 batches compacted at factor 4 → coarse -1..-4
    // (cs_old=40, frontier 160), fine 16..19 — the re-tier's start
    def mk(): String = {
      val root = tmp("rc-crash2") + "/docs"
      mkTable(root, 20)
      PartitionedCommit.compactRange(spark, root, Span, Factor, keepFine = 2)
      root
    }
    def assertRolledBack(root: String, before: Set[(Long, String, String)])
        : Unit = {
      assert(rows(root) == before, "rollback must restore standing rows")
      assert(dirIds(root) == Set(-1, -2, -3, -4, 16, 17, 18, 19))
      PartitionedCommit.resolveRange(spark, root, Span) match {
        case Layout.RangeTiered(_, cs, fr) =>
          assert(cs == 40L && fr == 160L, "layout must restore cs_old")
        case other => fail(s"expected tiered layout, got $other")
      }
    }

    // (a) manifest written, nothing moved (the swap creates the backup
    // root BEFORE the manifest, so it exists — empty — in this
    // window): the old coarse -1 wears the destination's name — heal
    // must NOT delete it (it is an unparked source), and must roll
    // the layout back to cs_old
    val a = mk()
    val aBefore = rows(a)
    fs(a).mkdirs(new Path(a + ".__old__"))
    writeManifest(a)
    assert(PartitionedCommit.healInterrupted(spark, a))
    assertRolledBack(a, aBefore)

    // (b) all four coarse sources parked, destination not landed
    val b = mk()
    val bBefore = rows(b)
    writeManifest(b)
    park(b, Seq(-4, -3, -2, -1))
    assert(PartitionedCommit.healInterrupted(spark, b))
    assertRolledBack(b, bBefore)

    // (c) PARTIAL landing across two groups: everything parked
    // (old coarse -4..-1 into group -1, fine 16,17 into group -2),
    // only the colliding destination -1 landed. Note -2 is BOTH a
    // source name (old coarse of group -1) and a destination name
    // (group -2) — the disambiguation rule must read it as the
    // unlanded destination. Rollback must delete the NEW -1 and
    // restore every park.
    val c = mk()
    val cBefore = rows(c)
    val twin = mk() // a completed re-tier supplies a real new-span dir
    PartitionedCommit.compactRange(spark, twin, Span, 16, keepFine = 2)
    val twoGroups = ("frontier=320\nspan=10\ncoarse_span_old=40\n" +
      "coarse_span_new=160\ngroup=-1:-4,-3,-2,-1\ngroup=-2:16,17")
    val outC = fs(c).create(
      new Path(c, PartitionedCommit.CompactionManifestFile), true)
    outC.write(twoGroups.getBytes("UTF-8"))
    outC.close()
    park(c, Seq(-4, -3, -2, -1, 16, 17))
    org.apache.hadoop.fs.FileUtil.copy(
      fs(twin), new Path(twin, s"$BucketCol=-1"),
      fs(c), new Path(c, s"$BucketCol=-1"), false, fsConf)
    assert(PartitionedCommit.healInterrupted(spark, c))
    assertRolledBack(c, cBefore)

    // (c2) ONE group, all sources parked, destination landed — that
    // swap is in fact COMPLETE (the destination holds every source's
    // rows); heal must finish it, not roll it back
    val c2 = mk()
    val c2Before = rows(c2)
    writeManifest(c2)
    park(c2, Seq(-4, -3, -2, -1))
    org.apache.hadoop.fs.FileUtil.copy(
      fs(twin), new Path(twin, s"$BucketCol=-1"),
      fs(c2), new Path(c2, s"$BucketCol=-1"), false, fsConf)
    assert(PartitionedCommit.healInterrupted(spark, c2))
    assert(rows(c2) == c2Before)
    assert(dirIds(c2) == Set(-1, 16, 17, 18, 19))
    PartitionedCommit.resolveRange(spark, c2, Span) match {
      case Layout.RangeTiered(_, cs, fr) => assert(cs == 160L && fr == 160L)
      case other => fail(s"expected re-tiered layout, got $other")
    }

    // (d) destination landed, sources parked, crash before cleanup →
    // heal COMPLETES: new census, layout advanced to cs_new
    val d = mk()
    val dBefore = rows(d)
    PartitionedCommit.compactRange(spark, d, Span, 16, keepFine = 2)
    writeManifest(d) // crash was between backup delete and manifest delete
    assert(PartitionedCommit.healInterrupted(spark, d))
    assert(rows(d) == dBefore)
    assert(dirIds(d) == Set(-1, 16, 17, 18, 19))
    PartitionedCommit.resolveRange(spark, d, Span) match {
      case Layout.RangeTiered(_, cs, fr) => assert(cs == 160L && fr == 160L)
      case other => fail(s"expected re-tiered layout, got $other")
    }

    // a later upsert works on every healed table
    Seq(a, b, c, c2, d).foreach { root =>
      CorpusMaintenance.upsertBatch(
        Seq((5L, "healed-v2", "sH")).toDF("doc_id", "text", "source"),
        root, "doc_id", Some(Layout.Range(Span)))
      assert(spark.read.parquet(root).count() == 200L,
        s"$root: update after heal must not duplicate")
      assert(rows(root).contains((5L, "healed-v2", "sH")))
    }
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
