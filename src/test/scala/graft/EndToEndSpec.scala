package graft

import graft.operators.{CommitSink, Pipeline}
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The reference's complete user journey, Spark-native, in one test:
  * discover a corpus (A1), dedup it (A4/A5), run the ordered stage
  * pipeline with per-record isolation (A12/A14), commit with read-back
  * verification (A14 `:347-361`), and read off run metrics + the
  * severity-tagged status stream (A18/A19/D5).
  */
class EndToEndSpec extends SparkTestBase {
  import spark.implicits._

  test("scan -> dedup -> ordered pipeline -> verified commit -> metrics") {
    // corpus on disk: 4 distinct drawings, one duplicated name in a
    // subdir, one non-matching suffix
    val root = Files.createTempDirectory("graft-e2e")
    Files.createDirectories(Paths.get(root.toString, "sub"))
    Seq("a.dwg", "b.dwg", "c.dwg", "bad.dwg").foreach(f =>
      Files.writeString(Paths.get(root.toString, f), f))
    Files.writeString(Paths.get(root.toString, "sub", "ignore.txt"), "x")

    // A1 discovery + A4 dedup (by basename, the ref's corpus key)
    val corpus = Tables.scanFiles(spark, root.toString, ".dwg")
      .withColumn("name", element_at(split(col("path"), "/"), -1))
      .dropDuplicates("name")
      .select("name").as[String]
    assert(corpus.count() == 4)

    // A12/A14: ordered stages; "bad.dwg" fails in stage 2 and must be
    // isolated, not abort the run
    val stages = Seq(
      Pipeline.Stage[String]("epurge", 0, enabled = true, r => s"$r:purged"),
      Pipeline.Stage[String]("ebind", 1, enabled = true, r =>
        if (r.startsWith("bad")) sys.error("Open.Close failed") else s"$r:bound"),
      Pipeline.Stage[String]("skipped", 2, enabled = false, r => sys.error("off")))
    val run = Pipeline.run(spark, corpus, stages)
    val m = run.metrics
    assert(m.total == 4 && m.succeeded == 3 && m.failed == 1)
    assert(math.abs(m.successRatio - 0.75) < 1e-9)

    // A13: the failure is classified from its message
    val failedRows = run.results.filter(!col("ok"))
      .select("errorClass", "failedStage").collect()
    assert(failedRows.length == 1)
    assert(failedRows.head.getString(0) == Pipeline.classifyError("Open.Close failed"))
    assert(failedRows.head.getString(1) == "ebind")

    // A14 commit: survivors to a verified parquet sink
    val dest = root.toString + "/committed"
    val survivors = run.results.filter(col("ok")).select("value")
    val committed = CommitSink.writeVerified(spark, survivors, dest)
    assert(committed == 3)
    val back = spark.read.parquet(dest).as[String].collect().toSet
    assert(back == Set("a.dwg:purged:bound", "b.dwg:purged:bound",
      "c.dwg:purged:bound"))

    // A18: severity-tagged status stream carries the red event
    val events = run.statusEvents(spark).collect()
    assert(events.count(_.severity == "red") == 1)
    assert(events.count(_.severity == "green") == 3)
  }

  test("training-corpus lifecycle: ingest -> near-dup pairs -> cluster survivors") {
    import graft.streaming.CorpusMaintenance
    // ingest two document deliveries (overlapping id 2, near-dup text
    // family 10/11) into a maintained corpus
    val root = Files.createTempDirectory("graft-corpus").toString
    val corpusPath = root + "/docs"
    val common = (1 to 12).map(i => s"tok$i").mkString(" ")
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s1"),
      (2L, "old text", "s1"),
      (10L, s"$common extra1", "s1"))
      .toDF("doc_id", "text", "source")
    val b2 = Seq(
      (2L, "new text entirely", "s2"),
      (11L, s"$common extra2", "s2"))
      .toDF("doc_id", "text", "source")
    CorpusMaintenance.upsertBatch(b1, corpusPath, "doc_id")
    val n = CorpusMaintenance.upsertBatch(b2, corpusPath, "doc_id")
    assert(n == 4) // 1, 2 (replaced), 10, 11

    // near-dup mining over the maintained corpus: 10/11 share all but
    // one shingle (jaccard well above 0.5), nothing else pairs
    val corpus = spark.read.parquet(corpusPath)
    val sh = corpus
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"),
        graft.queries.DedupQueries.shingleHashes(col("tk")).as("s"))
      .filter(size(col("s")) > 0)
    val pairs = graft.queries.DedupQueries.pairsFromShingles(sh, hotDf = 4)
      .select("doc_a", "doc_b")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L)))

    // survivors: min-id per cluster + singletons
    val labels = graft.operators.DedupClusters.assign(pairs, "doc_a", "doc_b")
    val survivors = corpus.select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
    assert(survivors.count() == 3) // 1, 2, 10 (11 deduped away)
  }

  test("durable index lifecycle: ingest builds, cold session reuses, rewrite retires") {
    import graft.sources.IndexStore
    import graft.streaming.CorpusMaintenance
    // corpus dir and store root must be SEPARATE trees: the corpus
    // stamp fingerprints the corpus dir, so a store nested inside it
    // would invalidate itself on every index write
    val corpusDir = Files.createTempDirectory("graft-e2e-corpus").toString
    val storeRoot = Files.createTempDirectory("graft-e2e-store").toString
    val docsPath = corpusDir + "/documents.parquet"
    val common = (1 to 12).map(i => s"tok$i").mkString(" ")
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s1"),
      (10L, s"$common extra1", "s1"),
      (11L, s"$common extra2", "s1"))
      .toDF("doc_id", "text", "source")
    CorpusMaintenance.upsertBatch(b1, docsPath, "doc_id")

    // ingest-side session builds the near-dup pair index durably
    val s1 = spark.newSession()
    s1.conf.set(IndexStore.RootConf, storeRoot)
    def pairSet(s: org.apache.spark.sql.SparkSession) =
      SparkEntry.queries("q25_dedup_ngram_jaccard")(s, corpusDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(s1) == Set((10L, 11L)))
    val pairsParent = new org.apache.hadoop.fs.Path(
      s"$storeRoot/l${IndexStore.LayoutVersion}/" +
        s"${IndexStore.corpusId(corpusDir)}/exact_pairs")
    val fs = pairsParent.getFileSystem(s1.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(pairsParent).length == 1, "one stored pair-index version")

    // a cold session (fresh caches) reads the stored index, same result
    val s2 = spark.newSession()
    s2.conf.set(IndexStore.RootConf, storeRoot)
    assert(pairSet(s2) == Set((10L, 11L)))

    // second delivery rewrites the corpus: the stamp changes, the warm
    // session rebuilds, and the stale version is retired from the store
    val b2 = Seq((12L, s"$common extra3", "s2")).toDF("doc_id", "text", "source")
    CorpusMaintenance.upsertBatch(b2, docsPath, "doc_id")
    assert(pairSet(s1) == Set((10L, 11L), (10L, 12L), (11L, 12L)))
    assert(fs.listStatus(pairsParent).length == 1,
      "corpus rewrite must retire the stale stored version")

    graft.queries.DedupQueries.clearCaches(s1)
    graft.queries.DedupQueries.clearCaches(s2)
  }

  test("grand tour: partitioned ingest with all artifacts -> equalized standing release") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-tour").toString
    val corpus = root + "/corpus"; val shingles = root + "/shingles"
    val cands = root + "/cands"; val sigs = root + "/sigs"
    val lm = root + "/lm"; val dest = root + "/export"
    val b = (1 to 14).map(i => s"g$i").mkString(" ")
    def deliver(rows: (Long, String, String)*) =
      graft.streaming.DocumentPipeline.upsertBatch(
        rows.toSeq.toDF("doc_id", "text", "source"),
        corpus, shingles, cands, layout = Some(graft.operators.PartitionedCommit.Layout.Hash(4)),
        signaturesPath = Some(sigs), lmPath = Some(lm))
    // delivery 1: a near-dup pair split by source + a PII doc
    val r1 = deliver(
      (1L, s"$b alpha", "big"),
      (2L, "mail dana@example.com plus other words to say today", "big"),
      (3L, "the small source document five six seven", "small"))
    assert(r1.corpusRows == 3 && r1.lmRows > 0 && r1.signatureRows == 3)
    // delivery 2: the pair's other half + big-source filler
    val r2 = deliver(
      (4L, s"$b betaq", "big"),
      (5L, "more big source filler text eight nine ten eleven", "big"))
    assert(r2.newCandidates >= 1, s"cross-delivery near-dup must mine: $r2")
    assert(r2.batchNll.isDefined, "standing LM must score delivery 2")

    // release the maintained state: stored pairs cluster (1,4) -> one
    // survivor, stored text already scrubbed
    val rep = Release.fromStanding(spark, corpus, cands, dest, shardCount = 2)
    assert(rep.inputDocs == 5 && rep.dupDropped == 1, s"$rep")
    val released = spark.read.parquet(dest)
    val ids = released.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 5L), s"released $ids")
    // PII scrubbed AT INGEST ships scrubbed (no second scrub pass)
    assert(released.filter(col("text").contains("dana@")).count() == 0)
    // consumer-side integrity
    graft.sources.ShardWriter.verify(spark, dest)

    // equalized variant: at this toy scale the hash-membership sampler
    // may drop any individual big-source doc, so assert the CONTRACT —
    // reconciling accounting, shipped ⊆ unequalized, small source
    // never downsampled (rate 1000)
    val dest2 = root + "/export-eq"
    val rep2 = Release.fromStanding(spark, corpus, cands, dest2,
      shardCount = 2, equalizeSources = true)
    assert(rep2.inputDocs ==
      rep2.dupDropped + rep2.qualityDropped + rep2.mixDropped +
        rep2.releasedDocs, s"$rep2")
    val eqIds =
      if (rep2.releasedDocs == 0) Set.empty[Long]
      else spark.read.parquet(dest2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(eqIds.subsetOf(ids), s"$eqIds not in $ids")
    assert(eqIds.contains(3L), "the minimum-mass source is never downsampled")
  }
}
