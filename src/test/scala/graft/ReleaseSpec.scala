package graft

import org.apache.spark.sql.functions._

/** The batch release path end-to-end on a crafted corpus: dup clusters
  * collapse to the min-id survivor, the quality gate drops, PII never
  * ships, the manifest verifies, and the accounting reconciles.
  */
class ReleaseSpec extends SparkTestBase {

  private val base = (1 to 14).map(i => s"w$i").mkString(" ")

  /** Corpus: docs 0/1 near-dups (one survivor), doc 2 with PII, doc 3
    * clean singleton — all with healthy quality scores.
    */
  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-release").toString
    val rows = Seq(
      (0L, s"$base alpha", "en", "s"),
      (1L, s"$base betaq", "en", "s"),
      (2L, "contact alice.smith@example.com about the shipment today", "en", "s"),
      (3L, "completely independent document with original content", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def out(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rel-$tag").toString + "/export"

  test("release drops dup losers, scrubs PII, ships a verifiable export") {
    val dest = out("main")
    val r = Release.release(spark, dir, dest, shardCount = 2)
    assert(r.inputDocs == 4 && r.dupDropped == 1 && r.qualityDropped == 0,
      s"$r")
    assert(r.releasedDocs == 3)
    val released = spark.read.parquet(dest)
    // survivor of the 0/1 cluster is the min id
    val ids = released.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L, 3L), s"released $ids")
    // the released text NEVER matches a PII pattern
    val pii = released.filter(
      col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
      .count()
    assert(pii == 0, "raw PII shipped in a release")
    assert(released.filter(col("text").contains("<EMAIL>")).count() == 1,
      "redaction placeholder missing")
    // consumer-side integrity check passes
    graft.sources.ShardWriter.verify(spark, dest)
  }

  test("the quality gate drops below-threshold docs and the accounting shows it") {
    val dest = out("gate")
    // gate ABOVE every fixture score -> everything surviving dedup is
    // quality-dropped, nothing ships
    val r = Release.release(spark, dir, dest, shardCount = 2, minQuality = 2.0)
    assert(r.releasedDocs == 0 && r.qualityDropped == 3 && r.dupDropped == 1,
      s"$r")
  }

  test("a zero-token doc (NaN quality score) never passes the gate") {
    // 0 letters / 0 tokens = NaN, and Spark SQL orders NaN above every
    // double — without the gate's isnan guard this doc passes ANY
    // quality floor, including the default 0.0, and ships empty text
    val tmp = java.nio.file.Files.createTempDirectory("graft-rel-nan").toString
    val rows = Seq(
      (0L, "a perfectly ordinary document with reasonable words", "en", "s"),
      (1L, "   ", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dest = out("nan")
    val r = Release.release(spark, tmp, dest, shardCount = 2, minQuality = 0.0)
    assert(r.releasedDocs == 1 && r.qualityDropped == 1, s"$r")
    val ids = spark.read.parquet(dest)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L), s"released $ids")
  }

  test("bestQualitySurvivors ships the cleanest cluster member, not the first") {
    // docs 20/21 are near-dups (shared base dominates the shingles);
    // 21 carries long high-quality tokens, 20 short noisy ones — so
    // min-id keeps 20 but the quality rule must keep 21, the LARGER id
    val tmp = java.nio.file.Files.createTempDirectory("graft-rel-best").toString
    val rows = Seq(
      (20L, s"$base aa bb", "en", "s"),
      (21L, s"$base magnificent extraordinary", "en", "s"),
      (22L, "an unrelated standalone document with content", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dMin = out("bq-min"); val dBest = out("bq-best")
    val rMin = Release.release(spark, tmp, dMin, shardCount = 2)
    val ids = (d: String) => spark.read.parquet(d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(dMin) == Set(20L, 22L), s"min-id kept ${ids(dMin)}")
    val rBest = Release.release(spark, tmp, dBest, shardCount = 2,
      bestQualitySurvivors = true)
    assert(ids(dBest) == Set(21L, 22L), s"best-quality kept ${ids(dBest)}")
    assert(rMin.dupDropped == 1 && rBest.dupDropped == 1)
  }

  test("release is deterministic: re-running ships identical manifests") {
    val d1 = out("det1"); val d2 = out("det2")
    val m1 = Release.release(spark, dir, d1, shardCount = 4).shards
    val m2 = Release.release(spark, dir, d2, shardCount = 4).shards
    assert(m1 == m2)
  }

  test("fromStanding releases the pipeline's maintained state without re-mining") {
    val root = java.nio.file.Files.createTempDirectory("graft-rel-standing")
      .toString
    val corpus = root + "/corpus"; val shingles = root + "/shingles"
    val cands = root + "/cands"; val dest = root + "/export"
    val b = (1 to 14).map(i => s"v$i").mkString(" ")
    def docs(rows: (Long, String)*) = {
      import spark.implicits._
      rows.toSeq.toDF("doc_id", "text")
    }
    // two deliveries: near-dup pair split across batches + PII doc
    graft.streaming.DocumentPipeline.upsertBatch(
      docs((10L, s"$b alpha"),
        (11L, "mail carol@example.net about completely other things today")),
      corpus, shingles, cands)
    graft.streaming.DocumentPipeline.upsertBatch(
      docs((12L, s"$b betaq"),
        (13L, "fresh standalone content nine ten eleven twelve")),
      corpus, shingles, cands)
    val r = Release.fromStanding(spark, corpus, cands, dest, shardCount = 2)
    // 10/12 are a cluster -> one survivor (min id 10)
    assert(r.inputDocs == 4 && r.dupDropped == 1 && r.releasedDocs == 3, s"$r")
    val released = spark.read.parquet(dest)
    val ids = released.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L, 11L, 13L), s"released $ids")
    // the stored corpus was scrubbed at ingest; the release ships it as-is
    assert(released.filter(col("text").contains("<EMAIL>")).count() == 1)
    assert(released.filter(col("text").contains("carol@")).count() == 0)
    graft.sources.ShardWriter.verify(spark, dest)
    // a threshold below the stored floor must refuse loudly
    intercept[IllegalArgumentException] {
      Release.fromStanding(spark, corpus, cands, root + "/x", 2,
        jaccardThreshold = 0.1)
    }
  }

  test("fromStanding on the partitioned layout: bucket heal runs, bucket col never ships") {
    val root = java.nio.file.Files.createTempDirectory("graft-rel-part")
      .toString
    val corpus = root + "/corpus"; val shingles = root + "/shingles"
    val cands = root + "/cands"; val dest = root + "/export"
    val b = (1 to 14).map(i => s"y$i").mkString(" ")
    def docs(rows: (Long, String)*) = {
      import spark.implicits._
      rows.toSeq.toDF("doc_id", "text")
    }
    graft.streaming.DocumentPipeline.upsertBatch(
      docs((20L, s"$b alpha"), (21L, s"$b betaq"),
        (22L, "independent content thirteen fourteen fifteen sixteen")),
      corpus, shingles, cands, layout = Some(graft.operators.PartitionedCommit.Layout.Hash(4)))
    // simulate a crash that parked one corpus bucket mid-swap
    val dirs = new java.io.File(corpus).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
    assert(dirs.nonEmpty, "expected a partitioned corpus layout")
    val victim = dirs.head
    val backup = new java.io.File(corpus + ".__old__")
    backup.mkdirs()
    assert(victim.renameTo(new java.io.File(backup, victim.getName)))
    val r = Release.fromStanding(spark, corpus, cands, dest, shardCount = 2)
    // healed: every ingested doc is accounted for, one dup dropped
    assert(r.inputDocs == 3 && r.dupDropped == 1 && r.releasedDocs == 2, s"$r")
    val released = spark.read.parquet(dest)
    assert(!released.columns.contains(
      graft.operators.PartitionedCommit.BucketCol),
      "internal bucket column leaked into a release")
    assert(released.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(20L, 22L))
    graft.sources.ShardWriter.verify(spark, dest)
  }

  test("equalizeSources ships a balanced mixture with reconciling accounting") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rel-mix").toString
    // srcBig has ~8x the token mass of srcSmall
    val rows = (0L until 80L).map(i =>
      (i, s"big source filler document number $i with several more tokens",
        "en", "srcBig")) ++
      (100L until 110L).map(i =>
        (i, s"small source doc $i tokens here", "en", "srcSmall"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dest = out("mix")
    val r = Release.release(spark, tmp, dest, shardCount = 2,
      equalizeSources = true)
    assert(r.mixDropped > 0, s"the dominant source must be downsampled: $r")
    assert(r.inputDocs ==
      r.dupDropped + r.qualityDropped + r.mixDropped + r.releasedDocs)
    val released = spark.read.parquet(dest)
    val masses = released
      .select(col("source"),
        size(filter(split(col("text"), " "), tk => length(tk) > 0))
          .cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("mass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // all 10 small docs survive; the big source's mass lands near the
    // small one's (integer-thousandth rate -> within ~30%)
    assert(masses("srcSmall") > 0)
    val ratio = masses("srcBig").toDouble / masses("srcSmall").toDouble
    assert(ratio < 1.5, s"mixture not equalized: $masses")
  }

  test("a >1000x source is downsampled to the floor rate, never silently dropped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rel-floor").toString
    // giant: ~1500x the small source's token mass -> raw rate_k = 0
    val giant = (0L until 1500L).map(i =>
      (i, s"giant source doc $i alpha beta gamma delta epsilon zeta",
        "en", "giant"))
    val small = Seq((9000L, "tiny source six tokens right here", "en", "tiny"))
    spark.createDataFrame(giant ++ small)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dest = out("floor")
    val r = Release.release(spark, tmp, dest, shardCount = 2,
      equalizeSources = true)
    val srcs = spark.read.parquet(dest)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(srcs.contains("giant"),
      s"floor rate must keep the giant source in the mixture: $r")
    assert(srcs.contains("tiny"))
  }

  test("release matches the declared queries: survivors = q36 is_dup=0 ∩ quality gate") {
    val dest = out("contract")
    Release.release(spark, dir, dest, shardCount = 2, minQuality = 0.5)
    val released = spark.read.parquet(dest)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = SparkEntry.queries("q36_dedup_clusters")(spark, dir)
      .filter(col("is_dup") === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val gated = SparkEntry.queries("q31_quality_score")(spark, dir)
      .filter(col("score") >= 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(released == survivors.intersect(gated),
      s"$released vs ${survivors.intersect(gated)}")
  }

  test("jsonl release ships the same corpus as parquet, loader-readable") {
    val dp = out("fmt-p"); val dj = out("fmt-j")
    val rp = Release.release(spark, dir, dp, shardCount = 2)
    val rj = Release.release(spark, dir, dj, shardCount = 2, jsonl = true)
    // identical accounting AND identical per-shard content digests —
    // the format changes the bytes, never the corpus
    assert(rp.copy(shards = Seq.empty) == rj.copy(shards = Seq.empty))
    assert(rp.shards == rj.shards, s"${rp.shards} vs ${rj.shards}")
    graft.sources.ShardWriter.verifyJsonl(spark, dj)
    val back = graft.sources.ShardWriter.readJsonl(spark, dj)
    val pq = spark.read.parquet(dp)
    assert(back.drop("shard").exceptAll(pq.drop("shard")).isEmpty)
    assert(pq.drop("shard").exceptAll(back.drop("shard")).isEmpty)
  }
}
