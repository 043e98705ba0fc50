package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The release shard writer: deterministic assignment, one file per
  * shard, manifest ↔ data reconciliation, corruption detection, and
  * the crash-backup swap contract.
  */
class ShardWriterSpec extends SparkTestBase {

  private def docs = Tables(spark, sf(), "documents")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-shard-$tag").toString +
      "/export"

  test("export is deterministic: same corpus, any layout -> same manifest") {
    val d1 = tmp("det1"); val d2 = tmp("det2")
    val m1 = ShardWriter.write(spark, docs, d1, 8, "doc_id")
    // different upstream partitioning + row order must not matter
    val m2 = ShardWriter.write(spark,
      docs.repartition(13).orderBy(col("text")), d2, 8, "doc_id")
    assert(m1 == m2, s"$m1 vs $m2")
    assert(m1.map(_.rows).sum == docs.count())
  }

  test("every shard dir holds exactly one data file; shards are balanced") {
    val d = tmp("files")
    val k = 8
    val m = ShardWriter.write(spark, docs, d, k, "doc_id")
    val root = new java.io.File(d)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == m.length)
    shardDirs.foreach { sd =>
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${sd.getName}: ${parts.length} files")
    }
    // xxhash64 spreads uniform keys: with n/k ≈ 6+ expected per shard
    // nothing should be empty or grossly skewed on the fixture
    val rows = m.map(_.rows)
    assert(rows.forall(_ > 0), s"empty shard in $m")
    assert(rows.max <= rows.min * 4, s"skewed export $m")
  }

  test("shard assignment is the documented pure function of the key") {
    val d = tmp("assign")
    val k = 4
    ShardWriter.write(spark, docs, d, k, "doc_id")
    val back = spark.read.parquet(d)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = docs.select(col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(k)).cast("int").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(back == expect)
  }

  test("verify passes on an intact export and names a corrupted shard") {
    val d = tmp("verify")
    ShardWriter.write(spark, docs, d, 4, "doc_id")
    ShardWriter.verify(spark, d) // intact: no throw
    // corrupt: drop shard 2's data file, keep the dir so the shard
    // reads back empty rather than vanishing
    val dir = new java.io.File(d, "shard=2")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val e = intercept[ShardWriter.ShardVerificationFailed] {
      ShardWriter.verify(spark, d)
    }
    assert(e.getMessage.contains("shard 2"), e.getMessage)
  }

  test("round trip preserves the corpus exactly (multiset equality)") {
    val d = tmp("round")
    ShardWriter.write(spark, docs, d, 8, "doc_id")
    val back = spark.read.parquet(d).drop("shard")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("a zero-row export commits an empty manifest and verifies") {
    val d = tmp("empty")
    val m = ShardWriter.write(spark, docs.filter(col("doc_id") < 0), d, 4,
      "doc_id")
    assert(m.isEmpty)
    assert(ShardWriter.readManifest(spark, d).isEmpty)
    ShardWriter.verify(spark, d) // no throw
  }

  test("writeSorted ships globally-ordered range shards, no single-partition sort") {
    val d = tmp("sorted")
    val k = 4
    val df = docs.repartition(7) // scrambled input layout
    val plan = df.repartitionByRange(k, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"),
      "global sort must not funnel through one partition")
    val m = ShardWriter.writeSorted(spark, df, d, k, "doc_id")
    assert(m.map(_.rows).sum == docs.count())
    // global order: shard i's max key < shard i+1's min key
    val ranges = m.map { s =>
      val keys = spark.read.parquet(s"$d/shard=${s.shard}")
        .select("doc_id").collect().map(_.getLong(0))
      (s.shard, keys.min, keys.max, keys.toSeq)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, _, maxA, _), (_, minB, _, _)) =>
        assert(maxA < minB, s"shards overlap: $maxA !< $minB")
      case _ =>
    }
    // within-shard order: parquet preserves row order per file
    ranges.foreach { case (sh, _, _, keys) =>
      assert(keys == keys.sorted, s"shard $sh not internally sorted")
    }
    // content round-trip
    val back = spark.read.parquet(d).drop("shard")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    ShardWriter.verify(spark, d)
  }

  test("a parked prior export is healed before re-export can destroy it") {
    val d = tmp("heal")
    val m1 = ShardWriter.write(spark, docs.limit(100), d, 4, "doc_id")
    // simulate the crash window of a PRIOR export: it renamed dest to
    // the backup and died before committing its staging — the parked
    // backup is now the ONLY committed copy
    assert(new java.io.File(d).renameTo(new java.io.File(d + ".__old__")))
    // a re-export whose computation FAILS must not have deleted that
    // backup first: the heal at the top of write() restores it to
    // dest, so the failed attempt leaves the old export committed
    intercept[Exception] {
      ShardWriter.write(spark,
        docs.limit(100).withColumn("text",
          when(lit(true), raise_error(lit("boom"))).otherwise(col("text"))),
        d, 4, "doc_id")
    }
    assert(ShardWriter.readManifest(spark, d) == m1,
      "the parked prior export must survive a failed re-export")
    ShardWriter.verify(spark, d)
  }

  test("re-export swaps atomically and leaves no backup debris") {
    val d = tmp("swap")
    ShardWriter.write(spark, docs.limit(100), d, 4, "doc_id")
    val m2 = ShardWriter.write(spark, docs, d, 4, "doc_id")
    assert(ShardWriter.readManifest(spark, d) == m2)
    assert(!new java.io.File(d + ".__old__").exists())
    assert(!new java.io.File(d + ".__staging__").exists())
    ShardWriter.verify(spark, d)
  }

  test("jsonl export round-trips through its committed schema") {
    import spark.implicits._
    val d = tmp("jsonl")
    // exercise the types JSON handles worst: binary (base64), double,
    // nullable string — schema-true readback must round-trip all
    val df = Seq(
      (1L, "alpha doc", 0.25, Option("en"), Array[Byte](1, 2, 3)),
      (2L, "beta \"quoted\"\nnewline", -1.5, None, Array[Byte]()),
      (3L, "gamma", 3.14159, Option("de"), Array[Byte](-1, 0, 127)))
      .toDF("doc_id", "text", "score", "lang", "payload")
    val m = ShardWriter.writeJsonl(spark, df, d, 4, "doc_id")
    assert(m.map(_.rows).sum == 3)
    // per-shard single gz json file
    new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("shard=")).foreach { sd =>
        val parts = sd.listFiles().filter(_.getName.endsWith(".json.gz"))
        assert(parts.length == 1, s"${sd.getName}")
      }
    val back = ShardWriter.readJsonl(spark, d)
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType, "schema sidecar, not inference")
    val b = back.drop("shard")
    assert(b.exceptAll(df).isEmpty && df.exceptAll(b).isEmpty)
    ShardWriter.verifyJsonl(spark, d) // intact: no throw
  }

  test("jsonl manifest equals the parquet manifest for the same corpus") {
    // same rows => same shard assignment and same order-independent
    // content digests: the manifest certifies CONTENT, not format
    val dp = tmp("fmtp"); val dj = tmp("fmtj")
    val base = docs.select(col("doc_id"), col("text"), col("source"))
    val mp = ShardWriter.write(spark, base, dp, 8, "doc_id")
    val mj = ShardWriter.writeJsonl(spark, base, dj, 8, "doc_id")
    assert(mp == mj, s"$mp vs $mj")
  }

  test("writeShuffled ships a reproducible pseudo-random global order") {
    val d1 = tmp("shuf1"); val d2 = tmp("shuf2")
    val m1 = ShardWriter.writeShuffled(spark, docs, d1, 4, "doc_id")
    // a different input layout must produce the same permutation
    ShardWriter.writeShuffled(spark,
      docs.repartition(7).orderBy(col("text")), d2, 4, "doc_id")
    def order(d: String): Seq[Long] =
      spark.read.parquet(d)
        .orderBy(col("shard"), col("shuffle_ord"), col("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val o1 = order(d1)
    assert(o1 == order(d2), "permutation must be layout-independent")
    assert(m1.map(_.rows).sum == docs.count())
    // it is a permutation of the corpus, and NOT id order (shuffled)
    assert(o1.sorted == o1.sorted.distinct.sorted && o1 != o1.sorted)
    // shards slice the permutation contiguously: max ord of shard i
    // <= min ord of shard i+1
    val bounds = spark.read.parquet(d1)
      .groupBy(col("shard"))
      .agg(min(col("shuffle_ord")).as("lo"), max(col("shuffle_ord")).as("hi"))
      .orderBy(col("shard"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, s"$bounds")
      case _ =>
    }
    ShardWriter.verify(spark, d1)
  }

  test("jsonl verify names a corrupted shard; zero-row export verifies") {
    val d = tmp("jsonlverify")
    ShardWriter.writeJsonl(spark, docs.select("doc_id", "text"), d, 4,
      "doc_id")
    new java.io.File(d, "shard=1").listFiles()
      .filter(_.getName.endsWith(".json.gz")).foreach(_.delete())
    val e = intercept[ShardWriter.ShardVerificationFailed] {
      ShardWriter.verifyJsonl(spark, d)
    }
    assert(e.getMessage.contains("shard 1"), e.getMessage)
    val empty = tmp("jsonlempty")
    assert(ShardWriter.writeJsonl(spark,
      docs.filter(col("doc_id") < 0).select("doc_id", "text"),
      empty, 4, "doc_id").isEmpty)
    ShardWriter.verifyJsonl(spark, empty) // no throw
  }
}
