package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Incremental corpus upsert: two micro-batches with an overlapping
  * doc_id must leave exactly the union with the newer batch winning,
  * committed through the verified staging swap (no staging/backup
  * residue).
  */
class CorpusMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("foreachBatch union-dedup upsert: overlap resolves to the newest batch") {
    implicit val sq = spark.sqlContext
    val corpus = tmp("corpus") + "/docs"
    val in = MemoryStream[(Long, String, String)]
    val q = CorpusMaintenance.maintain(
      in.toDF().toDF("doc_id", "text", "source"),
      corpus, tmp("corpus-ckpt"))

    in.addData((1L, "alpha", "s1"), (2L, "beta", "s1"),
      (2L, "beta", "s1")) // in-batch duplicate key
    q.processAllAvailable()
    val after1 = spark.read.parquet(corpus)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after1 == Set((1L, "alpha"), (2L, "beta")))

    in.addData((2L, "beta-v2", "s2"), (3L, "gamma", "s2")) // overlap on 2
    q.processAllAvailable()
    q.stop()

    val after2 = spark.read.parquet(corpus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after2 == Set(
      (1L, "alpha", "s1"), (2L, "beta-v2", "s2"), (3L, "gamma", "s2")))

    // verified-commit hygiene: no staging or backup dirs left behind
    val parent = new java.io.File(corpus).getParentFile.listFiles().map(_.getName)
    assert(parent.toSet == Set("docs"), parent.mkString(","))
  }

  test("upsertBatch is idempotent: replaying the same batch recommits the same corpus") {
    val corpus = tmp("corpus2") + "/docs"
    val batch = Seq((5L, "x", "s"), (6L, "y", "s")).toDF("doc_id", "text", "source")
    val n1 = CorpusMaintenance.upsertBatch(batch, corpus, "doc_id")
    val n2 = CorpusMaintenance.upsertBatch(batch, corpus, "doc_id")
    assert(n1 == 2 && n2 == 2)
    assert(spark.read.parquet(corpus).count() == 2)
  }

  test("range-partitioned upsert: an append batch touches ONLY its own bucket; merge ≡ full rewrite") {
    import org.apache.spark.sql.functions._
    val corpus = tmp("corpus-range") + "/docs"
    val span = 100L
    def doc(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"text $i", "s")).toDF("doc_id", "text", "source")
    // seed: ids 0..999 → buckets 0..9
    CorpusMaintenance.upsertBatchRange(doc(0L, 1000L), corpus, "doc_id", span)
    // per-bucket fingerprint of the STORED layout: every data file's
    // (path, mtime, length) — untouched buckets must keep all three
    def layout(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(corpus)
      root.listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith(graft.operators.PartitionedCommit.BucketCol))
        .map { d =>
          d.getName -> d.listFiles()
            .map(f => (f.getName, f.lastModified(), f.length())).toSet
        }.toMap
    }
    val before = layout()
    assert(before.keySet.size == 10, s"expected 10 seed buckets: ${before.keySet}")
    // append: the NEXT id range (the normal ingest arrival shape)
    CorpusMaintenance.upsertBatchRange(doc(1000L, 1050L), corpus, "doc_id", span)
    val after = layout()
    assert(after.keySet == before.keySet + s"${graft.operators.PartitionedCommit.BucketCol}=10",
      s"append must create exactly bucket 10: ${after.keySet -- before.keySet}")
    before.foreach { case (b, files) =>
      assert(after(b) == files,
        s"append rewrote untouched bucket $b (O(batch) contract broken)")
    }
    // an UPDATE to an old key rewrites exactly that key's bucket
    CorpusMaintenance.upsertBatchRange(
      Seq((50L, "rewritten", "s")).toDF("doc_id", "text", "source"),
      corpus, "doc_id", span)
    val afterUpd = layout()
    afterUpd.keySet.foreach { b =>
      if (b == s"${graft.operators.PartitionedCommit.BucketCol}=0")
        assert(afterUpd(b) != after(b), "bucket 0 must be rewritten by the update")
      else assert(afterUpd(b) == after(b), s"update rewrote unrelated bucket $b")
    }
    // merge semantics ≡ the full-rewrite path over the same deliveries
    val ctl = tmp("corpus-range-ctl") + "/docs"
    CorpusMaintenance.upsertBatch(doc(0L, 1000L), ctl, "doc_id")
    CorpusMaintenance.upsertBatch(doc(1000L, 1050L), ctl, "doc_id")
    CorpusMaintenance.upsertBatch(
      Seq((50L, "rewritten", "s")).toDF("doc_id", "text", "source"),
      ctl, "doc_id")
    val got = spark.read.parquet(corpus)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = spark.read.parquet(ctl)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want, "range-partitioned state != full-rewrite control")
    assert(got.contains((50L, "rewritten", "s")) && got.size == 1050)
  }
}
