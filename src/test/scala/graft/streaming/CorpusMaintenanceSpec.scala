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
}
