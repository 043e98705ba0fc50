package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF maintenance: corpus + assignment stay in lockstep
  * across micro-batches, the maintained assignment equals a one-pass
  * rebuild at the same centroids, and a drifting delivery raises the
  * refit flag while a like-distributed one does not.
  */
import graft.operators.PartitionedCommit.Layout

class VectorIndexMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  // two well-separated centroids: x-axis and y-axis
  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
  private def xVec(i: Long) = (i, Array(1.0f, 0.01f * i))
  private def yVec(i: Long) = (i, Array(0.01f * i, 1.0f))

  test("corpus and assignment stay in lockstep; maintained == one-pass rebuild") {
    implicit val sq = spark.sqlContext
    val root = tmp("vmaint")
    val corpus = root + "/vectors"
    val assigned = root + "/ivf_assigned"
    val reports = scala.collection.mutable.ListBuffer[VectorIndexMaintenance.BatchReport]()
    val in = MemoryStream[(Long, Array[Float])]
    val q = VectorIndexMaintenance.maintain(
      in.toDF().toDF("vec_id", "embedding"), corpus, assigned, cents,
      tmp("vmaint-ckpt"), onBatch = r => reports.synchronized { reports += r })

    // balanced first delivery, then an update (id 2 re-delivered) plus
    // a new pair — balanced again
    in.addData(xVec(1), yVec(2))
    q.processAllAvailable()
    in.addData(yVec(2), xVec(3), yVec(4))
    q.processAllAvailable()
    q.stop()

    val storedCorpus = spark.read.parquet(corpus)
    val storedAssigned = spark.read.parquet(assigned)
    assert(storedCorpus.count() == 4 && storedAssigned.count() == 4)
    // the assignment table is NARROW — embeddings live in the corpus
    assert(storedAssigned.schema.fieldNames.toSeq == Seq("vec_id", "cids"))
    // the maintained assignment is exactly the one-pass rebuild of the
    // maintained corpus at the same centroids
    val rebuild = graft.operators.IncrementalVectors
      .assignDelta(storedCorpus, cents)
      .select(col("vec_id"), col("cids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    val maintained = storedAssigned
      .select(col("vec_id"), col("cids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    assert(maintained == rebuild)
    // balanced deliveries: first batch has nothing to drift from, the
    // second mirrors the standing half-half split
    assert(reports.size == 2)
    assert(reports.head.drift == 0.0 && !reports.head.refitNeeded)
    assert(!reports(1).refitNeeded, s"balanced delivery drifted: ${reports(1)}")
  }

  test("partitioned layout: lockstep upsert, maintained == rebuild, drift measured") {
    val root = tmp("vmaint-part")
    val corpus = root + "/vectors"
    val assigned = root + "/ivf_assigned"
    val nb = Some(Layout.Hash(4))
    val B = graft.operators.PartitionedCommit.BucketCol
    val r1 = VectorIndexMaintenance.upsertBatch(
      Seq(xVec(1), yVec(2), xVec(3), yVec(4)).toDF("vec_id", "embedding"),
      corpus, assigned, cents, layout = nb)
    assert(r1.corpusRows == 4 && r1.drift == 0.0)
    // update (id 2 re-delivered) + insert, balanced against standing
    val r2 = VectorIndexMaintenance.upsertBatch(
      Seq(yVec(2), xVec(5)).toDF("vec_id", "embedding"),
      corpus, assigned, cents, layout = nb)
    assert(r2.corpusRows == 5 && !r2.refitNeeded, s"$r2")
    val storedCorpus = spark.read.parquet(corpus).drop(B)
    val rebuild = graft.operators.IncrementalVectors
      .assignDelta(storedCorpus, cents)
      .select(col("vec_id"), col("cids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    val maintained = spark.read.parquet(assigned)
      .select(col("vec_id"), col("cids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    assert(maintained == rebuild)
  }

  test("a delivery piling into one list raises the refit flag without blocking the upsert") {
    val root = tmp("vmaint2")
    val corpus = root + "/vectors"
    val assigned = root + "/ivf_assigned"
    val balanced = Seq(xVec(1), yVec(2), xVec(3), yVec(4))
      .toDF("vec_id", "embedding")
    val r1 = VectorIndexMaintenance.upsertBatch(balanced, corpus, assigned, cents)
    assert(!r1.refitNeeded && r1.corpusRows == 4)
    // every vector of the next delivery lands in list 0
    val skewed = Seq(xVec(10), xVec(11), xVec(12), xVec(13))
      .toDF("vec_id", "embedding")
    val r2 = VectorIndexMaintenance.upsertBatch(skewed, corpus, assigned, cents)
    assert(r2.refitNeeded && r2.drift > 0.25,
      s"single-list delivery must flag a refit: $r2")
    // the flag reports; it does not block — the index stays maintained
    assert(spark.read.parquet(assigned).count() == 8)
  }

  test("null embeddings and in-batch duplicates never poison the index or the report") {
    val root = tmp("vmaint3")
    val corpus = root + "/vectors"
    val assigned = root + "/ivf_assigned"
    // first delivery: only unindexable rows → empty tables, no crash
    val junk = Seq(
      (Some(1L), None: Option[Array[Float]]),
      (None: Option[Long], Some(Array(1.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val r0 = VectorIndexMaintenance.upsertBatch(junk, corpus, assigned, cents)
    assert(r0.corpusRows == 0 && r0.assignedRows == 0 && !r0.refitNeeded)
    // a balanced delivery against the EMPTY standing table must not
    // drift (the empty side carries no evidence)
    val balanced = Seq(xVec(1), yVec(2)).toDF("vec_id", "embedding")
    val r1 = VectorIndexMaintenance.upsertBatch(balanced, corpus, assigned, cents)
    assert(r1.drift == 0.0 && !r1.refitNeeded)
    // 50 at-least-once copies of one x-vector + one y-vector: the
    // DEDUPED delivery is one per list — balanced — and must not flag
    val dupes = (Seq.fill(50)(xVec(10)) :+ yVec(11)).toDF("vec_id", "embedding")
    val r2 = VectorIndexMaintenance.upsertBatch(dupes, corpus, assigned, cents)
    assert(!r2.refitNeeded,
      s"drift must describe the deduped delivery, got $r2")
    // nothing null ever reached storage; every later drift pass works
    assert(spark.read.parquet(assigned).filter(col("cids").isNull).count() == 0)
    assert(spark.read.parquet(corpus).count() == 4)
  }

  test("a crash between commit renames recovers from the backup, never self-replaces") {
    val root = tmp("vmaint4")
    val corpus = root + "/vectors"
    val assigned = root + "/ivf_assigned"
    val b1 = Seq(xVec(1), yVec(2), xVec(3)).toDF("vec_id", "embedding")
    VectorIndexMaintenance.upsertBatch(b1, corpus, assigned, cents)
    // simulate dying between CommitSink's two renames: dest absent,
    // standing state parked at .__old__
    val fs = new org.apache.hadoop.fs.Path(assigned)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(assigned),
      new org.apache.hadoop.fs.Path(assigned + ".__old__")))
    // the replayed/next batch must merge into the RECOVERED table, not
    // replace the index with itself
    val b2 = Seq(yVec(4)).toDF("vec_id", "embedding")
    VectorIndexMaintenance.upsertBatch(b2, corpus, assigned, cents)
    val ids = spark.read.parquet(assigned)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L),
      s"standing assignment must survive the interrupted commit, got $ids")
  }

  // ── PQ face: 16-dim vectors so the first two 8-dim subspaces carry
  // real signal (family A peaks in subspace 0, family B in subspace 1)
  private def aVec(i: Long) = (i, Array.tabulate(16)(d =>
    if (d == 0) 1.0f else if (d == 8) 0.01f * i else 0.0f))
  private def bVec(i: Long) = (i, Array.tabulate(16)(d =>
    if (d == 8) 1.0f else if (d == 0) 0.01f * i else 0.0f))

  // trained on vectors FROM the two test families (same small-i
  // perturbations) with k=2 codewords per subspace, so each subspace
  // learns exactly the two family regions — the IVF tests' two-
  // centroid setup translated to PQ. Training on far-away vectors
  // would collapse every test row onto one codeword and mask all
  // drift; k=|samples| would make every sample its own codeword and
  // read family-internal variation as drift.
  private lazy val pqBooks = graft.operators.IncrementalPq.fitBooks(
    ((1L to 8L).map(aVec) ++ (11L to 18L).map(i => (i, bVec(i - 10)._2)))
      .toDF("vec_id", "embedding"),
    "embedding", "vec_id", k = 2)

  test("PQ face: corpus and codes stay in lockstep; maintained == one-pass re-encode") {
    implicit val sq = spark.sqlContext
    val root = tmp("pqmaint")
    val corpus = root + "/vectors"
    val codes = root + "/pq_codes"
    val reports =
      scala.collection.mutable.ListBuffer[VectorIndexMaintenance.PqBatchReport]()
    val in = MemoryStream[(Long, Array[Float])]
    val q = VectorIndexMaintenance.maintainPq(
      in.toDF().toDF("vec_id", "embedding"), corpus, codes, pqBooks,
      tmp("pqmaint-ckpt"), onBatch = r => reports.synchronized { reports += r })
    in.addData(aVec(1), bVec(2))
    q.processAllAvailable()
    in.addData(bVec(2), aVec(3), bVec(4))
    q.processAllAvailable()
    q.stop()
    val storedCorpus = spark.read.parquet(corpus)
    val storedCodes = spark.read.parquet(codes)
    assert(storedCorpus.count() == 4 && storedCodes.count() == 4)
    // the codes table is NARROW — embeddings live in the corpus
    assert(storedCodes.schema.fieldNames.toSeq ==
      "vec_id" +: (0 until graft.operators.IncrementalPq.M).map(m => s"c$m"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0),
        (1 to graft.operators.IncrementalPq.M).map(r.getInt).toList)).toSet
    val rebuild = rows(
      graft.operators.IncrementalPq.encode(storedCorpus, pqBooks))
    assert(rows(storedCodes) == rebuild,
      "maintained codes must equal the one-pass re-encode of the corpus")
    assert(reports.size == 2)
    assert(reports.head.drift == 0.0 && !reports.head.refitNeeded)
    assert(!reports(1).refitNeeded, s"balanced delivery drifted: ${reports(1)}")
  }

  test("PQ face: a delivery collapsed onto one code region raises the refit flag") {
    val root = tmp("pqmaint2")
    val corpus = root + "/vectors"
    val codes = root + "/pq_codes"
    val r1 = VectorIndexMaintenance.upsertBatchPq(
      (Seq(aVec(1), bVec(2), aVec(3), bVec(4))).toDF("vec_id", "embedding"),
      corpus, codes, pqBooks)
    assert(r1.corpusRows == 4 && r1.codeRows == 4 && r1.drift == 0.0)
    // every delta row is the SAME vector → one code per subspace vs
    // the standing half-half mix
    val one = aVec(1)._2
    val r2 = VectorIndexMaintenance.upsertBatchPq(
      (10L to 25L).map(i => (i, one)).toDF("vec_id", "embedding"),
      corpus, codes, pqBooks)
    assert(r2.refitNeeded, s"a collapsed delivery must flag a refit: $r2")
  }
}
