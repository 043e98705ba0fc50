package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF maintenance: corpus + assignment stay in lockstep
  * across micro-batches, the maintained assignment equals a one-pass
  * rebuild at the same centroids, and a drifting delivery raises the
  * refit flag while a like-distributed one does not.
  */
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
}
