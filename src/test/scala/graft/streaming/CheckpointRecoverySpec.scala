package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Exactly-once file sink across a stop/restart: the checkpoint carries
  * source offsets + sink manifest, so records written before the stop
  * are not re-emitted and records arriving while down are picked up.
  */
class CheckpointRecoverySpec extends SparkTestBase {

  test("parquet sink resumes from checkpoint without loss or duplication") {
    val base = Files.createTempDirectory("graft-ckpt").toString
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    import spark.implicits._
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, s"e$i")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(src)

    val schema = Seq((0L, "x")).toDF("id", "tag").schema

    writeBatch(0 until 5)
    val q1 = EventStream.toParquetSink(
      spark.readStream.schema(schema).parquet(src)
        .withColumn("tag", upper(col("tag"))),
      out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 5)

    // new data lands while the query is down
    writeBatch(5 until 12)
    val q2 = EventStream.toParquetSink(
      spark.readStream.schema(schema).parquet(src)
        .withColumn("tag", upper(col("tag"))),
      out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rows == (0L until 12L), s"got $rows") // no loss, no dupes
  }
}
