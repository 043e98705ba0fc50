package graft.streaming

import graft.SparkTestBase
import graft.operators.QualityRules.{GateFailed, Rule}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming quality monitor: per-delivery audits match the batch
  * engine exactly, empty deliveries report zeros instead of crashing,
  * and the gate composition fails a bad batch loudly.
  */
class QualityMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    Rule("v_positive", col("v") > 0),
    Rule("v_small", col("v") <= 10))

  test("per-delivery audits carry exact per-rule counts; empty batch is zeros") {
    implicit val sq = spark.sqlContext
    val reports =
      scala.collection.mutable.ListBuffer[QualityMonitor.BatchAudit]()
    val in = MemoryStream[(Long, Int)]
    val q = QualityMonitor.monitor(
      in.toDF().toDF("id", "v"), rules,
      java.nio.file.Files.createTempDirectory("qmon-ckpt").toString,
      r => reports.synchronized { reports += r })
    in.addData((1L, 5), (2L, -1), (3L, 99))
    q.processAllAvailable()
    in.addData((4L, 1))
    q.processAllAvailable()
    q.stop()
    assert(reports.size == 2)
    val r1 = reports.head
    assert(r1.nRows == 3 && r1.badByRule == Map(
      "v_positive" -> 1L, "v_small" -> 1L))
    assert(r1.badFrac("v_positive") == 1.0 / 3)
    val r2 = reports(1)
    assert(r2.nRows == 1 &&
      r2.badByRule.values.forall(_ == 0L))
  }

  test("an empty frame audits to zeros (the empty-delivery case)") {
    val a = QualityMonitor.auditBatch(
      Seq.empty[(Long, Int)].toDF("id", "v"), rules)
    assert(a.nRows == 0)
    assert(a.badByRule == Map("v_positive" -> 0L, "v_small" -> 0L))
    assert(a.badFrac("v_positive") == 0.0)
    // a typo'd rule name in alert wiring must surface immediately,
    // not read as permanently clean
    intercept[IllegalArgumentException] { a.badFrac("v_positiv") }
  }

  test("the gate passes a clean frame and fails a dirty one loudly") {
    val clean = Seq((1L, 5), (2L, 3)).toDF("id", "v")
    graft.operators.QualityRules.gate(clean, rules) // must not throw
    val dirty = Seq((1L, 5), (2L, -2)).toDF("id", "v")
    val e = intercept[GateFailed] {
      graft.operators.QualityRules.gate(dirty, rules)
    }
    assert(e.failures.map(_._1) == Seq("v_positive"))
    // tolerance: 50% bad passes a 0.6 gate
    graft.operators.QualityRules.gate(dirty, rules, maxBadFrac = 0.6)
  }
}
