package graft.sources

import graft.SparkTestBase

import java.nio.file.{Files, Paths}

class TablesSpec extends SparkTestBase {

  test("scanFiles: recursive tree flatten + case-insensitive suffix (A1)") {
    val root = Files.createTempDirectory("graft-scan")
    Files.createDirectories(Paths.get(root.toString, "sub", "deep"))
    Files.writeString(Paths.get(root.toString, "a.lsp"), "x")
    Files.writeString(Paths.get(root.toString, "sub", "B.LSP"), "x")
    Files.writeString(Paths.get(root.toString, "sub", "deep", "c.lsp"), "x")
    Files.writeString(Paths.get(root.toString, "sub", "skip.txt"), "x")

    val got = Tables.scanFiles(spark, root.toString, ".lsp")
      .collect().map(_.getString(0)).toSet
    assert(got.size == 3, got)
    assert(got.exists(_.endsWith("B.LSP")), "match must be case-insensitive")
    assert(!got.exists(_.endsWith("skip.txt")))
  }

  test("readCsv isolates malformed rows in _corrupt_record (A12 analog)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(Paths.get(dir.toString, "data.csv"),
      """id,qty
        |1,10
        |2,notanumber
        |3,30
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType)))
    val df = Tables.readCsv(spark, dir.toString, schema).cache()
    val good = df.filter(df("_corrupt_record").isNull)
      .select("id", "qty").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val bad = df.filter(df("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(good == Set((1L, 10), (3L, 30)))
    assert(bad.toSeq == Seq("2,notanumber"))
    df.unpersist()
  }

  test("all ten fixture tables load with expected columns") {
    Tables.names.foreach { n =>
      val df = Tables(spark, sf(), n)
      assert(df.columns.nonEmpty && df.count() > 0, n)
    }
    // the nanos-timestamp path: ts must come back as a usable timestamp
    val ts = Tables(spark, sf(), "events").schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType)
  }
}
