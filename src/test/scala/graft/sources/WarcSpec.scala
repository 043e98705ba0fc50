package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WARC ingest: record walk (plain and multi-member gzip), HTTP
  * split, charset sniffing (header / meta / BOM), and the contract
  * that readWarc→articleText equals readHtml on equal content.
  */
class WarcSpec extends SparkTestBase {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private val prose =
    "This is a long enough paragraph of article prose to survive the filter."

  private def rec(
      tpe: String, id: String, uri: Option[String], warcCt: String,
      payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"Content-Type: $warcCt\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes("ISO-8859-1") ++ payload ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def http(ct: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      body

  // the SAME logical page in three physical encodings
  private val pageUtf8 =
    s"<html><head><title>t</title></head><body><p>$prose café</p>" +
      "<div>nav</div></body></html>"
  private val pageLatin1 =
    "<html><head><meta charset=\"iso-8859-1\"></head>" +
      s"<body><p>$prose café</p><div>nav</div></body></html>"
  private val pageBom =
    s"<html><body><p>$prose café</p><div>nav</div></body></html>"
  private val gif = "GIF89a".getBytes("ISO-8859-1") ++
    Array[Byte](0x10, 0x00, 0x10, 0x00, -128, 0x00, 0x00)

  private def records: Seq[Array[Byte]] = Seq(
    rec("warcinfo", "info-1", None, "application/warc-fields",
      "software: graft-test\r\n".getBytes("ISO-8859-1")),
    rec("response", "resp-utf8", Some("http://a.test/utf8"),
      "application/http; msgtype=response",
      http("text/html; charset=utf-8", pageUtf8.getBytes("UTF-8"))),
    rec("response", "resp-latin1", Some("http://a.test/latin1"),
      "application/http; msgtype=response",
      http("text/html", pageLatin1.getBytes("ISO-8859-1"))),
    rec("request", "req-1", Some("http://a.test/utf8"),
      "application/http; msgtype=request",
      "GET /utf8 HTTP/1.1\r\nHost: a.test\r\n\r\n".getBytes("ISO-8859-1")),
    rec("response", "resp-gif", Some("http://a.test/pic.gif"),
      "application/http; msgtype=response",
      http("image/gif", gif)),
    rec("response", "resp-bom", Some("http://a.test/bom"),
      "application/http; msgtype=response",
      http("text/html",
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          pageBom.getBytes("UTF-8"))))

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  private lazy val plainDir = {
    val d = tmp("warc-plain")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "crawl.warc"),
      records.reduce(_ ++ _))
    d
  }

  private lazy val gzDir = {
    val d = tmp("warc-gz")
    // one gzip MEMBER per record, members concatenated — the layout
    // crawlers actually write (per-record random access)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "crawl.warc.gz"),
      records.map(gzMember).reduce(_ ++ _))
    d
  }

  test("record walk: types, statuses, payloads survive; binary rides untouched") {
    val rows = Warc.readWarc(spark, plainDir).collect()
    assert(rows.length == 6, s"expected 6 records, got ${rows.length}")
    val byId = rows.map(r => r.getAs[String]("record_id") -> r).toMap
    assert(byId.keySet == Set("<urn:uuid:info-1>", "<urn:uuid:resp-utf8>",
      "<urn:uuid:resp-latin1>", "<urn:uuid:req-1>", "<urn:uuid:resp-gif>",
      "<urn:uuid:resp-bom>"))
    val types = rows.groupBy(_.getAs[String]("warc_type"))
      .view.mapValues(_.length).toMap
    assert(types == Map("warcinfo" -> 1, "response" -> 4, "request" -> 1))
    // responses carry their HTTP status; non-HTTP records none
    assert(byId("<urn:uuid:resp-utf8>").getAs[Int]("http_status") == 200)
    assert(byId("<urn:uuid:info-1>").isNullAt(
      byId("<urn:uuid:info-1>").fieldIndex("http_status")))
    // binary payload: exact bytes, no html, no charset
    val g = byId("<urn:uuid:resp-gif>")
    assert(g.getAs[Array[Byte]]("body").toSeq == gif.toSeq)
    assert(g.isNullAt(g.fieldIndex("html")) && g.isNullAt(g.fieldIndex("charset")))
  }

  test("charset sniffing: HTTP header, meta tag, and BOM all decode to the same text") {
    val rows = Warc.readWarc(spark, plainDir)
      .filter(col("html").isNotNull).collect()
      .map(r => r.getAs[String]("record_id") ->
        (r.getAs[String]("charset"), r.getAs[String]("html"))).toMap
    assert(rows("<urn:uuid:resp-utf8>")._1 == "UTF-8")
    assert(rows("<urn:uuid:resp-latin1>")._1 == "ISO-8859-1")
    assert(rows("<urn:uuid:resp-bom>")._1 == "UTF-8")
    // the é must survive every route; the BOM must NOT survive decode
    rows.values.foreach { case (_, html) =>
      assert(html.contains("café"), s"é lost: $html")
      assert(!html.contains("﻿"), "BOM leaked into decoded html")
    }
  }

  test("a BOM-less UTF-16 page labeled by header keeps its first character") {
    // r12 ADVICE regression: decode() used to skip 2 leading bytes for
    // ANY utf-16 label, eating the first character of pages whose
    // label came from the HTTP header (or meta) with no BOM present.
    val page = s"<html><body><p>X$prose</p></body></html>"
    val dir = tmp("warc-u16")
    val le = rec("response", "u16le", Some("http://a.test/u16le"),
      "application/http; msgtype=response",
      http("text/html; charset=utf-16le", page.getBytes("UTF-16LE")))
    val be = rec("response", "u16be", Some("http://a.test/u16be"),
      "application/http; msgtype=response",
      http("text/html; charset=utf-16be", page.getBytes("UTF-16BE")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "u16.warc"), le ++ be)
    val rows = Warc.readWarc(spark, dir)
      .filter(col("html").isNotNull).collect()
      .map(r => r.getAs[String]("record_id") -> r.getAs[String]("html"))
      .toMap
    assert(rows.size == 2)
    rows.foreach { case (id, html) =>
      assert(html == page, s"$id decoded wrong: ${html.take(30)}…")
    }
    // and a BOM'd UTF-16LE page still sheds exactly its BOM
    val bomBody = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      page.getBytes("UTF-16LE")
    val dir2 = tmp("warc-u16-bom")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir2, "b.warc"),
      rec("response", "u16bom", Some("http://a.test/u16bom"),
        "application/http; msgtype=response", http("text/html", bomBody)))
    val got = Warc.readWarc(spark, dir2).filter(col("html").isNotNull)
      .head().getAs[String]("html")
    assert(got == page, s"BOM handling drifted: ${got.take(30)}…")
  }

  test("multi-member gzip parses to the identical record set") {
    def canon(dir: String) = Warc.readWarc(spark, dir)
      .select("record_id", "warc_type", "target_uri", "content_type",
        "http_status", "charset", "html")
      .collect().map(_.toSeq.map {
        case null => null
        case x => x
      }).toSet
    assert(canon(gzDir) == canon(plainDir),
      "gzip members must parse identically to the plain container")
  }

  test("readPages → articleText ≡ readHtml on equal content") {
    val pages = Warc.readPages(spark, gzDir)
    val got = pages.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.keySet == Set("http://a.test/utf8", "http://a.test/latin1",
      "http://a.test/bom"))
    // all three encodings of the same prose extract the same article
    assert(got.values.toSet.size == 1, s"extractions drifted: $got")
    assert(got.values.head.contains(prose))
    // control: the DECODED html written as plain files through readHtml
    val htmlDir = tmp("warc-html-ctl")
    Seq("u" -> pageUtf8, "l" -> pageLatin1, "b" -> pageBom).foreach {
      case (n, h) => java.nio.file.Files.write(
        java.nio.file.Paths.get(htmlDir, s"$n.html"), h.getBytes("UTF-8"))
    }
    val ctl = Html.readHtml(spark, htmlDir).select("text").collect()
      .map(_.getString(0)).toSet
    assert(ctl == got.values.toSet,
      "WARC route and file route must extract identical text")
  }

  test("a truncated record fails loudly, not silently short") {
    val full = records.reduce(_ ++ _)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length / 2)
    val e = intercept[Exception] {
      Warc.parseFile("x.warc", cut).toList
    }
    assert(e.getMessage != null)
  }

  test("a corrupt Content-Length past MaxRecordBytes refuses to buffer") {
    // a crawler-side bogus length is the ONE input that could blow
    // task memory under the one-record walk — the guard must name the
    // record loudly BEFORE allocating, not OOM trying
    val bogus = (s"WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:t:bogus>\r\n" +
      s"Content-Length: ${Warc.MaxRecordBytes + 1}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ http("text/html", "tiny".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Warc.parseFile("x.warc", bogus).toList
    }
    assert(e.getMessage.contains("MaxRecordBytes"), e.getMessage)
  }
}
