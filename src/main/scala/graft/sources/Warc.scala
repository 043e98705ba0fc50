package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException,
  InputStream}
import java.nio.charset.{Charset, CodingErrorAction}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC ingestion — the container format crawls actually ship
  * (ISO 28500; Common Crawl's distribution unit), feeding the same
  * HTML→article chain as [[Html.readHtml]] (ref concept only: the
  * reference app ingests pre-extracted records,
  * `Batch Processor.py:228-244`; the raw-crawl face is part of the
  * declared north-star extension).
  *
  * Scale shape: one task per WARC file — the grain every public
  * Common Crawl pipeline uses (files are ~1 GB by convention, so a
  * 100 TB crawl is ~100 k files = ample parallelism for 1000
  * executors, with no shuffle anywhere in the ingest: record walk,
  * HTTP split, charset sniff and decode are all map-side per file).
  * The record walk STREAMS (header lines + exactly Content-Length
  * payload bytes per record, gzip inflated on the fly — multi-member
  * `.warc.gz`, one member per record as crawlers write it, inflates
  * transparently under `GZIPInputStream`) straight off the task's
  * open file handle (`binaryFiles` PortableDataStream), so per-task
  * memory is one record, not one file — bounded by the crawl's own
  * record cap, with NO cap on file size (r12 verdict: the former
  * `binaryFile`-source path buffered whole files, ~1 GB of heap per
  * task slot at the crawl convention, and refused files > 2 GiB).
  *
  * Charset handling, in sniffing order (the cheap deterministic core
  * of WHATWG encoding sniffing):
  *   1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE);
  *   2. `charset=` parameter of the HTTP `Content-Type` header;
  *   3. `<meta charset=…>` / `<meta http-equiv … charset=…>` within
  *      the first [[MetaSniffBytes]] bytes (spelled in ASCII, so the
  *      probe decodes latin-1 regardless of the true encoding);
  *   4. UTF-8 as the default.
  * Decoding REPLACES malformed sequences (a crawl always contains
  * mislabeled pages; a throwing decoder would fail the task for one
  * bad page), and an unknown/unsupported label falls back to UTF-8.
  */
object Warc {

  /** One parsed WARC record. `http_status`/`html` are null except for
    * HTTP responses; `body` is the HTTP payload (response/request) or
    * the raw record block otherwise — binary media fetched by the
    * crawl rides it into the multimodal face untouched.
    */
  final case class WarcRecord(
      path: String,
      record_id: String,
      warc_type: String,
      target_uri: String,
      content_type: String,
      http_status: Option[Int],
      charset: String,
      body: Array[Byte],
      html: String)

  /** Leading bytes probed for a `<meta charset>` declaration. 1024 is
    * the de-facto sniff window (browsers prescan exactly this much).
    */
  val MetaSniffBytes = 1024

  /** Loud per-record payload cap. The walk buffers exactly
    * Content-Length bytes per record, so a CORRUPT length (crawler
    * bug, truncated gzip member mid-header) is the one input that
    * could blow task memory — this bounds the allocation and names
    * the record instead. 1 GiB sits above every real crawler's record
    * cap (Common Crawl truncates response payloads at 1 MiB; whole
    * FILES are ~1 GB by convention, and a single record is always a
    * fraction of its file) while staying well under task heap.
    */
  val MaxRecordBytes: Long = 1L << 30

  /** Read a directory of `.warc` / `.warc.gz` files into one row per
    * WARC record. The task opens its file as a STREAM
    * (`binaryFiles`'s PortableDataStream — whole-file grain, never
    * split) and the record walk buffers exactly the current record:
    * per-task memory is one record, not one file, and file size is
    * unbounded (the former `binaryFile`-source implementation
    * materialized the whole file as a byte array per task and
    * hard-capped files at 2 GiB — at the ~1 GB/file crawl convention
    * that was ~1 GB of heap per task slot). Records themselves stay
    * ≤ 2 GiB (a JVM array; also any crawler's record cap).
    */
  def readWarc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(dir)
      .flatMap { case (p, pds) =>
        val base = new BufferedInputStream(pds.open())
        // gzip by magic, not extension — crawls mislabel
        base.mark(2)
        val b0 = base.read(); val b1 = base.read()
        base.reset()
        val in = new BufferedInputStream(
          if (b0 == 0x1F && b1 == 0x8B) new GZIPInputStream(base) else base)
        // Guarantee the handle closes even when the walk is NOT fully
        // consumed — limit()/take(), or a task failing mid-iteration.
        // Spark registers no completion close for binaryFiles streams
        // itself (r13 ADVICE), so we do; the eager in-iterator close
        // below stays the fast path for a multi-file task that should
        // not hold every exhausted handle to task end.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => () }
          })
        val recs = parseStream(p, in)
        new Iterator[WarcRecord] {
          private var closed = false
          override def hasNext: Boolean = {
            val h = recs.hasNext
            if (!h && !closed) { closed = true; in.close() }
            h
          }
          override def next(): WarcRecord = recs.next()
        }
      }
      .toDF()
  }

  /** HTML pages of a WARC directory, extracted: `(path, url, html,
    * text)` — the same output contract as [[Html.readHtml]] plus the
    * crawl's own URL, so the q300 chain (and [[Html.docsFromPages]]
    * into the ingest pipeline) composes on either source.
    */
  def readPages(
      spark: SparkSession, dir: String,
      minLineChars: Int = Html.BoilerplateMinChars): DataFrame =
    readWarc(spark, dir)
      .filter(col("warc_type") === "response" && col("html").isNotNull)
      .select(col("path"), col("target_uri").as("url"), col("html"))
      .withColumn("text", Html.articleText(col("html"), minLineChars))

  /** Parse one WARC file's bytes (gzip-sniffed by magic, not by file
    * extension — crawls mislabel) into its records.
    */
  private[sources] def parseFile(
      path: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    val raw = new ByteArrayInputStream(bytes)
    val in =
      if (bytes.length >= 2 &&
        (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
        new GZIPInputStream(raw)
      else raw
    parseStream(path, new BufferedInputStream(in))
  }

  /** Streaming record walk: version line, header lines, exactly
    * Content-Length payload bytes, then the record's trailing CRLFs
    * (consumed as the skip-to-next-version loop). Tolerates leading
    * junk between records; stops cleanly at EOF.
    */
  private[sources] def parseStream(
      path: String, in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }
      @annotation.tailrec
      private def advance(): WarcRecord = readLine(in) match {
        case null => null
        case l if !l.startsWith("WARC/") => advance() // record gap
        case _ =>
          val headers = Iterator.continually(readLine(in))
            .takeWhile(l => l != null && l.nonEmpty)
            .flatMap { l =>
              val i = l.indexOf(':')
              if (i < 0) None
              else Some(l.substring(0, i).trim.toLowerCase ->
                l.substring(i + 1).trim)
            }.toMap
          val len = headers.getOrElse("content-length", "0").toLong
          val block = readExactly(in, len)
          Some(record(path, headers, block)).orNull
      }
    }

  private def record(
      path: String, headers: Map[String, String],
      block: Array[Byte]): WarcRecord = {
    val warcType = headers.getOrElse("warc-type", "unknown")
    val warcCt = headers.getOrElse("content-type", "")
    val isHttp = warcCt.startsWith("application/http")
    val (status, httpHeaders, body) =
      if (isHttp) splitHttp(block) else (None, Map.empty[String, String], block)
    val ct = httpHeaders.getOrElse("content-type", if (isHttp) "" else warcCt)
    val isHtml = status.isDefined &&
      (ct.startsWith("text/html") || ct.startsWith("application/xhtml"))
    val cs = if (isHtml || ct.startsWith("text/")) sniffCharset(ct, body)
      else null
    val html = if (isHtml) decode(body, cs) else null
    WarcRecord(
      path = path,
      record_id = headers.getOrElse("warc-record-id", null),
      warc_type = warcType,
      target_uri = headers.getOrElse("warc-target-uri", null),
      content_type = if (ct.isEmpty) null else ct,
      http_status = status,
      charset = cs,
      body = body,
      html = html)
  }

  /** Split an `application/http` payload into (status, headers, body)
    * at the first blank line. A payload without an HTTP preamble
    * (truncated capture) comes back whole as the body, status None.
    */
  private[sources] def splitHttp(
      block: Array[Byte]): (Option[Int], Map[String, String], Array[Byte]) = {
    val sep = indexOfDoubleCrlf(block)
    if (sep < 0) return (None, Map.empty, block)
    val head = new String(block, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n").toSeq
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ").lift(1))
      .flatMap(s => scala.util.Try(s.toInt).toOption)
    if (status.isEmpty) return (None, Map.empty, block)
    val hs = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    (status, hs, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  /** Sniff the charset of a text payload; see the object doc for the
    * order. Returns a canonical java.nio charset name.
    */
  private[sources] def sniffCharset(
      contentType: String, body: Array[Byte]): String = {
    def canon(label: String): Option[String] =
      scala.util.Try(Charset.forName(label.trim).name()).toOption
    if (body.length >= 3 && (body(0) & 0xFF) == 0xEF &&
      (body(1) & 0xFF) == 0xBB && (body(2) & 0xFF) == 0xBF) return "UTF-8"
    if (body.length >= 2 && (body(0) & 0xFF) == 0xFF &&
      (body(1) & 0xFF) == 0xFE) return "UTF-16LE"
    if (body.length >= 2 && (body(0) & 0xFF) == 0xFE &&
      (body(1) & 0xFF) == 0xFF) return "UTF-16BE"
    val FromCt = "(?i)charset=[\"']?([A-Za-z0-9._-]+)".r
    FromCt.findFirstMatchIn(contentType)
      .flatMap(m => canon(m.group(1)))
      .orElse {
        val n = math.min(MetaSniffBytes, body.length)
        val probe = new String(body, 0, n, "ISO-8859-1")
        val Meta =
          "(?is)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9._-]+)".r
        Meta.findFirstMatchIn(probe).flatMap(m => canon(m.group(1)))
      }
      .getOrElse("UTF-8")
  }

  /** Decode with the sniffed charset, replacing malformed input, BOM
    * stripped (a decoded BOM would survive as U+FEFF and poison the
    * first shingle of every BOM'd page).
    */
  private[sources] def decode(body: Array[Byte], charset: String): String = {
    val cs = Charset.forName(charset)
    // skip ONLY a leading BOM that is actually present and matches the
    // charset: UTF-16 labels also arrive from the Content-Type header
    // or a meta tag on BOM-less pages, and an unconditional 2-byte
    // skip there would silently drop the first character (r12 ADVICE)
    val skip =
      if (charset == "UTF-8" && body.length >= 3 &&
        (body(0) & 0xFF) == 0xEF && (body(1) & 0xFF) == 0xBB &&
        (body(2) & 0xFF) == 0xBF) 3
      else if (charset == "UTF-16LE" && body.length >= 2 &&
        (body(0) & 0xFF) == 0xFF && (body(1) & 0xFF) == 0xFE) 2
      else if (charset == "UTF-16BE" && body.length >= 2 &&
        (body(0) & 0xFF) == 0xFE && (body(1) & 0xFF) == 0xFF) 2
      else 0
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(body, skip, body.length - skip))
      .toString
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** One CRLF- (or LF-) terminated ISO-8859-1 line; null at EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(128)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readExactly(in: InputStream, n: Long): Array[Byte] = {
    require(n >= 0 && n <= MaxRecordBytes,
      s"WARC record declares $n payload bytes — past MaxRecordBytes " +
        s"($MaxRecordBytes); corrupt Content-Length or an out-of-spec " +
        "crawler record (refusing to buffer it)")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n.toInt - off)
      if (r < 0) throw new EOFException(
        s"truncated WARC record: expected $n payload bytes, got $off")
      off += r
    }
    out
  }
}
