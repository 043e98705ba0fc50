package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.Html

/** Raw-crawl ingest queries — the HTML → article-text face
  * ([[graft.sources.Html]], r10 verdict ask #3). The fixture corpus is
  * pre-extracted text (and /root/testdata is read-only), so the query
  * derives its raw pages deterministically: each document is wrapped
  * in the chrome a real crawl page carries (head/title, style, script,
  * nav menu, heading, footer) with its text HTML-escaped and seeded
  * with `&nbsp;` entities — both engines build the SAME page from the
  * same fixture row, so the oracle checks the full build → extract
  * chain bit-for-bit, and the extraction provably inverts the
  * escaping (the `n_roundtrip` column counts docs whose extracted
  * article equals the original text EXACTLY).
  */
object HtmlQueries {
  import Q._

  /** doc text → HTML-escaped paragraph content: the three markup
    * escapes a serializer performs, plus `&nbsp;` after every token
    * ending in 'a' (exercises the non-markup entity the extractor must
    * collapse back to a space). Escapes first — the seeded entity's
    * own '&' must survive.
    */
  private def escaped(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "a " -> "a&nbsp;")
      .foldLeft(text) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }

  private val escapedSql =
    "replace(replace(replace(replace(text, '&', '&amp;'), '<', '&lt;')," +
      " '>', '&gt;'), 'a ', 'a&nbsp;')"

  /** One derived crawl page per document: title + style + script in
    * the head, nav menu, h1, the escaped text as the single article
    * paragraph, short footer. Every chrome line renders under
    * [[Html.BoilerplateMinChars]] chars; the fixture's article text
    * (≥48 chars) always clears it.
    */
  private def pageOf(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit("</title><style>p{margin:0;padding:0}</style>" +
        "<script>function t(){return 1+1;}</script></head><body>" +
        "<nav><a href=\"/\">Home</a> | <a href=\"/news\">News</a> | " +
        "<a href=\"/about\">About</a></nav><div id=\"main\"><h1>Doc "),
      docId.cast("string"),
      lit("</h1><p>"), escaped(text),
      lit("</p></div><footer>&copy; 2026 Corpus &amp; Sons</footer>" +
        "</body></html>"))

  private val pageOfSql =
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || " +
      "'</title><style>p{margin:0;padding:0}</style>" +
      "<script>function t(){return 1+1;}</script></head><body>" +
      "<nav><a href=\"/\">Home</a> | <a href=\"/news\">News</a> | " +
      "<a href=\"/about\">About</a></nav><div id=\"main\"><h1>Doc ' || " +
      "CAST(doc_id AS VARCHAR) || '</h1><p>' || " + escapedSql + " || " +
      "'</p></div><footer>&copy; 2026 Corpus &amp; Sons</footer>" +
      "</body></html>'"

  /** Messy raw URL per document — deterministic from (doc_id, source),
    * with case / default-port / query-order / fragment variants so
    * distinct raw strings collapse under canonicalization exactly like
    * a real crawl frontier's do. Mirrored bit-for-bit by [[rawUrlSql]].
    */
  private def rawUrl: Column = {
    val id = col("doc_id")
    concat(
      when(id % 2 === 0, lit("http://")).otherwise(lit("HTTP://")),
      when(id % 4 < 2, concat(lit("www."), col("source"), lit(".example.com")))
        .otherwise(concat(lit("WWW."), upper(col("source")), lit(".Example.COM"))),
      when(id % 8 < 4, lit("")).otherwise(lit(":80")),
      lit("/docs/"), (id % 50).cast("string"),
      when(id % 2 === 0, concat(lit("?a=1&b="), (id % 3).cast("string")))
        .otherwise(concat(lit("?b="), (id % 3).cast("string"), lit("&a=1"))),
      when(id % 5 === 0, concat(lit("#s"), (id % 7).cast("string")))
        .otherwise(lit("")))
  }

  private val rawUrlSql =
    "(CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTP://' END) || " +
      "(CASE WHEN doc_id % 4 < 2 THEN 'www.' || source || '.example.com' " +
      "ELSE 'WWW.' || upper(source) || '.Example.COM' END) || " +
      "(CASE WHEN doc_id % 8 < 4 THEN '' ELSE ':80' END) || " +
      "'/docs/' || CAST(doc_id % 50 AS VARCHAR) || " +
      "(CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=' || CAST(doc_id % 3 AS VARCHAR) " +
      "ELSE '?b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1' END) || " +
      "(CASE WHEN doc_id % 5 = 0 THEN '#s' || CAST(doc_id % 7 AS VARCHAR) " +
      "ELSE '' END)"

  /** Canonical form of a URL column: fragment dropped, scheme+host
    * lowercased, default :80 dropped, query parameters sorted. Path
    * case is preserved (paths are case-sensitive; only the authority
    * is not). The companion [[canonicalUrlSql]] mirrors each step.
    */
  private def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val head = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?]+", 0)
    val headC = regexp_replace(lower(head), ":80$", "")
    val tail = noFrag.substr(length(head) + 1, lit(1000000))
    val pathPart = regexp_replace(tail, "\\?.*", "")
    val qPart = when(instr(tail, "?") > 0,
      tail.substr(instr(tail, "?") + 1, lit(1000000))).otherwise(lit(""))
    concat(headC, pathPart,
      when(qPart === "", lit(""))
        .otherwise(concat(lit("?"),
          array_join(sort_array(split(qPart, "&")), "&"))))
  }

  private def canonicalUrlSql(urlExpr: String): String = {
    val noFrag = s"regexp_replace($urlExpr, '#.*', '', 'g')"
    val head = s"regexp_extract($noFrag, '^[a-zA-Z]+://[^/?]+')"
    val headC = s"regexp_replace(lower($head), ':80$$', '')"
    val tail = s"substr($noFrag, length($head) + 1)"
    val pathPart = s"regexp_replace($tail, '\\?.*', '', 'g')"
    val qPart = s"(CASE WHEN instr($tail, '?') > 0 " +
      s"THEN substr($tail, instr($tail, '?') + 1) ELSE '' END)"
    s"$headC || $pathPart || (CASE WHEN $qPart = '' THEN '' ELSE " +
      s"'?' || array_to_string(list_sort(string_split($qPart, '&')), '&') END)"
  }

  val defs: Seq[QueryDef] = Seq(

    // ── q300: HTML boilerplate extraction — per source: pages, pages
    // whose extracted article text round-trips the original EXACTLY
    // (the extractor inverting the build's escaping end-to-end), raw
    // vs extracted char mass, and the keep ratio (micro-quantized
    // integer division so the displayed value terminates — the ratio
    // discipline). A real crawl ingest's first stage; chrome (nav,
    // footer, headings, script/style code) must contribute ZERO chars.
    //
    // Scale shape: build + extract are map-side string expressions on
    // the corpus scan; the aggregate collapses to |sources| in one
    // exchange. No joins, no window, nothing driver-side.
    QueryDef(
      "q300_html_extract",
      (s, d) => {
        val pages = t(s, d, "documents")
          .select(col("source"), col("text"),
            pageOf(col("doc_id"), col("text")).as("html"))
          .withColumn("extracted", Html.articleText(col("html")))
        pages
          .groupBy(col("source"))
          .agg(
            count(lit(1)).cast("long").as("n_docs"),
            count(when(col("extracted") === col("text"), 1))
              .cast("long").as("n_roundtrip"),
            sum(length(col("html")).cast("long")).cast("long")
              .as("html_chars"),
            sum(length(col("extracted")).cast("long")).cast("long")
              .as("text_chars"))
          .withColumn("keep_ratio",
            expr("CAST(text_chars * 1000000 DIV html_chars AS DOUBLE)" +
              " / 1000000.0"))
          .select(col("source"), col("n_docs"), col("n_roundtrip"),
            col("html_chars"), col("text_chars"), col("keep_ratio"))
          .orderBy(col("source"))
      },
      Some(s"""WITH h AS (SELECT source, text, $pageOfSql AS html
             |  FROM documents),
             |e AS (SELECT source, text, html,
             |    ${Html.articleTextSql("html")} AS extracted
             |  FROM h),
             |g AS (SELECT source,
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(count(*) FILTER (WHERE extracted = text)
             |      AS BIGINT) AS n_roundtrip,
             |    CAST(sum(length(html)) AS BIGINT) AS html_chars,
             |    CAST(sum(length(extracted)) AS BIGINT) AS text_chars
             |  FROM e GROUP BY 1)
             |SELECT source, n_docs, n_roundtrip, html_chars, text_chars,
             |  CAST(text_chars * 1000000 // html_chars AS DOUBLE)
             |    / 1000000.0 AS keep_ratio
             |FROM g ORDER BY source""".stripMargin)),

    // ── q301: URL canonicalization census — the crawl-frontier dedup
    // face. Each document derives a messy raw URL (case, default-port,
    // query-order, fragment variants); canonicalization collapses the
    // variants, and the census reports, per source, how many raw
    // spellings fold into how many canonical pages. A real frontier
    // runs exactly this before fetch scheduling: without it the same
    // page is crawled once per spelling.
    //
    // Scale shape: URL build + canonicalize are map-side string
    // expressions on the corpus scan. The census aggregates in TWO
    // single-distinct levels — (source, canonical) then source — so no
    // multi-distinct Expand rewrite appears (the suite-wide plan audit
    // bans it); each level is one exchange on its own grain.
    QueryDef(
      "q301_url_canonicalize",
      (s, d) => {
        val urls = t(s, d, "documents")
          .select(col("source"), rawUrl.as("url"))
          .withColumn("canonical", canonicalUrl(col("url")))
        urls
          .groupBy(col("source"), col("canonical"))
          .agg(count(lit(1)).cast("long").as("n"),
            countDistinct(col("url")).cast("long").as("nr"))
          .groupBy(col("source"))
          .agg(
            sum(col("n")).cast("long").as("n_urls"),
            count(lit(1)).cast("long").as("n_canonical"),
            sum(col("nr")).cast("long").as("n_raw_distinct"))
          .withColumn("collapse_ratio",
            expr("CAST(n_raw_distinct * 1000000 DIV n_canonical AS DOUBLE)" +
              " / 1000000.0"))
          .select(col("source"), col("n_urls"), col("n_canonical"),
            col("n_raw_distinct"), col("collapse_ratio"))
          .orderBy(col("source"))
      },
      Some(s"""WITH u AS (SELECT source, $rawUrlSql AS url FROM documents),
             |c AS (SELECT source, url, ${canonicalUrlSql("url")} AS canonical
             |  FROM u),
             |g1 AS (SELECT source, canonical,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT url) AS BIGINT) AS nr
             |  FROM c GROUP BY 1, 2),
             |g AS (SELECT source,
             |    CAST(sum(n) AS BIGINT) AS n_urls,
             |    CAST(count(*) AS BIGINT) AS n_canonical,
             |    CAST(sum(nr) AS BIGINT) AS n_raw_distinct
             |  FROM g1 GROUP BY 1)
             |SELECT source, n_urls, n_canonical, n_raw_distinct,
             |  CAST(n_raw_distinct * 1000000 // n_canonical AS DOUBLE)
             |    / 1000000.0 AS collapse_ratio
             |FROM g ORDER BY source""".stripMargin)),

    // ── q302: outlink census — the link-graph face of the crawl
    // ingest. Each derived page embeds three anchors (two spread
    // targets, one skew target: doc_id % 100, so ~1% of the id space
    // absorbs a third of all in-links — the hub shape a real web graph
    // has); extraction is regexp_extract_all over the page, and the
    // census reports per source the link mass, distinct-target count,
    // and the top in-degree target (ties break to the smallest id).
    //
    // Scale shape: link extraction rides the scan (map-side regexp +
    // explode); the per-(source, target) count is one exchange at edge
    // grain, the top-1 is a TakeOrdered-style window over the already
    // collapsed target grain, and the page/link totals join back at
    // |sources| grain (broadcast).
    QueryDef(
      "q302_outlink_census",
      (s, d) => {
        val pages = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            concat(
              lit("<p>"),
              lit("<a href=\"/doc/"), ((col("doc_id") * 31 + 7) % 1000)
                .cast("string"), lit("\">rel</a> "),
              lit("<a href=\"/doc/"), ((col("doc_id") * 17 + 3) % 1000)
                .cast("string"), lit("\">more</a> "),
              lit("<a href=\"/doc/"), (col("doc_id") % 100)
                .cast("string"), lit("\">hub</a>"),
              lit("</p>")).as("html"))
        val edges = pages
          .select(col("source"),
            explode(expr(
              "regexp_extract_all(html, 'href=\"/doc/([0-9]+)\"', 1)"))
              .as("target"))
          .select(col("source"), col("target").cast("long").as("target"))
        val byTarget = edges
          .groupBy(col("source"), col("target"))
          .agg(count(lit(1)).cast("long").as("c"))
        val top = byTarget
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("source"))
              .orderBy(col("c").desc, col("target").asc)))
          .filter(col("rk") === 1)
          .select(col("source"), col("target").as("top_target"),
            col("c").as("top_target_links"))
        val totals = byTarget
          .groupBy(col("source"))
          .agg(sum(col("c")).cast("long").as("n_links"),
            count(lit(1)).cast("long").as("n_targets"))
        totals.join(top, Seq("source"))
          .select(col("source"), col("n_links"), col("n_targets"),
            col("top_target"), col("top_target_links"))
          .orderBy(col("source"))
      },
      Some("""WITH p AS (SELECT source, doc_id,
             |    '<p><a href="/doc/' || CAST((doc_id*31+7) % 1000 AS VARCHAR)
             |    || '">rel</a> <a href="/doc/'
             |    || CAST((doc_id*17+3) % 1000 AS VARCHAR)
             |    || '">more</a> <a href="/doc/'
             |    || CAST(doc_id % 100 AS VARCHAR) || '">hub</a></p>' AS html
             |  FROM documents),
             |e0 AS (SELECT source, unnest(regexp_extract_all(html,
             |    'href="/doc/([0-9]+)"', 1)) AS t
             |  FROM p),
             |e AS (SELECT source, CAST(t AS BIGINT) AS target FROM e0),
             |bt AS (SELECT source, target, CAST(count(*) AS BIGINT) AS c
             |  FROM e GROUP BY 1, 2),
             |tp AS (SELECT source, target AS top_target,
             |    c AS top_target_links,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY c DESC, target ASC) AS rk
             |  FROM bt),
             |tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_links,
             |    CAST(count(*) AS BIGINT) AS n_targets
             |  FROM bt GROUP BY 1)
             |SELECT tt.source, n_links, n_targets, top_target,
             |  top_target_links
             |FROM tt JOIN tp ON tt.source = tp.source AND tp.rk = 1
             |ORDER BY tt.source""".stripMargin)),

    // ── q303: robots-style path-prefix filter — the fetch-policy face.
    // A crawl respects per-host path-prefix disallow rules; here a
    // fixed three-prefix blocklist classifies every canonical URL's
    // path, and the census reports allowed/blocked mass per source.
    // Prefix semantics are the robots.txt ones: '/docs/1' blocks
    // /docs/1 AND /docs/10…/docs/19 (string prefix, not path segment).
    //
    // Scale shape: pure map-side classification on the corpus scan
    // (the blocklist is a literal predicate, pushed into the scan's
    // project) + one |sources|-grain aggregate. At 100 TB the rule set
    // would broadcast; the per-row cost is identical.
    QueryDef(
      "q303_robots_filter",
      (s, d) => {
        val urls = t(s, d, "documents")
          .select(col("source"), canonicalUrl(rawUrl).as("canonical"))
          .withColumn("path",
            regexp_replace(
              regexp_replace(col("canonical"), "^[a-z]+://[^/]+", ""),
              "\\?.*", ""))
          .withColumn("blocked",
            col("path").startsWith("/docs/1") ||
              col("path").startsWith("/docs/3") ||
              col("path").startsWith("/docs/42"))
        urls
          .groupBy(col("source"))
          .agg(
            count(when(!col("blocked"), 1)).cast("long").as("n_allowed"),
            count(when(col("blocked"), 1)).cast("long").as("n_blocked"))
          .withColumn("blocked_ratio",
            expr("CAST(n_blocked * 1000000 DIV (n_allowed + n_blocked)" +
              " AS DOUBLE) / 1000000.0"))
          .select(col("source"), col("n_allowed"), col("n_blocked"),
            col("blocked_ratio"))
          .orderBy(col("source"))
      },
      Some(s"""WITH c AS (SELECT source,
             |    ${canonicalUrlSql(rawUrlSql)} AS canonical
             |  FROM documents),
             |p AS (SELECT source,
             |    regexp_replace(regexp_replace(canonical,
             |      '^[a-z]+://[^/]+', ''), '\\?.*', '', 'g') AS path
             |  FROM c),
             |f AS (SELECT source,
             |    (path LIKE '/docs/1%' OR path LIKE '/docs/3%'
             |     OR path LIKE '/docs/42%') AS blocked
             |  FROM p),
             |g AS (SELECT source,
             |    CAST(count(*) FILTER (WHERE NOT blocked) AS BIGINT)
             |      AS n_allowed,
             |    CAST(count(*) FILTER (WHERE blocked) AS BIGINT)
             |      AS n_blocked
             |  FROM f GROUP BY 1)
             |SELECT source, n_allowed, n_blocked,
             |  CAST(n_blocked * 1000000 // (n_allowed + n_blocked)
             |    AS DOUBLE) / 1000000.0 AS blocked_ratio
             |FROM g ORDER BY source""".stripMargin)),

    // ── q307: WARC container ingest, end-to-end under the oracle (r12
    // verdict ask #7). The fixture ships no WARC files, so the query
    // BUILDS them deterministically: every document becomes one HTTP
    // response record (the q300 chrome page, HTML-escaped) framed in
    // WARC/1.0, spread over 8 container files — half gzip'd, sniffed
    // by magic — in four charset variants by doc_id % 4: utf-8
    // labeled by HTTP header; utf-8 with BOM (BOM sniff); utf-16le
    // with BOM; and utf-16le WITHOUT a BOM labeled only by the
    // header — the exact page shape whose first character the r12
    // decode bug dropped. All four encodings are total over Unicode,
    // so [[graft.sources.Warc.readPages]] must return byte-exact HTML
    // and the oracle can compute the expected extraction straight
    // from the documents table ([[Html.articleTextSql]]), never
    // parsing WARC itself: a regression ANYWHERE in record walk,
    // gzip sniff, HTTP split, charset sniff, BOM strip, or extraction
    // breaks the hash.
    //
    // Scale note: the container build is the TEST HARNESS (driver-
    // side, bounded by the fixture), not the ingest path — production
    // WARCs stream per-task via binaryFiles with one-record memory
    // (Warc object doc). The read side measured here IS the
    // production path.
    QueryDef(
      "q307_warc_ingest",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            pageOf(col("doc_id"), col("text")).as("html"))
        val dir = warcFixtureDir(d)
        writeWarcFixture(dir, docs.select(col("doc_id"), col("html")))
        val pages = graft.sources.Warc.readPages(s, dir)
          .select(regexp_extract(col("url"), "/d/(\\d+)$", 1)
            .cast("long").as("doc_id"), col("text").as("extracted"))
        pages.join(docs.select(col("doc_id"), col("source"), col("text")),
            Seq("doc_id"))
          .groupBy((col("doc_id") % 4).as("variant"), col("source"))
          .agg(count(lit(1)).cast("long").as("n_pages"),
            count(when(col("extracted") === col("text"), 1)).cast("long")
              .as("n_roundtrip"),
            sum(length(col("extracted")).cast("long")).cast("long")
              .as("text_chars"))
          .orderBy(col("variant"), col("source"))
      },
      Some(s"""WITH h AS (SELECT doc_id, source, text, $pageOfSql AS html
             |  FROM documents),
             |e AS (SELECT doc_id % 4 AS variant, source, text,
             |    ${Html.articleTextSql("html")} AS extracted
             |  FROM h)
             |SELECT variant, source,
             |  CAST(count(*) AS BIGINT) AS n_pages,
             |  CAST(count(*) FILTER (WHERE extracted = text) AS BIGINT)
             |    AS n_roundtrip,
             |  CAST(sum(length(extracted)) AS BIGINT) AS text_chars
             |FROM e GROUP BY 1, 2 ORDER BY variant, source""".stripMargin))
  )

  /** Fixture location keyed by the sf dir (stable across passes so a
    * bench's five passes rebuild in place, nothing accumulates).
    */
  private def warcFixtureDir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-warc-q307-${math.abs(sfDir.hashCode)}").getAbsolutePath

  /** Record framing for the q307 fixture, in its own zero-field
    * serializable module so the distributed writer's task closure
    * captures THIS and not the (closure-laden) query registry object.
    */
  private object WarcFixtureRecord extends Serializable {
    /** One framed WARC record (header + HTTP response + trailing
      * CRLFs) in the fixture's charset variant for `docId` — a pure
      * function of (docId, html), so any task that writes docId's
      * record writes the same bytes.
      */
    def bytes(docId: Long, html: String): Array[Byte] = {
      val UTF8 = java.nio.charset.StandardCharsets.UTF_8
      val (ctCharset, bom, cs) = (docId % 4).toInt match {
        case 0 => ("; charset=utf-8", Array.empty[Byte], UTF8)
        case 1 =>
          ("", Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte), UTF8)
        case 2 => ("", Array[Byte](0xFF.toByte, 0xFE.toByte),
          java.nio.charset.StandardCharsets.UTF_16LE)
        case _ => ("; charset=utf-16le", Array.empty[Byte],
          java.nio.charset.StandardCharsets.UTF_16LE)
      }
      val body = bom ++ html.getBytes(cs)
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html$ctCharset" +
        "\r\n\r\n").getBytes("ISO-8859-1")
      val payload = http ++ body
      val header = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:graft:$docId>\r\n" +
        s"WARC-Target-URI: http://crawl.example.com/d/$docId\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
      header ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
  }

  /** Write the deterministic WARC container set: 8 files by
    * doc_id % 8, files 0–3 gzip'd whole (magic-sniffed, extension
    * deliberately unhelpful), records in doc_id order.
    *
    * DISTRIBUTED (r13 verdict ask #5): the documents never collect to
    * the driver — rows repartition by their container key and each
    * task streams its containers' records straight to disk. A
    * container's bytes are a pure function of (its doc set, doc_id
    * order), so the output is byte-identical to the old driver-side
    * build; tasks stage to a sibling dir and atomically rename in, so
    * a retried/speculated task rewrites the identical file and the
    * read side never sees a partial container. (Local-fs fixture
    * harness — the production ingest path is [[graft.sources.Warc]];
    * see the scale note above.)
    */
  private def writeWarcFixture(
      dir: String, docHtml: org.apache.spark.sql.DataFrame): Unit = {
    val d = new java.io.File(dir)
    val stage = new java.io.File(dir + ".__stage__")
    Seq(d, stage).foreach { f =>
      if (f.exists()) f.listFiles().foreach(_.delete())
      f.mkdirs()
    }
    docHtml
      .withColumn("fk", (col("doc_id") % 8).cast("int"))
      .repartition(8, col("fk"))
      .sortWithinPartitions(col("fk"), col("doc_id"))
      .select(col("fk"), col("doc_id"), col("html"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var curFk = -1
        var out: java.io.OutputStream = null
        var tmp: java.io.File = null
        def closeAndInstall(): Unit = if (out != null) {
          out.close()
          java.nio.file.Files.move(tmp.toPath,
            new java.io.File(dir, s"part-$curFk.warc").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          out = null
        }
        try {
          it.foreach { r =>
            val fk = r.getInt(0)
            if (fk != curFk) {
              closeAndInstall()
              curFk = fk
              tmp = java.io.File.createTempFile(s"part-$fk-", ".tmp",
                new java.io.File(dir + ".__stage__"))
              val raw = new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(tmp))
              out = if (fk < 4) new java.util.zip.GZIPOutputStream(raw)
                else raw
            }
            out.write(WarcFixtureRecord.bytes(r.getLong(1), r.getString(2)))
          }
          closeAndInstall()
        } finally if (out != null) out.close()
      }
  }
}
