package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class HtmlSpec extends SparkTestBase {

  // a realistic crafted page: head chrome, nav menu, article of three
  // long paragraphs + a heading + a list, cookie bar, footer — the
  // structures the extractor must keep apart
  private val articleP1 =
    "The quarterly ingestion pipeline processed forty terabytes of " +
      "crawled markup without a single checksum failure this week."
  private val articleP2 =
    "Engineers attribute the result to the staged commit protocol & " +
      "the partition-grain swap that never rewrites untouched buckets."
  private val articleLi =
    "A third, shorter but still clearly prose line that easily clears " +
      "the boilerplate length threshold for list items too."
  private val page =
    "<html>\n<head><title>Weekly Report</title>" +
      "<style>body { color: #222; } .nav { display: flex; }</style>" +
      "<script>var consent = false; function track() { return 42; }" +
      "</script></head>" +
      "<body><header><nav><ul><li><a href=\"/\">Home</a></li>" +
      "<li><a href=\"/archive\">Archive</a></li>" +
      "<li><a href=\"/contact\">Contact</a></li></ul></nav></header>" +
      "<div class=\"cookie-bar\">We use cookies. <b>OK</b></div>" +
      "<div id=\"content\"><h1>Weekly Report</h1>" +
      s"<p>${articleP1.replace("forty", "forty&nbsp;")}</p>" +
      s"<p>${articleP2.replace("&", "&amp;")}</p>" +
      s"<ul><li>$articleLi</li></ul>" +
      "</div><footer>&copy; 2026 Example Site &middot; " +
      "<a href=\"/privacy\">Privacy</a></footer></body></html>"

  private def extract(html: String): String = {
    val df = spark.range(1).select(lit(html).as("h"))
    df.select(Html.articleText(col("h")).as("t")).head().getString(0)
  }

  test("article prose survives extraction exactly; chrome does not") {
    val got = extract(page)
    val lines = got.split("\n").toSeq
    assert(lines == Seq(articleP1, articleP2, articleLi),
      s"extracted lines:\n$got")
    // chrome must contribute nothing
    Seq("Home", "Archive", "Contact", "cookies", "Privacy", "Weekly",
      "track", "consent", "color", "display", "&copy;", "42").foreach {
      chrome => assert(!got.contains(chrome), s"chrome leaked: $chrome")
    }
  }

  test("entities decode and script/style content is dropped wholesale") {
    assert(extract(page).contains("forty terabytes"),
      "&nbsp; must collapse to a plain space")
    assert(extract(page).contains("protocol & the"),
      "&amp; must decode to a literal ampersand")
    val tricky = "<p>escaped markup reads &lt;b&gt;bold&lt;/b&gt; and " +
      "&quot;quoted&quot; and it&#39;s fine — a full prose line.</p>"
    assert(extract(tricky) ==
      "escaped markup reads <b>bold</b> and \"quoted\" and it's fine " +
        "— a full prose line.")
    // a script whose body LOOKS like prose must still drop whole
    val sneaky = "<script>This sentence inside a script block is long " +
      "enough to pass the length filter if it leaked.</script>" +
      s"<p>$articleP1</p>"
    assert(extract(sneaky) == articleP1)
  }

  test("readHtml ingests a directory of pages with extraction attached") {
    val dir = Files.createTempDirectory("graft-html")
    Files.writeString(Paths.get(dir.toString, "a.html"), page)
    Files.writeString(Paths.get(dir.toString, "b.html"),
      s"<html><body><nav>Menu</nav><p>$articleP2</p></body></html>")
    val df = Html.readHtml(spark, dir.toString)
    assert(df.columns.toSeq == Seq("path", "html", "text"))
    val byName = df.collect()
      .map(r => (r.getString(0).split('/').last, r.getString(2))).toMap
    assert(byName("a.html").split("\n").head == articleP1)
    assert(byName("b.html") == articleP2)
  }

  test("q300 equals a plain-Scala recompute of the build+extract chain") {
    // independent reimplementation: same page builder and extraction
    // contract in java.util.regex over collected fixture rows
    def esc(t: String): String = t.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;").replace("a ", "a&nbsp;")
    def build(id: Long, t: String): String =
      s"<html><head><title>Doc $id</title>" +
        "<style>p{margin:0;padding:0}</style>" +
        "<script>function t(){return 1+1;}</script></head><body>" +
        "<nav><a href=\"/\">Home</a> | <a href=\"/news\">News</a> | " +
        s"""<a href="/about">About</a></nav><div id="main"><h1>Doc $id""" +
        s"</h1><p>${esc(t)}</p></div>" +
        "<footer>&copy; 2026 Corpus &amp; Sons</footer></body></html>"
    def extractLocal(h: String): String = {
      var s = h.replaceAll("(?s)<script[^>]*>.*?</script>", " ")
      s = s.replaceAll("(?s)<style[^>]*>.*?</style>", " ")
      s = s.replaceAll(
        "</(p|div|h1|h2|h3|li|ul|ol|nav|footer|header|title|table|tr|td)>" +
          "|<br */?>", "\n")
      s = s.replaceAll("<[^>]*>", " ")
      for ((e, c) <- Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"))
        s = s.replace(e, c)
      s.split("\n", -1).map(_.trim.replaceAll(" +", " "))
        .filter(l => l.length >= Html.BoilerplateMinChars &&
          !l.matches(Html.CopyrightLinePattern + ".*")).mkString("\n")
    }
    val docs = graft.queries.Q.t(spark, sf(), "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).map { case (src, rs) =>
      val pages = rs.map { case (id, _, t) => (t, build(id, t)) }
      val ex = pages.map { case (t, h) => (t, h, extractLocal(h)) }
      val htmlChars = ex.map(_._2.length.toLong).sum
      val textChars = ex.map(_._3.length.toLong).sum
      (src, (rs.length.toLong, ex.count(e => e._3 == e._1).toLong,
        htmlChars, textChars,
        (textChars * 1000000L / htmlChars).toDouble / 1000000.0))
    }
    val got = graft.SparkEntry.queries("q300_html_extract")(spark, sf())
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == expect, s"got=$got expect=$expect")
    // and the extraction must be lossless on this fixture: every doc
    // is ≥48 chars of clean single-line prose, so every doc round-trips
    got.foreach { case (src, (n, rt, _, _, _)) =>
      assert(rt == n, s"$src: $rt/$n round-tripped")
    }
  }

  // ── q301–q303 share the derived messy-URL corpus; this is the plain-
  // Scala reimplementation of the build + canonicalization both specs
  // recompute from
  private def rawUrlLocal(id: Long, src: String): String = {
    val scheme = if (id % 2 == 0) "http://" else "HTTP://"
    val host =
      if (id % 4 < 2) s"www.$src.example.com"
      else s"WWW.${src.toUpperCase}.Example.COM"
    val port = if (id % 8 < 4) "" else ":80"
    val q = if (id % 2 == 0) s"?a=1&b=${id % 3}" else s"?b=${id % 3}&a=1"
    val frag = if (id % 5 == 0) s"#s${id % 7}" else ""
    s"$scheme$host$port/docs/${id % 50}$q$frag"
  }

  private def canonicalLocal(u: String): String = {
    val noFrag = u.replaceAll("#.*", "")
    val head = "^[a-zA-Z]+://[^/?]+".r.findFirstIn(noFrag).getOrElse("")
    val headC = head.toLowerCase.replaceAll(":80$", "")
    val tail = noFrag.substring(head.length)
    val path = tail.replaceAll("\\?.*", "")
    val qi = tail.indexOf('?')
    val q = if (qi >= 0) tail.substring(qi + 1) else ""
    headC + path +
      (if (q.isEmpty) "" else "?" + q.split("&", -1).sorted.mkString("&"))
  }

  private def docIds() = graft.queries.Q.t(spark, sf(), "documents")
    .select(col("doc_id"), col("source")).collect()
    .map(r => (r.getLong(0), r.getString(1)))

  test("q301 equals a plain-Scala recompute; variants genuinely collapse") {
    val urls = docIds().map { case (id, src) =>
      val r = rawUrlLocal(id, src); (src, r, canonicalLocal(r))
    }
    val expect = urls.groupBy(_._1).map { case (src, xs) =>
      val nCanon = xs.map(_._3).distinct.length.toLong
      val nRaw = xs.map(_._2).distinct.length.toLong
      (src, (xs.length.toLong, nCanon, nRaw,
        (nRaw * 1000000L / nCanon).toDouble / 1000000.0))
    }
    val got = graft.SparkEntry.queries("q301_url_canonicalize")(spark, sf())
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expect, s"got=$got expect=$expect")
    // the census must be non-vacuous: raw spellings genuinely collapse
    // (distinct raw URLs exceed canonical pages in every source)
    got.foreach { case (src, (_, nCanon, nRaw, _)) =>
      assert(nRaw > nCanon, s"$src: no variant collapse ($nRaw raw, $nCanon canonical)")
    }
  }

  test("q302 equals a plain-Scala recompute; the hub targets dominate") {
    val edges = docIds().flatMap { case (id, src) =>
      Seq((src, (id * 31 + 7) % 1000), (src, (id * 17 + 3) % 1000),
        (src, id % 100))
    }
    val expect = edges.groupBy(_._1).map { case (src, xs) =>
      val byT = xs.groupBy(_._2).map { case (t, g) => (t, g.length.toLong) }
      val (topT, topC) = byT.toSeq.sortBy { case (t, c) => (-c, t) }.head
      (src, (xs.length.toLong, byT.size.toLong, topT, topC))
    }
    val got = graft.SparkEntry.queries("q302_outlink_census")(spark, sf())
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"got=$got expect=$expect")
    // skew sanity: a hub target (doc_id % 100 fan-in) must beat the
    // uniform in-degree by a wide margin
    got.foreach { case (src, (nLinks, nTargets, _, topC)) =>
      assert(topC * nTargets > 2 * nLinks,
        s"$src: no hub skew (top=$topC links=$nLinks targets=$nTargets)")
    }
  }

  test("q303 equals a plain-Scala recompute; both classes non-empty") {
    val cls = docIds().map { case (id, src) =>
      val path = s"/docs/${id % 50}"
      (src, path.startsWith("/docs/1") || path.startsWith("/docs/3") ||
        path.startsWith("/docs/42"))
    }
    val expect = cls.groupBy(_._1).map { case (src, xs) =>
      val b = xs.count(_._2).toLong
      val a = xs.length.toLong - b
      (src, (a, b, (b * 1000000L / (a + b)).toDouble / 1000000.0))
    }
    val got = graft.SparkEntry.queries("q303_robots_filter")(spark, sf())
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expect, s"got=$got expect=$expect")
    got.foreach { case (src, (a, b, _)) =>
      assert(a > 0 && b > 0, s"$src: degenerate filter (allowed=$a blocked=$b)")
    }
  }
}
