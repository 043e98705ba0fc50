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
             |FROM g ORDER BY source""".stripMargin))
  )
}
