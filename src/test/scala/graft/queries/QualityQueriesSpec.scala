package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Semantics of the quality/scrub/mixing family (q66–q70) on a CRAFTED
  * corpus: the driver's DuckDB gate proves cross-engine equivalence on
  * the fixture tables, but those are synthetic word-salad with no PII
  * and no containment structure — the interesting behavior (a real
  * email found and redacted, a chunk wholly contained in a longer doc,
  * a fully-repetitive doc flagged) needs documents built to exhibit it.
  */
class QualityQueriesSpec extends SparkTestBase {

  /** documents-schema corpus written to a temp dir so the queries run
    * through their real `Tables` entry path.
    */
  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-quality").toString
    val rows = Seq(
      // PII-bearing doc: one email, one IPv4, one phone
      (0L, "contact alice.smith@example.com or 192.168.1.1 or 555-123-4567 now",
        "en", "srcA"),
      // fully repetitive
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "srcA"),
      // all-distinct tokens (10 tokens -> top_frac 0.1, below threshold)
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "en", "srcB"),
      // chunk of doc 4: containment 1.0, Jaccard well below 0.5
      (3L, "w05 w06 w07 w08 w09 w10 w11 w12", "en", "srcB"),
      // long host doc containing doc 3
      (4L, (1 to 30).map(i => f"w$i%02d").mkString(" "), "en", "srcC"),
      // unique content -> novelty 1.0
      (5L, "totally fresh original material nobody else wrote here at all",
        "en", "srcC"))
    val df = spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q67 finds and counts real emails / IPv4s / phone numbers") {
    val out = SparkEntry.queries("q67_pii_scrub")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("srcA") == ((1L, 1L, 1L, 1L)),
      s"srcA should count 1 email, 1 ip, 1 phone in 1 flagged doc: $out")
    assert(out("srcB") == ((0L, 0L, 0L, 0L)) && out("srcC") == ((0L, 0L, 0L, 0L)))
  }

  test("q67 redaction collapses PII variants to one clean hash") {
    // two docs differing ONLY in their PII values redact identically —
    // the n_distinct_clean column is how an auditor sees scrubbing work
    val tmp = java.nio.file.Files.createTempDirectory("graft-pii2").toString
    val rows = Seq(
      (0L, "mail bob@x.io from 10.0.0.1", "en", "s"),
      (1L, "mail eve@y.org from 172.16.0.9", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q67_pii_scrub")(spark, tmp).collect().head
    assert(r.getLong(1) == 2L && r.getLong(6) == 1L,
      s"2 docs should share 1 distinct clean hash: $r")
  }

  test("q67 counts reconcile with redaction when one span matches two patterns") {
    // '10.0.0.1@example.org' matches BOTH the email and the ipv4
    // pattern on raw text; stage-sequential counting must report it
    // once, as the email that was actually redacted (ip_cnt 0 — after
    // email redaction no ipv4 remains)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pii3").toString
    val rows = Seq((0L, "ping 10.0.0.1@example.org now", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q67_pii_scrub")(spark, tmp).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 0L, 0L)),
      s"overlapping span must count once, as the redacted email: $r")
  }

  test("q69 survives a zero-token source (rate 0, no ANSI divide-by-zero)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mix0").toString
    val rows = Seq(
      (0L, "three tokens here", "en", "full"),
      (1L, "", "en", "empty"),
      (2L, " ", "en", "empty"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q69_domain_mix")(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("empty") == ((0L, 0L)), s"zero-token source gets rate 0: $out")
    assert(out("full") == ((3L, 1000L)), s"sole token-bearing source keeps 1000: $out")
  }

  test("q66 flags the repetitive doc and clears the distinct-token doc") {
    val out = SparkEntry.queries("q66_repetition_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(6)).toMap
    assert(out(1L) == 1, "all-same-token doc must flag repetitive")
    assert(out(2L) == 0, "10-distinct-token doc must not flag")
    assert(out(4L) == 0, "30-distinct-token doc must not flag")
  }

  test("q68 catches the contained chunk that Jaccard misses") {
    val pairs = SparkEntry.queries("q68_doc_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val chunk = pairs.find(p => p._1 == 3L && p._2 == 4L)
    assert(chunk.exists(_._3 == 1.0),
      s"doc 3 is wholly inside doc 4 -> containment 1.0, got $chunk")
    val jacc = SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!jacc.contains((3L, 4L)),
      "the chunk pair must be invisible to Jaccard>=0.5 (that's the point)")
  }

  test("q25 pairs are always a subset of q68 pairs (containment >= jaccard)") {
    val j = SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = SparkEntry.queries("q68_doc_containment")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(j.subsetOf(c),
      s"jaccard>=0.5 implies containment>=0.5>=0.25; missing ${j.diff(c)}")
  }

  test("q70 novelty: unique doc scores 1.0, contained chunk scores 0.0") {
    val out = SparkEntry.queries("q70_ngram_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(5L) == 1.0, s"unique doc novelty: $out")
    assert(out(3L) == 0.0, "every shingle of the chunk also lives in doc 4")
  }

  test("q72 chunking: boundary sizes, stride overlap, empty docs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    def words(n: Int) = (1 to n).map(i => f"t$i%02d").mkString(" ")
    val rows = Seq(
      (0L, words(40), "en", "s"), // 2 chunks: [1..32], [25..40]
      (1L, words(32), "en", "s"), // exactly one window
      (2L, words(33), "en", "s"), // 1 token past -> second chunk [25..33]
      (3L, "", "en", "s")) //        no tokens -> no chunks
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q72_doc_chunks")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(out.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (2L, 0L), (2L, 1L)),
      s"chunk ids: ${out.keySet}")
    assert(out((0L, 0L))._1 == 32L && out((0L, 1L))._1 == 16L)
    assert(out((1L, 0L))._1 == 32L)
    assert(out((2L, 1L))._1 == 9L)
    // the digest really is the window's content: doc 0 chunk 1 =
    // tokens 25..40
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest((25 to 40).map(i => f"t$i%02d").mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out((0L, 1L))._2 == expect, "chunk digest mismatch")
  }

  test("q72 chunk layout matches an independent reimplementation for sizes 0..80") {
    // every doc length from 0 to 40 plus window/stride multiples:
    // chunk indices, per-chunk token counts, and digests must all
    // equal a plain-Scala re-derivation of the 32/24 layout
    val sizes = (0 to 40) ++ Seq(47, 48, 49, 55, 56, 57, 63, 64, 65, 80)
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk-sweep").toString
    def toks(n: Int) = (1 to n).map(i => s"d${n}t$i")
    val rows = sizes.map(n => (n.toLong, toks(n).mkString(" "), "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = sizes.filter(_ > 0).flatMap { n =>
      val t = toks(n)
      val nChunks = (math.max(n - 32, 0) + 23) / 24 + 1
      (0 until nChunks).map { i =>
        val chunk = t.slice(i * 24, i * 24 + 32)
        (n.toLong, i.toLong, chunk.size.toLong, md5hex(chunk.mkString(" ")))
      }
    }.toSet

    val got = SparkEntry.queries("q72_doc_chunks")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("q69 equalizes token mass: min source keeps rate 1000, others below") {
    val out = SparkEntry.queries("q69_domain_mix")(spark, sf())
      .collect().map(r =>
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val minTok = out.map(_._2).min
    out.foreach { case (src, tok, rate, sampled) =>
      assert(rate == minTok * 1000 / tok, s"$src rate")
      assert(rate <= 1000L && sampled >= 0L)
    }
    assert(out.filter(_._2 == minTok).forall(_._3 == 1000L),
      "smallest source is never downsampled")
  }

  test("q76 flags cross-document duplicate segments, not intra-doc repeats") {
    // P = one exact 16-token block shared by docs 0 and 1 at the SAME
    // alignment; doc 2 is unrelated; doc 3 is a short partial segment;
    // doc 4 repeats its own block twice (intra-doc -> NOT flagged:
    // the scrub targets cross-document boilerplate, df counts docs)
    val P = (1 to 16).map(i => f"p$i%02d").mkString(" ")
    val Q = (1 to 16).map(i => f"q$i%02d").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-seg").toString
    val rows = Seq(
      (0L, P + " xa xb xc", "en", "s"),
      (1L, P + " ya yb", "en", "s"),
      (2L, (1 to 20).map(i => s"u$i").mkString(" "), "en", "s"),
      (3L, "one partial segment only", "en", "s"),
      (4L, Q + " " + Q, "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q76_dup_segments")(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // docs 0/1: the shared P segment is dup (16 tokens), the tail kept
    assert(out(0L) == ((2L, 1L, 16L, 3L)), s"doc0: ${out(0L)}")
    assert(out(1L) == ((2L, 1L, 16L, 2L)), s"doc1: ${out(1L)}")
    // unrelated + short docs: nothing flagged
    assert(out(2L) == ((2L, 0L, 0L, 20L)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((1L, 0L, 0L, 4L)), s"doc3: ${out(3L)}")
    // intra-doc repetition: both Q segments live in ONE doc -> df = 1
    assert(out(4L) == ((2L, 0L, 0L, 32L)), s"doc4: ${out(4L)}")
  }

  test("q81 names the shared passage q76 counts, with a real example doc") {
    val P = (1 to 16).map(i => f"s$i%02d").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-seg-q81").toString
    val rows = Seq(
      (0L, P + " tail one", "en", "s"),
      (1L, P + " tail two", "en", "s"),
      (2L, P + " tail three", "en", "s"),
      (3L, "unrelated words that never repeat anywhere at all", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q81_boilerplate_passages")(spark, tmp)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 1, s"exactly one shared passage: ${out.toSeq}")
    val (md5hex, df, occ, ex) = out.head
    assert(df == 3L && occ == 3L && ex == 0L)
    // the digest IS the passage: md5 of the 16 shared tokens
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(P.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5hex == expect, "reported digest is not the shared passage")
    // reconciliation with q76: the example doc reports dup mass
    val q76 = SparkEntry.queries("q76_dup_segments")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q76(ex) >= 1L, "example doc must carry dup segments in q76")
  }

  test("q223 merges a 400-token mirrored block into ONE span, splits on gaps") {
    // docs 0/1 share a 400-token block = 25 aligned segments -> one
    // run of 25 segments / 400 tokens, NOT 25 rows; doc 2 shares two
    // separate 16-token blocks with doc 3, split by a unique middle
    // segment -> exactly two runs with the gap preserved
    val B = (1 to 400).map(i => f"b$i%03d").mkString(" ")
    val S1 = (1 to 16).map(i => f"s$i%02d").mkString(" ")
    val S2 = (1 to 16).map(i => f"t$i%02d").mkString(" ")
    val mid = (1 to 16).map(i => s"m$i").mkString(" ")
    val mid2 = (1 to 16).map(i => s"w$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-spans").toString
    val rows = Seq(
      (0L, B + " xtail", "en", "s"),
      (1L, B + " ytail", "en", "s"),
      (2L, S1 + " " + mid + " " + S2, "en", "s"),
      (3L, S1 + " " + mid2 + " " + S2, "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q223_dup_spans")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val byDoc = out.groupBy(_._1)
    // the mirrored block is ONE maximal span per doc
    assert(byDoc(0L).toSeq == Seq((0L, 0L, 25L, 400L, 2L, 25L, 400L)),
      s"doc0: ${byDoc(0L).toSeq}")
    assert(byDoc(1L).toSeq == Seq((1L, 0L, 25L, 400L, 2L, 25L, 400L)),
      s"doc1: ${byDoc(1L).toSeq}")
    // gap between the two shared blocks splits the runs
    assert(byDoc(2L).toSeq.sortBy(_._2) == Seq(
      (2L, 0L, 1L, 16L, 2L, 1L, 32L), (2L, 2L, 1L, 16L, 2L, 1L, 32L)),
      s"doc2: ${byDoc(2L).toSeq}")
    assert(byDoc(3L).toSeq.sortBy(_._2) == Seq(
      (3L, 0L, 1L, 16L, 2L, 1L, 32L), (3L, 2L, 1L, 16L, 2L, 1L, 32L)),
      s"doc3: ${byDoc(3L).toSeq}")
  }

  test("q223 runs are row-identical to a driver-side merge on real docs") {
    // recompute the whole pipeline in plain Scala over the sf0.001
    // corpus: tokenize, 16-token segments, df by md5, merge adjacent
    // duplicated segments into maximal runs — the query must match
    // EXACTLY (same grain, same measures)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def segsOf(text: String): Seq[(Int, Int, String)] = {
      val tk = text.split(" ").filter(_.nonEmpty)
      tk.grouped(16).zipWithIndex.map { case (seg, i) =>
        (i, seg.length, md5hex(seg.mkString(" ")))
      }.toSeq
    }
    val all = docs.filter(_._2.split(" ").exists(_.nonEmpty))
      .map { case (id, t) => id -> segsOf(t) }
    val df = scala.collection.mutable.Map[String, Set[Long]]()
    all.foreach { case (id, segs) =>
      segs.foreach { case (_, _, h) => df(h) = df.getOrElse(h, Set()) + id }
    }
    val expected = all.flatMap { case (id, segs) =>
      val dup = segs.filter { case (_, _, h) => df(h).size >= 2 }
      // maximal adjacent runs over the surviving indices
      val runs = dup.foldLeft(List.empty[List[(Int, Int, String)]]) {
        case (acc, s) => acc match {
          case cur :: rest if cur.head._1 == s._1 - 1 => (s :: cur) :: rest
          case _ => List(s) :: acc
        }
      }.reverse.map(_.reverse)
      val runRows = runs.map { r =>
        (id, r.head._1.toLong, r.length.toLong,
          r.map(_._2).sum.toLong,
          r.map(x => df(x._3).size).min.toLong)
      }
      if (runRows.isEmpty) Nil
      else {
        val longest = runRows.map(_._3).max
        val mass = runRows.map(_._4).sum
        runRows.map(t => (t._1, t._2, t._3, t._4, t._5, longest, mass))
      }
    }.toSet
    val got = SparkEntry.queries("q223_dup_spans")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q276 catches a 10-token MISALIGNED cross-doc duplicate that q223's fixed grid misses") {
    // the r9 verdict's named residual: a duplicated passage shorter
    // than 16 tokens whose copies sit at DIFFERENT offsets. Crafted
    // phrase (verified md5 boundary classes): `india` and `mike` open
    // segments (md5 hex 0/1); alpha..golf and hotel do not — so the
    // content-defined segment `india alpha bravo charlie delta echo
    // foxtrot golf` (8 tokens) exists INSIDE both copies wherever
    // they sit, while every fixed 16-token segment of either doc
    // mixes in non-shared context.
    val P = "india alpha bravo charlie delta echo foxtrot golf mike hotel"
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val rows = Seq(
      (0L, P + " juliet kilo lima november", "en", "s"), // phrase at tok 0
      (1L, "romeo sierra tango " + P + " oscar quebec victor", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q276_dup_spans_cdc")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 0L, 1L, 8L, 2L), (1L, 3L, 1L, 8L, 2L)),
      s"got ${got.toSeq}")
    // and q223 (fixed 16-token grid) is provably blind to it
    val q223 = SparkEntry.queries("q223_dup_spans")(spark, tmp).collect()
    assert(q223.isEmpty, s"q223 unexpectedly found ${q223.length} spans")
  }

  test("q276 runs are row-identical to a driver-side CDC merge on real docs") {
    // full-pipeline recompute in plain Scala over sf0.001: tokenize,
    // content-defined boundaries (md5 hex 0/1), segment digests, df,
    // adjacent-run merge, span_tokens >= 8 — must match EXACTLY
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def segsOf(text: String): Seq[(Long, Int, Int, String)] = {
      val tk = text.split(" ").filter(_.nonEmpty)
      if (tk.isEmpty) return Nil
      var sid = 0L
      val withSid = tk.zipWithIndex.map { case (t, i) =>
        if ("01".contains(md5hex(t).head)) sid += 1
        (sid, i, t)
      }
      withSid.groupBy(_._1).toSeq.map { case (s, xs) =>
        (s, xs.map(_._2).min, xs.length,
          md5hex(xs.sortBy(_._2).map(_._3).mkString(" ")))
      }
    }
    val all = docs.map { case (id, t) => id -> segsOf(t) }
      .filter(_._2.nonEmpty)
    val df = scala.collection.mutable.Map[String, Set[Long]]()
    all.foreach { case (id, segs) =>
      segs.foreach { case (_, _, _, h) =>
        df(h) = df.getOrElse(h, Set()) + id }
    }
    val expected = all.flatMap { case (id, segs) =>
      val dup = segs.filter { case (_, _, _, h) => df(h).size >= 2 }
        .sortBy(_._1)
      val runs = dup.foldLeft(List.empty[List[(Long, Int, Int, String)]]) {
        case (acc, s) => acc match {
          case cur :: rest if cur.head._1 == s._1 - 1 => (s :: cur) :: rest
          case _ => List(s) :: acc
        }
      }.reverse.map(_.reverse)
      runs.map { r =>
        (id, r.head._2.toLong, r.length.toLong,
          r.map(_._3).sum.toLong,
          r.map(x => df(x._4).size).min.toLong)
      }.filter(_._4 >= 8L)
    }.toSet
    val got = SparkEntry.queries("q276_dup_spans_cdc")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q77 scores corpus-typical text low and rare-continuation text high") {
    // docs 0-3 share one dominant bigram chain, so their continuations
    // are corpus-typical (low -ln p). Doc 4 uses the SAME frequent
    // start words (the/cat/on/and) but never-seen continuations — the
    // signature of keyboard-mash/wrong-language text under a bigram
    // LM — so its mean -ln p(w2|w1) must be the strict maximum. (A
    // doc of globally-unique bigrams would NOT score high: a once-seen
    // start word predicts its only continuation with p = 1.)
    val common = "the cat sat on the mat and " * 4 + "the cat"
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm").toString
    val rows = Seq(
      (0L, common, "en", "s"),
      (1L, common, "en", "s"),
      (2L, common, "en", "s"),
      (3L, "the cat sat on the mat", "en", "s"),
      (4L, "the zq cat xv on qj and wz", "en", "s"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q77_lm_score")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size == 5)
    val nToks = Map(0L -> 30L, 1L -> 30L, 2L -> 30L, 3L -> 6L, 4L -> 8L)
    out.foreach { case (id, (nb, _)) =>
      assert(nb == nToks(id) - 1, s"doc $id n_bigrams $nb") }
    val rareNll = out(4L)._2
    out.filter(_._1 != 4L).foreach { case (id, (_, nll)) =>
      assert(nll < rareNll, s"doc $id nll $nll !< rare $rareNll") }
    // p(w2|w1) <= 1 always (bc <= sc), so every score is nonnegative
    out.foreach { case (id, (_, nll)) => assert(nll >= 0.0, s"doc $id") }
  }
}
