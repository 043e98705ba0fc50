package graft.functions

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** BPE tokenizer: training determinism, encode/round-trip laws, the
  * q74 surface, and the [[graft.queries.TextQueries.BpeFlag]] re-basing
  * of the token-mass queries.
  */
class BpeTokenizerSpec extends SparkTestBase {

  // the classic Sennrich example corpus: 'es' then 'est' merge first
  private val toy = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training is deterministic and follows weighted pair frequency") {
    val m1 = Bpe.train(toy, 8)
    val m2 = Bpe.train(toy, 8)
    assert(m1 == m2, "same input must learn the same merges")
    assert(m1.nonEmpty)
    // most frequent pair over the weighted corpus: ('e','s') occurs in
    // newest(6) + widest(3) = 9, more than any other adjacent pair
    assert(m1.head == ("e", "s"))
    // the merged symbol participates in later merges: ('es','t') = 9
    assert(m1(1) == ("es", "t"))
    // shuffled input order learns the same table (order-independence)
    assert(Bpe.train(toy.reverse, 8) == m1)
  }

  test("encode: rank priority, round-trip, degenerate inputs") {
    val merges = Bpe.train(toy, 8)
    val rank = Bpe.ranks(merges)
    // a trained word compresses below its character count
    val newest = Bpe.encode("newest", rank)
    assert(newest.length < "newest".length + 1)
    // round-trip law: concatenating tokens and stripping the end
    // marker reconstructs the word — for trained AND unseen words
    // incl. non-BMP text: symbols are code points, not UTF-16 units —
    // a surrogate pair must never split into two broken symbols
    for (w <- Seq("low", "lower", "newest", "widest", "unseen", "zzz", "a",
        "café", "😀x😀", "漢字"))
      assert(Bpe.encode(w, rank).mkString.stripSuffix(Bpe.EndOfWord) == w,
        s"round-trip failed for $w")
    assert(Bpe.encode("😀", Bpe.ranks(Vector.empty)).length == 2,
      "an emoji is ONE symbol plus the end marker")
    assert(Bpe.encode("", rank).isEmpty)
    // no merges: a word is its characters plus the end marker
    assert(Bpe.encode("abc", Bpe.ranks(Vector.empty)).toSeq ==
      Seq("a", "b", "c", Bpe.EndOfWord))
  }

  test("q74: BPE masses bounded by words below and characters above") {
    val df = SparkEntry.queries("q74_bpe_token_count")(spark, sf()).cache()
    assert(df.count() > 0)
    val rows = df.collect()
    rows.foreach { r =>
      val ws = r.getAs[Long]("sum_ws_tokens")
      val bpe = r.getAs[Long]("sum_bpe_tokens")
      // every word is at least one token…
      assert(bpe >= ws, s"source ${r.get(0)}: bpe=$bpe < words=$ws")
      // …and the merges actually compress well below chars-per-word
      assert(r.getAs[Double]("subword_per_word") < 3.0,
        s"source ${r.get(0)} barely compressed")
    }
    df.unpersist()
    // the corpus-level expression agrees with a driver-side re-encode
    // on a sampled document (same merges, same pre-tokenization)
    val merges = BpeVocab.merges(spark, sf())
    val rank = Bpe.ranks(merges.toIndexedSeq)
    val doc = graft.sources.Tables(spark, sf(), "documents")
      .orderBy("doc_id").select("text").head().getString(0)
    val expected = doc.split(" ").filter(_.nonEmpty)
      .map(w => Bpe.encode(w, rank).length.toLong).sum
    val got = graft.sources.Tables(spark, sf(), "documents")
      .orderBy("doc_id").limit(1)
      .select(BpeVocab.tokenCount(col("text"), merges).as("n"))
      .head().getLong(0)
    assert(got == expected)
  }

  test("BpeFlag re-bases q32/q69/q72 token masses; default stays whitespace") {
    val flagged = spark.newSession()
    flagged.conf.set(graft.queries.TextQueries.BpeFlag, "true")
    // tight merge budget: the fixture's synthetic vocabulary is ~31
    // words, which any generous budget fully merges into single tokens
    // (BPE == whitespace, correct but invisible) — 12 merges leave
    // real subword splits to observe
    flagged.conf.set(BpeVocab.MergeBudgetConf, "12")
    // q32's subword column becomes the real BPE count — strictly at
    // least the word count, where the regex approximation on the
    // fixture text is not guaranteed to be
    val base = SparkEntry.queries("q32_token_count")(spark, sf())
      .orderBy("source").collect()
    val bpe = SparkEntry.queries("q32_token_count")(flagged, sf())
      .orderBy("source").collect()
    assert(base.map(_.getAs[Long]("sum_ws_tokens")).toSeq ==
      bpe.map(_.getAs[Long]("sum_ws_tokens")).toSeq,
      "whitespace masses must not move with the flag")
    assert(base.map(_.getAs[Long]("sum_re_tokens")).toSeq !=
      bpe.map(_.getAs[Long]("sum_re_tokens")).toSeq,
      "subword masses must re-base under the flag")
    // q69 still mixes (rates derive from BPE masses), q72 still chunks
    // (chunk grain = BPE tokens) — both run and return rows
    assert(SparkEntry.queries("q69_domain_mix")(flagged, sf()).count() > 0)
    val chunks = SparkEntry.queries("q72_doc_chunks")(flagged, sf())
    assert(chunks.count() >
      SparkEntry.queries("q72_doc_chunks")(spark, sf()).count(),
      "finer BPE grain must produce at least as many chunks")
  }
}
