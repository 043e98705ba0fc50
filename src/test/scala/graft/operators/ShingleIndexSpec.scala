package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucket-pruned postings mine (r13 verdict ask #1):
  *   - the postings derivation agrees bit-for-bit with the doc-keyed
  *     shingle index (`g` sets equal per doc, `n` = |s|, `w1h` = the
  *     seed-42 hash of the window's first token);
  *   - pruned-read candidates ≡ the full-read
  *     [[IncrementalDedup.deltaCandidates]] on a fixture with cross,
  *     within, replacement, and unrelated shapes;
  *   - the maintained artifact equals the one-pass rebuild after any
  *     batch sequence, and the upsert is idempotent under replay;
  *   - the mine is replay-stable: AFTER the batch's postings commit
  *     lands, mining the same batch again returns the same candidates
  *     (the anti-join reproduces the pre-batch standing side).
  */
class ShingleIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val Buckets = 16

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def shingleFrame(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      graft.queries.DedupQueries.shingleHashes(
        ShingleIndex.tokensOf(col("text"))).as("s"))
      .filter(size(col("s")) > 0)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  private val base = (1 to 12).map(i => s"w$i").mkString(" ")
  private val corpus = Seq(
    (1L, s"$base a1"), (2L, s"$base a2"), // standing near-dup pair
    (3L, "completely different text with many unique tokens here"),
    (4L, "short"), // below 3 tokens: no shingles, no postings
    (5L, "another standing doc that shares nothing with the batch"))
  private val delta = Seq(
    (10L, s"$base b1"), // cross: near-dups 1 and 2
    (11L, "fresh delivery item one two three four five six"),
    (12L, "fresh delivery item one two three four five seven")) // within

  private def candSet(df: DataFrame) = df
    .select(col("doc_a"), col("doc_b"), col("inter_cnt").cast("long"),
      col("na").cast("long"), col("nb").cast("long"),
      round(col("jaccard"), 9), round(col("containment"), 9))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6)))
    .toSet

  test("postings agree with the doc-keyed shingle derivation") {
    val d = docs(corpus ++ delta)
    val p = ShingleIndex.postings(d)
    val byDoc = p.groupBy(col("doc_id"))
      .agg(collect_set(col("g")).as("gs"), first(col("n")).as("n"),
        count(lit(1)).as("rows"))
    val sh = shingleFrame(d)
      .select(col("doc_id"), col("s"), size(col("s")).cast("long").as("m"))
    val joined = byDoc.join(sh, Seq("doc_id"), "full_outer").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // every doc with shingles has postings and vice versa
      assert(!r.isNullAt(1) && !r.isNullAt(4), s"one-sided doc: $r")
      val gs = r.getSeq[Long](1).toSet
      val ss = r.getSeq[Long](4).toSet
      assert(gs == ss, s"g mismatch for doc ${r.get(0)}")
      assert(r.getLong(2) == r.getLong(5), s"n != |s| for doc ${r.get(0)}")
      assert(r.getLong(3) == gs.size, "one row per distinct g")
    }
    // w1h is the seed-42 xxhash64 of the FIRST token: cross-check one
    // doc against the SQL builtin on the derived first trigram tokens
    val w1 = ShingleIndex.postings(docs(Seq((99L, "alpha beta gamma"))))
      .select(col("w1h")).head().getLong(0)
    val expect = spark.sql("SELECT xxhash64('alpha')").head().getLong(0)
    assert(w1 == expect, "w1h must be xxhash64(first token) at seed 42")
  }

  test("pruned mine ≡ full-read deltaCandidates (fresh delta ids)") {
    val root = tmp("si-mine") + "/postings"
    ShingleIndex.bootstrap(spark, root, docs(corpus), Buckets)
    val deltaP = ShingleIndex.postings(docs(delta))
    val batchIds = delta.map(_._1).toDF("doc_id")
    val full = IncrementalDedup.deltaCandidates(
      shingleFrame(docs(corpus)), shingleFrame(docs(delta)))
    val pruned = ShingleIndex.deltaCandidates(
      spark, root, deltaP, batchIds,
      floor = graft.queries.DedupQueries.CandidateFloor).get
    assert(candSet(pruned) == candSet(full),
      s"missing=${candSet(full) -- candSet(pruned)} " +
        s"extra=${candSet(pruned) -- candSet(full)}")
    // the interesting shapes actually occurred
    val pairs = candSet(pruned).map(c => (c._1, c._2))
    assert(pairs.exists { case (a, b) => a <= 2 && b == 10L }, "cross")
    assert(pairs.contains((11L, 12L)), "within")
  }

  test("pruned mine drops replaced standing docs (replacement batch)") {
    val root = tmp("si-repl") + "/postings"
    ShingleIndex.bootstrap(spark, root, docs(corpus), Buckets)
    // doc 2 is REPLACED with unrelated text: its old postings must not
    // pair with the delta even though they stand in the index
    val repl = Seq((2L, "totally new content for doc two replacing it"),
      (10L, s"$base b1"))
    val deltaP = ShingleIndex.postings(docs(repl))
    val batchIds = repl.map(_._1).toDF("doc_id")
    val standingMinus = shingleFrame(docs(corpus.filterNot(_._1 == 2L)))
    val full = IncrementalDedup.deltaCandidates(
      standingMinus, shingleFrame(docs(repl)))
    val pruned = ShingleIndex.deltaCandidates(
      spark, root, deltaP, batchIds,
      floor = graft.queries.DedupQueries.CandidateFloor).get
    assert(candSet(pruned) == candSet(full))
    val pairs = candSet(pruned).map(c => (c._1, c._2))
    assert(pairs.contains((1L, 10L)), "cross pair with the survivor")
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L },
      "no pair against the replaced doc's OLD content at full strength" +
        " unless the new content pairs")
  }

  test("maintained artifact ≡ one-pass rebuild; upsert idempotent") {
    val root = tmp("si-upsert") + "/postings"
    def state(): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(root)
        .select(col("doc_id"), col("w1h"), col("g"), col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    def rebuilt(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] =
      ShingleIndex.postings(docs(rows))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    // batch 1 creates the table
    val b1 = corpus
    val t1 = ShingleIndex.upsert(spark, root, ShingleIndex.postings(docs(b1)),
      ShingleIndex.postings(docs(b1).limit(0)), b1.map(_._1).toDF("doc_id"),
      Buckets)
    assert(t1 > 0 && state() == rebuilt(b1))
    // batch 2 adds fresh docs AND replaces doc 2 with unrelated text
    val b2 = Seq((2L, "totally new content for doc two replacing it"),
      (10L, s"$base b1"), (11L, "fresh delivery item one two three four"))
    val old2 = ShingleIndex.postings(
      docs(corpus.filter(r => b2.map(_._1).contains(r._1))))
    val t2 = ShingleIndex.upsert(spark, root, ShingleIndex.postings(docs(b2)),
      old2, b2.map(_._1).toDF("doc_id"), Buckets)
    val want = corpus.filterNot(r => b2.map(_._1).contains(r._1)) ++ b2
    assert(t2 > 0 && state() == rebuilt(want),
      "upsert must equal the one-pass rebuild of the merged corpus")
    // replay of batch 2 AFTER it landed: old postings now derive from
    // the POST-batch corpus (the crash-after-commit shape) — state
    // must not change
    val old2Replay = ShingleIndex.postings(
      docs(want.filter(r => b2.map(_._1).contains(r._1))))
    ShingleIndex.upsert(spark, root, ShingleIndex.postings(docs(b2)),
      old2Replay, b2.map(_._1).toDF("doc_id"), Buckets)
    assert(state() == rebuilt(want), "replayed upsert must be a no-op")
    // recorded layout wins over a different later parameter
    assert(ShingleIndex.recordedBuckets(spark, root).contains(Buckets))
    ShingleIndex.upsert(spark, root,
      ShingleIndex.postings(docs(Seq((20L, "one more tiny doc arriving")))),
      ShingleIndex.postings(docs(b2).limit(0)), Seq(20L).toDF("doc_id"),
      numBuckets = 999)
    assert(ShingleIndex.recordedBuckets(spark, root).contains(Buckets),
      "bucket count is fixed at creation")
    assert(state() == rebuilt(want :+ (20L, "one more tiny doc arriving")))
  }

  test("mine is replay-stable after its own postings commit") {
    val root = tmp("si-replay") + "/postings"
    ShingleIndex.bootstrap(spark, root, docs(corpus), Buckets)
    val deltaP = ShingleIndex.postings(docs(delta))
    val batchIds = delta.map(_._1).toDF("doc_id")
    val floor = graft.queries.DedupQueries.CandidateFloor
    val before = candSet(
      ShingleIndex.deltaCandidates(spark, root, deltaP, batchIds, floor).get)
    // the batch's postings commit lands (crash before the corpus
    // commit); the replayed mine must still see the pre-batch corpus
    ShingleIndex.upsert(spark, root, deltaP,
      ShingleIndex.postings(docs(delta).limit(0)), batchIds, Buckets)
    val after = candSet(
      ShingleIndex.deltaCandidates(spark, root, deltaP, batchIds, floor).get)
    assert(after == before, "mine must be stable across its own commit")
  }
}
