package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental invariant: full-recompute pairs over corpus ∪ delta
  * must equal standing corpus pairs ∪ delta-touching pairs — on a
  * fixture with cross pairs (delta doc near-dups a corpus doc), within
  * pairs (two near-identical delta docs), standing pairs (corpus-only
  * near-dups, untouched by the delta), and unrelated docs.
  */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def shingleFrame(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"),
        graft.queries.DedupQueries.shingleHashes(col("tk")).as("s"))
      .filter(size(col("s")) > 0)

  private def pairSet(df: DataFrame) = df
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  test("pairs(corpus ∪ delta) == pairs(corpus) ∪ deltaPairs(corpus, delta)") {
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$base a1"), (2L, s"$base a2"), // standing near-dup pair
      (3L, "completely different text with many unique tokens here"))
    val delta = Seq(
      (10L, s"$base b1"), // cross: near-dups 1 and 2
      (11L, "fresh delivery item one two three four five six"),
      (12L, "fresh delivery item one two three four five seven")) // within pair
    val cs = shingleFrame(corpus)
    val ds = shingleFrame(delta)

    val full = pairSet(graft.queries.DedupQueries
      .pairsFromShingles(cs.unionByName(ds), hotDf = Int.MaxValue))
    val standing = pairSet(graft.queries.DedupQueries
      .pairsFromShingles(cs, hotDf = Int.MaxValue))
    val deltaTouching = pairSet(IncrementalDedup.deltaPairs(cs, ds))

    assert(standing.union(deltaTouching) == full,
      s"missing=${full -- standing -- deltaTouching} " +
        s"extra=${standing.union(deltaTouching) -- full}")
    // the interesting shapes actually occurred
    assert(deltaTouching.exists { case (a, b, _, _) => a <= 2 && b == 10L },
      "expected a cross (delta x corpus) pair")
    assert(deltaTouching.exists { case (a, b, _, _) => a == 11L && b == 12L },
      "expected a within-delta pair")
    assert(standing.exists { case (a, b, _, _) => a == 1L && b == 2L },
      "expected a standing corpus pair")
    assert(standing.intersect(deltaTouching).isEmpty)
  }

  test("candidates(corpus ∪ delta) == candidates(corpus) ∪ deltaCandidates") {
    // the stored pair_candidates artifact (both measures, containment
    // floor) maintains incrementally exactly like the jaccard pairs —
    // the fixture includes a chunk wholly contained in a corpus doc,
    // which only the containment measure retains at the floor
    val corpus = Seq(
      (1L, (1 to 20).map(i => s"c$i").mkString(" ")),
      (2L, "completely different text with many unique tokens here"))
    val delta = Seq(
      (10L, (5 to 10).map(i => s"c$i").mkString(" ")), // chunk of doc 1
      (11L, "fresh delivery item one two three four five six"))
    val cs = shingleFrame(corpus)
    val ds = shingleFrame(delta)

    def candSet(df: DataFrame) = df
      .select("doc_a", "doc_b", "inter_cnt", "jaccard", "containment")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet

    val full = candSet(graft.queries.DedupQueries
      .candidatesFromShingles(cs.unionByName(ds), hotDf = Int.MaxValue))
    val standing = candSet(graft.queries.DedupQueries
      .candidatesFromShingles(cs, hotDf = Int.MaxValue))
    val deltaTouching = candSet(IncrementalDedup.deltaCandidates(cs, ds))

    assert(standing.union(deltaTouching) == full,
      s"missing=${full -- standing -- deltaTouching} " +
        s"extra=${standing.union(deltaTouching) -- full}")
    // the chunk pair is a containment-only candidate: jaccard below
    // 0.5, containment 1.0
    assert(deltaTouching.exists { case (a, b, _, j, c) =>
      a == 1L && b == 10L && j < 0.5 && c == 1.0 },
      s"expected the contained chunk at containment 1.0: $deltaTouching")
  }

  test("a delta id colliding with the corpus fails loudly, never self-pairs") {
    val cs = shingleFrame(Seq((1L, "one two three four five six")))
    val ds = shingleFrame(Seq((1L, "one two three four five seven")))
    // lazy per-row guard: throws when the clashing rows actually join
    val e = intercept[Exception] {
      IncrementalDedup.deltaPairs(cs, ds).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("collides")), messages(e).mkString("|"))
  }
}
