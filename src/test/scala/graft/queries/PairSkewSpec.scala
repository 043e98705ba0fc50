package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The hot-shingle salt guard must be a pure shuffle-layout change:
  * the exact pair set (and every inter_cnt/jaccard value) out of the
  * salted path must equal the plain inverted-index self-join's. The
  * fixture injects one ubiquitous shingle (df = every doc) — the
  * boilerplate-header scenario that pins one reducer unsalted.
  */
class PairSkewSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // 40 docs; ALL contain hot shingle 7L. Docs 2k/2k+1 additionally
    // share {k*100+1, k*100+2, k*100+3} → jaccard 4/6 ≥ 0.5 per pair
    // (hot included); docs also carry one unique shingle each, and
    // docs not in a pair stay below threshold with any partner.
    (0 until 40).map { i =>
      val k = i / 2
      val shared = Seq(7L, k * 100L + 1, k * 100L + 2, k * 100L + 3)
      (i.toLong, shared :+ (1000000L + i))
    }.toDF("doc_id", "s")
  }

  private def collectPairs(hotDf: Int) =
    DedupQueries.pairsFromShingles(fixture, hotDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("salted hot-shingle path yields the identical exact pair set") {
    val plain = collectPairs(hotDf = Int.MaxValue) // guard disabled
    val salted = collectPairs(hotDf = 4) // shingle 7 (df=40) goes hot
    assert(plain.nonEmpty, "fixture should produce near-dup pairs")
    assert(plain == salted,
      s"pair sets differ: only-plain=${plain -- salted}, only-salted=${salted -- plain}")
    // the designed pairs are present with the designed jaccard 4/6
    assert(plain.contains((0L, 1L, 4L, 4.0 / 6.0)))
    assert(plain.size == 20, s"expected exactly the 20 designed pairs, got ${plain.size}")
  }

  test("corpus-scaled (relative) hot threshold yields the identical pair set") {
    // the miners' threshold is max(hotDf, MinerRelativeHot × mean df):
    // this fixture's mean df is 200/61 ≈ 3.3, so with hotDf = 1 the
    // RELATIVE arm (≈ 13) binds — only the ubiquitous shingle 7
    // (df = 40) salts, while the 60 balanced keys an absolute df > 1
    // threshold would have fanned out stay on the cold path. Either
    // way the pair set (and every score) must be identical: the
    // threshold picks shuffle layout, never semantics.
    val plain = collectPairs(hotDf = Int.MaxValue)
    val relative = collectPairs(hotDf = 1)
    assert(plain == relative,
      s"pair sets differ: only-plain=${plain -- relative}, " +
        s"only-relative=${relative -- plain}")
    assert(relative.size == 20)
  }

  test("salted co-assignment join (q54 shape) is identical, payloads intact") {
    import spark.implicits._
    // 40 vectors, 2 IVF assignments each; list 0 is DOMINANT (every
    // vector's first assignment — the skewed-corpus scenario where one
    // list's |list|² pair enumeration would pin a reducer), the second
    // assignment spreads over lists 1..4. Each row carries a payload
    // (the vector stand-in) that must ride the join unharmed.
    val occ = (0 until 40).flatMap { i =>
      Seq((0L, i.toLong, i * 1.5), (1L + i % 4, i.toLong, i * 1.5))
    }.toDF("cent_id", "vec_id", "nrm")
    def cands(hotDf: Int, rel: Double = 0.0) = graft.operators.SkewJoin
      .saltedSelfJoin(occ, "cent_id", "vec_id", hotDf, relativeHot = rel)
      .select("vec_id_a", "nrm_a", "vec_id_b", "nrm_b").distinct()
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val plain = cands(Int.MaxValue) // guard disabled
    val salted = cands(4) // list 0 (and lists 1..4, df=8..10) go hot
    assert(plain == salted,
      s"candidate sets differ: only-plain=${plain -- salted}, only-salted=${salted -- plain}")
    // adaptive threshold (q54's form): mean df = 80/5 = 16, so with
    // relativeHot = 2 only the dominant list 0 (df = 40 > 32) salts
    assert(cands(4, rel = 2.0) == plain, "relative-hot split must be identical")
    // the dominant list co-assigns every vector with every other, and
    // each side's payload is its own
    assert(plain.size == 40 * 39 / 2)
    assert(plain.forall { case (a, na, b, nb) => na == a * 1.5 && nb == b * 1.5 })
  }
}
