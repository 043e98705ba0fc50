package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The incremental-PQ invariant — [[IncrementalVectorsSpec]]'s pattern
  * applied to product-quantization codes: at FIXED codebooks, encoding
  * corpus and delta separately and unioning equals encoding the union
  * in one pass, so a delta never forces a corpus re-encode. Plus the
  * code-drift trigger's extremes, and the Euclidean-assignment
  * correctness of the augmented-centroid trick (the module rides the
  * max-dot NearestCentroids expression; this is where argmin-L2 ≡
  * argmax-augmented-dot is actually proved against a brute force).
  */
class IncrementalPqSpec extends SparkTestBase {

  private lazy val emb =
    graft.sources.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))

  private lazy val books = IncrementalPq.fitBooks(emb, "embedding", "vec_id")

  test("encode(corpus ∪ delta) == encode(corpus) ∪ encode(delta) at fixed books") {
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), (1 to IncrementalPq.M).map(r.getInt).toList))
      .toSet
    val full = rows(IncrementalPq.encode(emb, books))
    val incremental = rows(IncrementalPq.encode(corpus, books)) ++
      rows(IncrementalPq.encode(delta, books))
    assert(full.nonEmpty && full == incremental,
      "incremental encode must equal the one-pass rebuild")
    val schema = IncrementalPq.encode(delta, books).schema.fieldNames.toSeq
    assert(schema == "vec_id" +: (0 until IncrementalPq.M).map(m => s"c$m"))
  }

  test("the augmented max-dot assignment IS the Euclidean argmin") {
    val got = IncrementalPq.encode(emb, books).collect()
      .map(r => r.getLong(0) -> (1 to IncrementalPq.M).map(r.getInt).toList)
      .toMap
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(vecs.nonEmpty)
    vecs.foreach { case (id, v) =>
      val want = (0 until IncrementalPq.M).map { m =>
        val sub = v.slice(m * IncrementalPq.Dsub,
          math.min((m + 1) * IncrementalPq.Dsub, v.length))
        // brute-force argmin ||sub - c||², first index wins ties
        books(m).zipWithIndex.minBy { case (c, j) =>
          val d2 = c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, j)
        }._2
      }.toList
      assert(got(id) == want, s"vec $id: got ${got(id)} want $want")
    }
  }

  test("a delta distributed like the corpus does not trigger a refit") {
    val corpus = IncrementalPq.encode(emb.filter(col("vec_id") % 2 === 0), books)
    val delta = IncrementalPq.encode(emb.filter(col("vec_id") % 2 =!= 0), books)
    val drift = IncrementalPq.codeDrift(corpus, delta)
    assert(drift < IncrementalPq.DefaultDriftThreshold,
      s"even split should not drift, got $drift")
    assert(!IncrementalPq.needsRefit(corpus, delta))
  }

  test("an empty delta carries no drift evidence and never triggers a refit") {
    val corpus = IncrementalPq.encode(emb, books)
    val empty = IncrementalPq.encode(emb.filter(col("vec_id") < 0), books)
    assert(IncrementalPq.codeDrift(corpus, empty) == 0.0)
    assert(!IncrementalPq.needsRefit(corpus, empty))
  }

  test("a delta collapsed onto one vector's codes triggers the refit") {
    import spark.implicits._
    val corpus = IncrementalPq.encode(emb, books)
    val one = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<float>")).collect()
      .head.getSeq[Float](0)
    val delta = IncrementalPq.encode(
      (1000L to 1063L).map(i => (i, one)).toDF("vec_id", "embedding"),
      books)
    val drift = IncrementalPq.codeDrift(corpus, delta)
    assert(drift > IncrementalPq.DefaultDriftThreshold,
      s"a collapsed delta must drift, got $drift")
    assert(IncrementalPq.needsRefit(corpus, delta))
  }
}
