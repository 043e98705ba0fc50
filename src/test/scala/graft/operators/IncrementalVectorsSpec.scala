package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The incremental-IVF invariant, the [[IncrementalDedupSpec]] pattern
  * applied to vectors: at FIXED centroids, assigning corpus and delta
  * separately and unioning equals assigning the union in one pass —
  * so a delta never forces a corpus re-scan. Plus the staleness
  * trigger: a delta distributed like the corpus does not demand a
  * refit; a delta piling into one list does.
  */
class IncrementalVectorsSpec extends SparkTestBase {

  private lazy val emb =
    graft.sources.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))

  private lazy val cents = graft.functions.KMeansLite.fit(
    emb.withColumn("nrm", lit(1.0)), "embedding", "vec_id", k = 8)

  test("assign(corpus ∪ delta) == assign(corpus) ∪ assignDelta(delta) at fixed centroids") {
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    val full = rows(IncrementalVectors.assignDelta(emb, cents))
    val incremental = rows(IncrementalVectors.assignDelta(corpus, cents)) ++
      rows(IncrementalVectors.assignDelta(delta, cents))
    assert(full.nonEmpty && full == incremental,
      "incremental assignment must equal the one-pass rebuild")
    // and the output carries the stored-index schema
    val schema = IncrementalVectors.assignDelta(delta, cents).schema.fieldNames.toSeq
    assert(schema == Seq("vec_id", "embedding", "nrm", "cids"))
  }

  test("a delta distributed like the corpus does not trigger a refit") {
    val corpus = IncrementalVectors.assignDelta(
      emb.filter(col("vec_id") % 2 === 0), cents)
    val delta = IncrementalVectors.assignDelta(
      emb.filter(col("vec_id") % 2 =!= 0), cents)
    val drift = IncrementalVectors.balanceDrift(corpus, delta)
    assert(drift < 0.25, s"even split should not drift, got $drift")
    assert(!IncrementalVectors.needsRefit(corpus, delta))
  }

  test("an empty delta carries no drift evidence and never triggers a refit") {
    val corpus = IncrementalVectors.assignDelta(emb, cents)
    val empty = IncrementalVectors.assignDelta(
      emb.filter(col("vec_id") < 0), cents)
    assert(IncrementalVectors.balanceDrift(corpus, empty) == 0.0)
    assert(!IncrementalVectors.needsRefit(corpus, empty))
  }

  test("a delta piling into one list triggers the refit") {
    import spark.implicits._
    val corpus = IncrementalVectors.assignDelta(emb, cents)
    // delta: many copies of one corpus vector (plus distinct ids) —
    // every row lands in the same first-choice list
    val one = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val delta = (10000L until 10040L).map(i => (i, one)).toDF("vec_id", "embedding")
    val assignedDelta = IncrementalVectors.assignDelta(delta, cents)
    assert(assignedDelta.select(element_at(col("cids"), 1)).distinct().count() == 1)
    val drift = IncrementalVectors.balanceDrift(corpus, assignedDelta)
    assert(drift > 0.25, s"single-list delta must drift, got $drift")
    assert(IncrementalVectors.needsRefit(corpus, assignedDelta))
  }
}
