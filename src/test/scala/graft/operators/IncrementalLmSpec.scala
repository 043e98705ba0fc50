package graft.operators

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** The LM maintenance invariant: counts are additive, so incremental
  * merge is EXACTLY a rebuild — plus the OOV contract for scoring
  * unseen text against a standing model.
  */
class IncrementalLmSpec extends SparkTestBase {

  private def docs = graft.sources.Tables(spark, sf(), "documents")

  test("merge(fit(corpus), delta) ≡ fit(corpus ∪ delta) — exact counts") {
    val corpus = docs.filter(col("doc_id") < 30)
    val delta = docs.filter(col("doc_id") >= 30 && col("doc_id") < 45)
    val incr = IncrementalLm.merge(IncrementalLm.fit(corpus), delta)
    val rebuild = IncrementalLm.fit(corpus.unionByName(delta))
    assert(incr.exceptAll(rebuild).isEmpty && rebuild.exceptAll(incr).isEmpty)
    // and the derived cost tables agree entry-for-entry
    val ci = IncrementalLm.costTable(incr)
    val cr = IncrementalLm.costTable(rebuild)
    assert(ci.exceptAll(cr).isEmpty && cr.exceptAll(ci).isEmpty)
  }

  test("merging an empty delta is a no-op") {
    val base = IncrementalLm.fit(docs)
    val merged = IncrementalLm.merge(base, docs.filter(col("doc_id") < 0))
    assert(merged.exceptAll(base).isEmpty && base.exceptAll(merged).isEmpty)
  }

  test("q77 is score(corpus, costTable(fit(corpus))) — one definition") {
    val viaOperator = IncrementalLm.score(docs,
      IncrementalLm.costTable(IncrementalLm.fit(docs)), oovCostMicro = 0L)
    val viaQuery = SparkEntry.queries("q77_lm_score")(spark, sf())
    assert(viaOperator.exceptAll(viaQuery).isEmpty &&
      viaQuery.exceptAll(viaOperator).isEmpty)
  }

  test("scoring unseen text prices every bigram at the OOV cost, drops none") {
    val counts = IncrementalLm.fit(docs)
    val oov = IncrementalLm.oovCost(counts)
    assert(oov > 0L)
    val fresh = spark.createDataFrame(Seq(
      (9001L, "zzq vvk qqj wwx", "en", "s"))) // 3 bigrams, none in corpus
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = IncrementalLm.score(fresh,
      IncrementalLm.costTable(counts), oov).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L, s"all 3 bigrams must score: $r")
    // every bigram unseen -> nll is exactly the OOV cost in units
    val expect = BigDecimal(oov.toDouble / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - expect) < 1e-9, s"$r vs $expect")
  }

  test("a known continuation still prices from the table when mixed with OOV") {
    // one doc: first bigram exists in the tiny fitted corpus, second
    // does not -> tot = cost(known) + oov, n_bigrams = 2
    val fit = spark.createDataFrame(Seq(
      (1L, "a b a b a c", "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val counts = IncrementalLm.fit(fit) // a->b:2, b->a:2, a->c:1
    val cost = IncrementalLm.costTable(counts)
    val costAB = cost.filter(col("bigram") === "a b")
      .head().getLong(2) // ln(3/2) micros
    val oov = IncrementalLm.oovCost(counts) // ln(6) micros
    val probe = spark.createDataFrame(Seq(
      (2L, "a b zz", "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = IncrementalLm.score(probe, cost, oov).head()
    val expect = BigDecimal((costAB + oov).toDouble / (2.0 * 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(1) == 2L && math.abs(r.getDouble(2) - expect) < 1e-9,
      s"$r vs $expect")
  }
}
