package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[PlanFingerprint]]'s normalization contract — each case is a
  * measured false-inequality source from the r8 store-state sweeps
  * (cached-base lineage, null-check placement, comparison
  * orientation), plus the sensitivity direction: a REAL plan change
  * must still move the hash.
  */
class PlanFingerprintSpec extends SparkTestBase {

  private def df() = graft.queries.Q.t(spark, sf(), "orders")

  test("caching a base does not move the hash (lineage collapses to a leaf)") {
    val plain = df().groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).orderBy(col("o_orderstatus"))
    val cachedBase = df().cache()
    try {
      val cached = cachedBase.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n")).orderBy(col("o_orderstatus"))
      assert(PlanFingerprint.hash(plain) == PlanFingerprint.hash(cached),
        "InMemoryRelation lineage leaked into the fingerprint")
    } finally cachedBase.unpersist()
  }

  test("comparison orientation and null-checks do not move the hash") {
    val a = df().filter(col("o_totalprice") > 0.0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    val b = df().filter(lit(0.0) < col("o_totalprice"))
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    assert(PlanFingerprint.hash(a) == PlanFingerprint.hash(b),
      "a > b vs b < a hashed differently")
    val c = df()
      .filter(col("o_totalprice").isNotNull && col("o_totalprice") > 0.0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    assert(PlanFingerprint.hash(a) == PlanFingerprint.hash(c),
      "an isnotnull conjunct moved the hash")
  }

  test("a real plan change DOES move the hash; same plan twice does not") {
    val q1 = df().filter(col("o_totalprice") > 100.0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    val q1again = df().filter(col("o_totalprice") > 100.0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    val q2 = df().filter(col("o_totalprice") > 200.0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    assert(PlanFingerprint.hash(q1) == PlanFingerprint.hash(q1again))
    assert(PlanFingerprint.hash(q1) != PlanFingerprint.hash(q2),
      "a changed literal should change the fingerprint")
  }

  test("a changed STRING literal moves the hash even when it looks hex-ish") {
    // the @hex scrub must only eat JVM array-identity tokens — a bare
    // `@[0-9a-f]+` rewrite made "a@dead.com" and "a@beef.com" hash
    // identical (r8 review finding)
    def q(lit0: String) = df().filter(col("o_orderpriority") =!= lit0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    assert(PlanFingerprint.hash(q("a@dead.com")) !=
      PlanFingerprint.hash(q("a@beef.com")),
      "hex-ish string literals were scrubbed out of the fingerprint")
  }

  test("conjunct order inside a filter does not move the hash") {
    val a = df().filter(col("o_totalprice") > 0.0 &&
        col("o_orderstatus") === "O")
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    val b = df().filter(col("o_orderstatus") === "O" &&
        col("o_totalprice") > 0.0)
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    assert(PlanFingerprint.hash(a) == PlanFingerprint.hash(b),
      "conjunct order leaked into the fingerprint")
  }
}
