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

  test("IN-literal list order does not move the hash; content does") {
    // both sides of the InSet conversion threshold (default 10): a
    // short list stays `In(...)`, a long one becomes `InSet` whose
    // toString renders Set-iteration order — both must hash
    // order-insensitively, and a changed ELEMENT must still move it
    def q(vals: Seq[String]) = df()
      .filter(col("o_orderpriority").isin(vals: _*))
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    val short = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    assert(PlanFingerprint.hash(q(short)) ==
      PlanFingerprint.hash(q(short.reverse)),
      "In literal order leaked into the fingerprint")
    assert(PlanFingerprint.hash(q(short)) !=
      PlanFingerprint.hash(q(Seq("1-URGENT", "2-HIGH", "5-LOW"))),
      "a changed In element should move the hash")
    val long = (1 to 12).map(i => f"p$i%02d")
    assert(PlanFingerprint.hash(q(long)) ==
      PlanFingerprint.hash(q(new scala.util.Random(7).shuffle(long))),
      "InSet rendering order leaked into the fingerprint")
    assert(PlanFingerprint.hash(q(long)) !=
      PlanFingerprint.hash(q(long.updated(5, "zz"))),
      "a changed InSet element should move the hash")
    // the collapse must run BEFORE the conjunct sort: with a sibling
    // conjunct whose rendering sorts between the two IN orderings, a
    // sort keyed on the pre-collapse rendering would order the
    // conjuncts differently per run (r9 review finding)
    def qc(vals: Seq[String]) = df()
      .filter(col("o_orderpriority").isin(vals: _*) &&
        col("o_orderstatus") === "O")
      .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    for (vals <- Seq(short, long)) {
      assert(PlanFingerprint.hash(qc(vals)) ==
        PlanFingerprint.hash(qc(vals.reverse)),
        s"IN order reordered sibling conjuncts (n=${vals.length})")
    }
  }

  test("typed-API lambda object identity does not move the hash") {
    // MapPartitions prints its function object as $$Lambda@<identity
    // hex> (run-order sensitive — the r8 control's q91 flip); two
    // DISTINCT lambda objects of the same code must hash identically
    import spark.implicits._
    // the capture forces a FRESH closure instance per call (a
    // non-capturing lambda is a cached singleton and would make the
    // identity comparison vacuous)
    def q(off: Int) = df().select(col("o_orderpriority")).as[String]
      .mapPartitions(it => it.map(_.length + off))
      .toDF("n").groupBy(col("n")).count().orderBy(col("n"))
    val a = q(0)
    val b = q(0)
    assert(PlanFingerprint.normalizedPlan(a).contains("MapPartitions"),
      "fixture lost its MapPartitions node")
    assert(!PlanFingerprint.normalizedPlan(a).matches(
      "(?s).*Lambda[@$/].*"),
      "a lambda identity token survived normalization")
    assert(PlanFingerprint.hash(a) == PlanFingerprint.hash(b),
      "lambda object identity leaked into the fingerprint")
  }

  test("commutative operand order does not move the hash (binary, MCO-bearing)") {
    // the r10 decimal-chain root cause: Spark canonicalization orders
    // commutative operands by hashCode; a subtree containing a
    // MultiCommutativeOp carries that node's Class[_] member whose
    // hashCode is per-JVM identity, so a BINARY parent's operand order
    // (ln(x)*1e6 vs 1e6*ln(x)) flipped with the JVM — the fingerprint
    // now imposes rendering order on every commutative operator
    def one(c: org.apache.spark.sql.Column) =
      df().select(c.as("x")).limit(10)
    val l = col("o_totalprice")
    assert(PlanFingerprint.hash(one(l * lit(2.0))) ==
      PlanFingerprint.hash(one(lit(2.0) * l)),
      "binary multiply operand order leaked into the fingerprint")
    // the captured q108 shape: ln(3-term decimal product) * literal —
    // the 3-term chain canonicalizes to a MultiCommutativeOp
    val chain = (col("o_orderkey").cast("decimal(19,0)") *
      col("o_custkey").cast("decimal(19,0)")).cast("decimal(38,0)") *
      col("o_totalprice").cast("decimal(19,0)")
    val lnc = log(chain.cast("double"))
    assert(PlanFingerprint.hash(one(lnc * lit(1000000.0))) ==
      PlanFingerprint.hash(one(lit(1000000.0) * lnc)),
      "MCO-bearing multiply operand order leaked into the fingerprint")
    assert(PlanFingerprint.hash(one(l + lit(1.0))) ==
      PlanFingerprint.hash(one(lit(1.0) + l)),
      "binary add operand order leaked into the fingerprint")
    // sensitivity direction: different operands must still differ
    assert(PlanFingerprint.hash(one(l * lit(2.0))) !=
      PlanFingerprint.hash(one(l * lit(3.0))),
      "a changed factor should move the hash")
  }

  test("decimal-chain watch list fingerprints are pinned (r10 flake sampler)") {
    // every `sbt test` run is one more fresh-JVM sample of the
    // q108/q137/q214/q216 family that flipped ~1 in 15 JVMs before the
    // r10 commutative-order fix. A failure here has TWO possible
    // causes (r10 ADVICE): (1) the per-JVM flip is BACK — capture with
    // SPARK_GRAFT_PLAN_PRINT=1 OrderHash forward <names> and diff
    // against the banked dumps (BASELINE.md flake watch); or (2) a
    // DELIBERATE query/normalization/Spark change moved the plan —
    // verify stability with ≥3 forward + 3 reverse fresh-JVM OrderHash
    // runs, then re-pin these hashes to the new stable values. Hashes
    // are sf0.001 (the spec fixture).
    val expected = Map(
      "q108_js_divergence" -> "d28c36ff",
      "q137_user_mix_divergence" -> "122e1b7f",
      "q214_revenue_acf" -> "da35d64c",
      "q216_ks_drift" -> "13e02902")
    val got = expected.keys.toSeq.sorted.map { n =>
      n -> PlanFingerprint.hash(graft.SparkEntry.queries(n)(spark, sf()))
    }.toMap
    assert(got == expected,
      s"decimal-chain fingerprint moved: got $got expected $expected — " +
        "EITHER the per-JVM flip is back (bank a SPARK_GRAFT_PLAN_PRINT=1 " +
        "dump and diff, BASELINE.md flake watch) OR a deliberate plan/" +
        "normalization change moved these plans: prove stability with " +
        "3+3 fresh-JVM OrderHash runs, then re-pin (comment above)")
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
