package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The rule engine's laws: the one-pass audit equals the per-rule
  * brute-force counts, NULL predicates count as violations, exemplars
  * are the deterministic k-smallest violators and stay bounded, and
  * authoring errors (duplicate names, empty sets) fail loudly.
  */
class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._
  import QualityRules.Rule

  private lazy val df = Seq(
    (1L, Some(10), "A"),
    (2L, Some(-3), "A"),
    (3L, None, "B"),
    (4L, Some(7), "Z"),
    (5L, Some(0), "B"),
    (6L, Some(99), "A")
  ).toDF("id", "v", "flag")

  private val rules = Seq(
    Rule("v_positive", col("v") > 0),
    Rule("v_small", col("v") <= 10),
    Rule("flag_known", col("flag").isin("A", "B")))

  test("one-pass audit equals per-rule brute-force counts; NULL violates") {
    val got = QualityRules.audit(df, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // brute force: one filter per rule (the shape audit() replaces)
    val want = rules.map { r =>
      r.name -> df.filter(!coalesce(r.holds, lit(false))).count()
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (n, bad) =>
      assert(got(n)._1 == 6L, s"$n n_rows")
      assert(got(n)._2 == bad, s"$n n_bad: got ${got(n)._2} want $bad")
    }
    // the NULL row (id 3) violates both v-rules
    assert(want("v_positive") == 3L) // -3, 0, NULL
    assert(want("v_small") == 2L)    // 99, NULL
    assert(want("flag_known") == 1L) // Z
  }

  test("exemplars are the k-smallest violators per rule, bounded") {
    val ex = QualityRules.exemplars(df, rules, "id", 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byRule = ex.groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    assert(byRule("v_positive") == List(2L, 3L),
      s"smallest two of {2,3,5}: ${byRule("v_positive")}")
    assert(byRule("v_small") == List(3L, 6L))
    assert(byRule("flag_known") == List(4L))
    assert(ex.groupBy(_._1).values.forall(_.length <= 2), "k bound")
  }

  test("authoring errors fail loudly — on BOTH faces") {
    intercept[IllegalArgumentException] {
      QualityRules.audit(df, Seq.empty)
    }
    val dup = Seq(Rule("dup", col("v") > 0), Rule("dup", col("v") < 0))
    intercept[IllegalArgumentException] { QualityRules.audit(df, dup) }
    intercept[IllegalArgumentException] {
      QualityRules.exemplars(df, dup, "id")
    }
    // names interpolate into generated SQL — non-identifier names must
    // fail the validated require, not an opaque ParseException
    val quoted = Seq(Rule("price > 0 ('usd')", col("v") > 0))
    intercept[IllegalArgumentException] { QualityRules.audit(df, quoted) }
    intercept[IllegalArgumentException] {
      QualityRules.exemplars(df, quoted, "id")
    }
  }

  test("the gate decides on exact counts, not the rounded display rate") {
    // 1 bad row in 4,000,001: the display rate rounds to 0.000000 at
    // 6 dp, but zero tolerance must still fail — the decision comes
    // from the exact n_bad, never the rounded bad_frac
    val many = spark.range(0, 4000001L).toDF("id")
      .withColumn("v", when(col("id") === 0, -1).otherwise(1))
    val r = Seq(Rule("v_positive", col("v") > 0))
    val shown = QualityRules.audit(many, r).collect().head.getDouble(3)
    assert(shown == 0.0, s"premise: the display rate rounds to 0, got $shown")
    val e = intercept[QualityRules.GateFailed] {
      QualityRules.gate(many, r)
    }
    assert(e.failures.map(_._1) == Seq("v_positive"))
  }
}
