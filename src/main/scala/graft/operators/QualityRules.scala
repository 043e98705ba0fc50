package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality rule engine — the deequ/dbt-test shape
  * rebuilt Spark-first (ref: the reference validates each record
  * against fixed predicates before processing,
  * `Batch Processor.py:299-321`; at corpus scale the per-record check
  * becomes a rule REPORT): a rule set is a list of named row
  * predicates over one frame, and the audit answers "how many rows
  * violate each rule, and show me a few" without scanning the corpus
  * once per rule.
  *
  * Scale shape (the point): ALL rules evaluate in ONE pass —
  * violation counts are conditional sums inside a single aggregate
  * (map-side combined, no shuffle of data rows, a 1×|rules| result),
  * and the optional exemplars ride a SECOND pass that keeps at most
  * `maxExemplars` rows per rule through the bounded
  * [[graft.plans.GroupedTopK]] heap — k·partitions rows cross the
  * exchange, never the violation mass (a corpus that is 90% bad does
  * not ship 90% of itself to the report). A per-rule `filter` loop —
  * the naive form — pays |rules| scans and is exactly what this
  * module exists to avoid.
  *
  * Determinism: exemplars are the `orderCol`-smallest violators per
  * rule (ties impossible when `orderCol` is a key), so the report is
  * stable across runs and engines.
  */
object QualityRules {

  /** One named row-level expectation: `holds` must be TRUE for a
    * clean row. NULL evaluates as a VIOLATION (a rule that cannot
    * prove itself holds, fails — the deequ convention), so authors
    * write the positive invariant without null-plumbing.
    */
  final case class Rule(name: String, holds: Column)

  /** Violation counts per rule in ONE scan: `(rule, n_rows, n_bad,
    * bad_frac)` — `n_rows` repeated per rule row for ratio reads.
    * Result is |rules| rows, ordered by rule name.
    */
  /** Authoring validation shared by every face: names are identifiers
    * (they interpolate into generated SQL — a quote or backtick would
    * otherwise surface as an opaque ParseException or, crafted, a
    * silently mislabeled report), unique, and the set non-empty.
    */
  private def validate(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name '${r.name}' must be an identifier ([A-Za-z0-9_]+)"))
  }

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    validate(rules)
    // coalesce: sum over an EMPTY frame is NULL, and the streaming
    // monitor audits every micro-batch including empty ones — an
    // empty delivery must report 0 violations, not null-crash
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      rules.map(r =>
        coalesce(sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)),
          lit(0L)).cast("long").as(s"__bad_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // |rules|-column 1-row frame → |rules| rows via stack (map-side)
    val stacked = rules.map(r =>
      s"'${r.name}', `__bad_${r.name}`").mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${rules.size}, $stacked) AS (rule, n_bad)")
      .select(col("rule"), col("n_rows"), col("n_bad"),
        // empty-frame guard (ANSI divide-by-zero): an empty delivery
        // reports rate 0, matching its 0 violations
        when(col("n_rows") > 0,
          round(col("n_bad").cast("double") /
            col("n_rows").cast("double"), 6))
          .otherwise(lit(0.0)).as("bad_frac"))
      .orderBy(col("rule"))
  }

  /** Raised by [[gate]]: the release-blocking face of the audit, with
    * every failing rule and its realized rate in the message.
    */
  final case class GateFailed(failures: Seq[(String, Double)])
    extends RuntimeException(
      "quality gate failed: " + failures
        .map { case (n, f) => f"$n (bad_frac $f%.6f)" }.mkString(", "))

  /** Pre-release gate: run [[audit]] and throw [[GateFailed]] if ANY
    * rule's violation rate exceeds `maxBadFrac` (default: zero
    * tolerance). The release-pipeline composition point — a corpus
    * that fails its structural expectations should fail the RELEASE,
    * loudly, not ship and be discovered downstream. Cost: the one
    * audit pass.
    */
  def gate(df: DataFrame, rules: Seq[Rule], maxBadFrac: Double = 0.0): Unit = {
    // decide on the EXACT counts, not the display-rounded bad_frac:
    // round(4/1e7, 6) = 0.0 would slip 4 real violations through a
    // zero-tolerance gate on a 10 M-row corpus (r7 review)
    val bad = audit(df, rules).collect()
      .map { r =>
        val (n, nBad) = (r.getLong(1), r.getLong(2))
        (r.getString(0), nBad,
          if (n == 0) 0.0 else nBad.toDouble / n)
      }
      .filter { case (_, nBad, frac) => nBad > 0 && frac > maxBadFrac }
    if (bad.nonEmpty)
      throw GateFailed(bad.map { case (n, _, f) => (n, f) }.toSeq)
  }

  /** Up to `maxExemplars` violating row KEYS per rule, for triage:
    * `(rule, orderCol)` — the key is the lookup handle, the row
    * itself stays in the corpus (shipping arbitrary row payloads
    * through the heap would carry the violation mass this shape
    * exists to avoid). One corpus scan: each row emits one entry per
    * RULE (a |rules|-wide map-side array + explode), non-violations
    * null out and filter immediately, so only the violation grain
    * survives to the per-rule heap — which cuts it to k·partitions
    * rows before any exchange.
    */
  def exemplars(
      df: DataFrame,
      rules: Seq[Rule],
      orderCol: String,
      maxExemplars: Int = 5): DataFrame = {
    validate(rules)
    val tagged = df.select(
      explode(array(rules.map(r =>
        when(coalesce(r.holds, lit(false)), lit(null).cast("string"))
          .otherwise(lit(r.name))): _*)).as("rule"),
      col(orderCol).as("__ord"))
      .filter(col("rule").isNotNull)
    graft.plans.GroupedTopK.topK(tagged,
      Seq("rule"), Seq(("__ord", false)), maxExemplars)
      .select(col("rule"), col("__ord").as(orderCol))
      .orderBy(col("rule"), col(orderCol))
  }
}
