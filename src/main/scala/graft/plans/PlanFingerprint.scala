package graft.plans

import org.apache.spark.sql.DataFrame

/** The bench's canonical plan fingerprint — ONE definition shared by
  * [[graft.Bench]] (the judged BENCH_DETAIL `plans` map) and the
  * [[graft.PlanHash]] dev tool, so a hash printed while debugging is
  * the hash the record carries.
  *
  * Cross-round timing deltas are attributed by hash equality ("same
  * hash + wide spread = load noise; changed hash = a real plan
  * change"), so the fingerprint must be identical across JVMs,
  * sessions, and index-store states whenever the PLAN is the same.
  * Three session artifacts would otherwise leak in (each measured
  * breaking equality in the r8 cold-vs-warm store check):
  *
  *  1. cached/durable base subtrees — an index-backed query's
  *     optimized plan embeds the InMemoryRelation's BUILD lineage
  *     (store-warm: a parquet scan of the stored index; store-cold:
  *     the full corpus build). Each collapses to a schema-only leaf;
  *     the store tier is stamped separately in BENCH_DETAIL.
  *  2. opaque literals print their array object identity
  *     (`[J@1a2b3c` — centroid/LUT/survivor literals differ by JVM
  *     ADDRESS even when bit-identical).
  *  3. Broadcast handles print their session-sequence id
  *     (`Broadcast(12)` — a warm session builds fewer broadcasts
  *     before the query, shifting every id).
  *
  * None of those tokens carries plan information — a genuine plan
  * change alters operator structure, not addresses. NOTE the converse
  * duty this puts on PLAN-EMBEDDED VALUES: any literal built from a
  * `collect()` (Misra–Gries survivors, learned centroids, hot-term
  * sets) must be collected in a canonical ORDER, or the same logical
  * artifact hashes differently per session — the deterministic-
  * artifact rule extended to plan literals.
  */
object PlanFingerprint {

  /** The normalized canonicalized plan string the hash covers. */
  def normalizedPlan(df: DataFrame): String = {
    val norm = df.queryExecution.optimizedPlan.transform {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        // nullability widened: a store-read base carries parquet's
        // all-nullable schema while the same frame built in-session
        // keeps non-null expression types — same frame, two leaf
        // strings (measured: the q40/q54/q64/q70/q77 store-vs-disabled
        // flips were ONLY this)
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          r.output.map(_.withNullability(true)))
    }
    // Conjunct order inside Filter/Join conditions tracks the
    // optimizer's constraint-inference iteration, which follows live
    // exprIds — two sessions whose earlier plans consumed different id
    // ranges emit `a AND b` vs `b AND a` (measured: the last
    // store-vs-disabled flips were ONLY this). Sort the top-level
    // conjuncts of the CANONICALIZED tree (stringified only — never
    // executed) by their rendered form.
    def sortConjuncts(
        e: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = e match {
      case org.apache.spark.sql.catalyst.expressions.And(_, _) =>
        def split(
            x: org.apache.spark.sql.catalyst.expressions.Expression)
            : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
          x match {
            case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
              split(l) ++ split(r)
            case o => Seq(o)
          }
        split(e).sortBy(_.toString)
          .reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
      case o => o
    }
    val canon = norm.canonicalized.transform {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.copy(condition = sortConjuncts(f.condition))
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.copy(condition = j.condition.map(sortConjuncts))
    }
    canon.toString
      .replaceAll("@[0-9a-fA-F]+", "@x")
      .replaceAll("Broadcast\\(\\d+\\)", "Broadcast(#)")
      // typed-API nodes (MapPartitions — the q91 Misra–Gries pass)
      // print their function object as a JVM hidden-class token
      // (`$$Lambda$2041/0x00007f…`) whose number and address track
      // CLASS-LOAD ORDER, which the store state shifts
      .replaceAll("\\$\\$Lambda(\\$\\d+)?/0x[0-9a-fA-F]+", "\\$\\$Lambda")
  }

  /** 8-hex-digit fingerprint of [[normalizedPlan]]. */
  def hash(df: DataFrame): String =
    f"${scala.util.hashing.MurmurHash3.stringHash(normalizedPlan(df))}%08x"
}
