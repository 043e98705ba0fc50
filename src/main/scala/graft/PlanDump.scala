package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named queries (after one real
  * execution so AQE's final plan is the one shown) plus a one-line
  * shape summary — the per-query audit loop behind SURVEY §2.4's
  * "plan you'd want at scale" claims. Complements [[Explain]]: that
  * prints the PRE-execution formatted plan; this one runs the query
  * and summarizes what AQE actually chose, with cached-base build
  * subtrees excluded from the counts.
  *
  * Usage: runMain graft.PlanDump q76_dup_segments [q77_...] —
  * env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench;
  * SPARK_GRAFT_PLAN_FULL=1 prints the whole plan tree, default is the
  * summary line only.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one query name, or ALL")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val full = sys.env.get("SPARK_GRAFT_PLAN_FULL").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ALL = the whole registry in declaration order — the suite-wide
    // duplicated-scan sweep at finalized-plan truth.
    val names =
      if (args.sameElements(Array("ALL"))) SparkEntry.queryNames
      else args.toSeq
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect(), NOT a noop write: the write spawns its OWN
      // QueryExecution, leaving df's AdaptiveSparkPlan UNEXECUTED —
      // its plan string then shows the pre-AQE initial plan where
      // exchange/stage reuse is invisible and every shared subtree
      // prints as a fresh copy. collect() finalizes df's own adaptive
      // plan, the thing the duplicated-scan audit walks. Query
      // outputs are result-sized (every query ends in an aggregate /
      // limit), so the driver-side collect is bounded.
      df.collect()
      val raw = df.queryExecution.executedPlan.toString
      // Drop InMemoryRelation subtrees: a cached base's BUILD plan is
      // printed inside the node but not re-executed by this query —
      // counting its scans/exchanges would misattribute amortized
      // index-build cost to query time. Lines deeper-indented than
      // the InMemoryRelation header belong to the stored build plan.
      val lines = raw.linesIterator.toSeq
      def indent(l: String) = l.segmentLength(c => !c.isLetter && c != '*')
      var skipBelow = -1
      val p = lines.filter { l =>
        val i = indent(l)
        if (skipBelow >= 0 && i > skipBelow) false
        else if (l.contains("InMemoryRelation")) { skipBelow = indent(l); false }
        else { skipBelow = -1; true }
      }.mkString("\n")
      def n(pat: String) = pat.r.findAllIn(p).size
      // ReusedExchangeExec renders its referenced Exchange INLINE
      // ("ReusedExchange [...], Exchange hashpartitioning(...)"), so a
      // naive Exchange count would bill every reuse as a real exchange
      val realExch = p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      // EXECUTED scan multiplicity via the audit walker (QueriesSpec's
      // duplicated-scan test): descend into materialized query stages
      // but NOT into ReusedExchange, so a scan counted twice here ran
      // twice — the string counts above can over-report because the
      // final adaptive plan re-prints a shared stage per consumer.
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def scanKeys(pl: SparkPlan,
          seen: java.util.IdentityHashMap[SparkPlan, Unit]): Seq[String] = {
        if (seen.containsKey(pl)) return Nil
        seen.put(pl, ())
        val self = pl match {
          case f: FileSourceScanExec =>
            Seq(f.relation.location.rootPaths.mkString(",").split("/").last)
          case _ => Nil
        }
        val kids: Seq[SparkPlan] = pl match {
          case _: ReusedExchangeExec => Nil
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        self ++ kids.flatMap(scanKeys(_, seen))
      }
      val ran = scanKeys(df.queryExecution.executedPlan,
        new java.util.IdentityHashMap[SparkPlan, Unit]())
        .groupBy(identity).map { case (k, vs) => s"$k=${vs.size}" }
        .toSeq.sorted.mkString(",")
      println(s"PLAN $name scans=${n("Scan parquet")}" +
        s" cachedReads=${n("InMemoryTableScan")}" +
        s" exch=$realExch" +
        s" reused=${n("ReusedExchange")}" +
        s" bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")}" +
        s" bnlj=${n("BroadcastNestedLoopJoin")}" +
        s" codegen=${n("\\*\\(")}" +
        s" ranScans[$ran]")
      if (full) println(raw)
    }
    spark.stop()
  }
}
