package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` deployment path: a session BUILT with
  * [[GraftExtensions]] exposes the native expressions to pure SQL and
  * plans [[GroupedTopKPlan]] with no runtime `register`/
  * `extraStrategies` call — the contract a cluster operator relies on
  * when they own the session builder but not the notebook code.
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("a session built with the extensions serves functions + strategy, unregistered") {
    val base = spark // materialize the shared suite session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // same SparkContext, NEW session with the extensions applied at
    // build time — exactly what spark.sql.extensions does at startup
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions()
        : org.apache.spark.sql.SparkSessionExtensions => Unit)
      .getOrCreate()
    try {
      assert(ext ne base, "builder must have created a fresh session")
      // native expressions resolve in pure SQL with NO register() call
      val cos = ext.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))")
        .head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val viaSql = ext.sql(
        "SELECT simhash64(array('a', 'b', 'c'))").head().getLong(0)
      // same bits as the Column-API expression on the base session
      graft.functions.GraftFunctions.register(base)
      val viaApi = base.sql(
        "SELECT simhash64(array('a', 'b', 'c'))").head().getLong(0)
      assert(viaSql == viaApi, "extension and runtime registration must agree")
      // the planner strategy is injected at BUILD time: it sits in the
      // session's planner before any runtime extraStrategies hook
      // exists (GroupedTopK.topK would add that hook itself, so the
      // planner membership is the discriminating check)
      assert(ext.experimental.extraStrategies.isEmpty,
        "fresh session must start without the runtime hook")
      assert(ext.sessionState.planner.strategies.contains(GroupedTopKStrategy),
        "extension-built session must carry the GroupedTopK strategy")
      // and the operator executes correctly in this session
      import org.apache.spark.sql.functions._
      import ext.implicits._
      val df = Seq((1, 5), (1, 3), (1, 9), (2, 4), (2, 8))
        .toDF("g", "v")
      val top = GroupedTopK.topK(df, Seq("g"), Seq(("v", true)), 1)
      val rows = top.orderBy(col("g")).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(rows == Seq((1, 9), (2, 8)), s"$rows")
      assert(top.queryExecution.executedPlan.toString
        .contains("GroupedTopK"), "custom exec must appear in the plan")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
      // ext shares the SparkContext — never stop it here
    }
  }
}
