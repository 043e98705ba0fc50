package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY.md custom-op path (c)): per-group
  * top-k with PARTIAL pre-shuffle reduction. Spark 3.5+ covers the
  * `row_number().over(...) <= k` *idiom* with `InferWindowGroupLimit`
  * (q11 plans a partial+final WindowGroupLimit — verified via
  * graft.Explain), but that path requires writing the rank-column
  * idiom, sorts each partition inside WindowGroupLimitExec, and still
  * runs the full Window operator over the survivors to materialize the
  * rank. This operator is the direct form: heap-based (no partition
  * sort) on the map side, streaming first-k on the reduce side, no
  * rank column materialized, exposed as a first-class API. The
  * exchange carries at most k·partitions rows per group regardless of
  * group size — at 100 TB with hot groups that is the difference
  * between shuffling terabytes and shuffling kilobytes.
  *
  * Stack: logical node → strategy → partial exec (map-side heaps) →
  * exchange+sort (inserted by EnsureRequirements from the final
  * exec's required distribution/ordering) → final exec (streaming
  * count-per-group over the sorted run). Registered per-session via
  * `spark.experimental.extraStrategies` (and usable with
  * `SparkSessionExtensions.injectPlannerStrategy`).
  */
case class GroupedTopKPlan(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(groupCols.nonEmpty, "GroupedTopK needs at least one group column")
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(g, o, k, child) =>
      FinalGroupedTopKExec(g, o, k,
        PartialGroupedTopKExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side phase: one bounded heap (worst-on-top, size ≤ k) per group
  * key per partition. No distribution requirement — runs before the
  * exchange wherever the data already is.
  */
case class PartialGroupedTopKExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (groupCols, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, out)
      val rowOrd = new LazilyGeneratedOrdering(o, out)
      // worst row at the head so a better incoming row can evict it
      val worstFirst: java.util.Comparator[InternalRow] = rowOrd.reverse
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), q)
        }
        if (q.size < kk) q.add(row.copy())
        else if (rowOrd.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialGroupedTopKExec =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering on the group key and a
  * (group, order) sort — EnsureRequirements plants the exchange and
  * sort — then emits the first k rows of each sorted group run in one
  * streaming pass.
  */
case class FinalGroupedTopKExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupCols.map(e => SortOrder(e, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, kk, out) = (groupCols, k, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, out)
      var current: UnsafeRow = null
      var cnt = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (current == null || key != current) {
          current = key.copy()
          cnt = 0
        }
        cnt += 1
        cnt <= kk
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): FinalGroupedTopKExec =
    copy(child = newChild)
}

/** User-facing API. */
object GroupedTopK {

  /** Top `k` rows per group of `df`, ranked by `order` columns
    * (`(name, descending)`); ties broken by later order columns —
    * make the composite unique for deterministic output.
    */
  def topK(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    val g: Seq[Expression] = groupCols.map(UnresolvedAttribute.quoted)
    val o = order.map { case (n, desc) =>
      SortOrder(UnresolvedAttribute.quoted(n),
        if (desc) Descending else Ascending)
    }
    GraftPlanBridge.ofRows(spark,
      GroupedTopKPlan(g, o, k, df.queryExecution.analyzed))
  }
}
