package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `private[sql]` constructors so graft can (a) materialize a
  * DataFrame from its own logical plan node
  * ([[graft.plans.GroupedTopKPlan]]) and (b) wrap a data-carrying
  * Catalyst expression (e.g. [[graft.functions.NearestCentroids]],
  * whose centroid array is computed at plan time and cannot go through
  * the name-based function registry) as a Column. The standard
  * extension-library technique: a single file in the
  * `org.apache.spark.sql` package, nothing else of Spark's internals
  * re-exported.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
