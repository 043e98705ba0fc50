package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` `Dataset.ofRows` constructor so graft
  * can materialize a DataFrame from its own logical plan node
  * ([[graft.plans.GroupedTopKPlan]]). The standard extension-library
  * technique: a single file in the `org.apache.spark.sql` package,
  * nothing else of Spark's internals re-exported.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
