package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard way
  * a library hands a custom [[LogicalPlan]] node (here
  * graft.plans.AsofJoinNode) back to the public DataFrame API. Lives in
  * `org.apache.spark.sql` solely for access; contains no logic.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
