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

  /** Column ⇄ Expression bridges (r15): graft's model-bearing Catalyst
    * expressions (CentroidDists, PqCodes, PqDistTable, MatRotate) hold
    * their k×dim matrices as REFERENCE OBJECTS; spelling those matrices
    * as SQL-text literals only to have the function descriptor fold them
    * straight back into a reference costs a parse + analyze of thousands
    * of `cast('…' as double)` nodes per frame construction. Building the
    * expression directly and wrapping it into a Column skips that
    * entirely — same resolved plan, no literal tree ever exists.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
