package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression conversions so the
  * engine's custom Catalyst expressions (graft.functions) can surface
  * as Columns. Standard extension-library shim: lives in the
  * org.apache.spark.sql package purely for access, adds no behavior.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The `private[sql]` Dataset↔LogicalPlan endpoints custom logical
    * operators need: wrap a constructed plan as a DataFrame, and get
    * the analyzed plan a DataFrame stands for.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def planOf(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
