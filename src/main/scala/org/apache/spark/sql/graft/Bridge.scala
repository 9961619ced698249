package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Column/DataFrame ⇄ Catalyst bridge. Spark 4 hides the
  * Expression-backed Column constructor and plan accessors behind
  * `private[sql]`; living under `org.apache.spark.sql` is the standard
  * way extension libraries plug custom Catalyst expressions and
  * logical plans into the public API.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager ColumnNode→Catalyst conversion. The lazy wrapper returned by
    * [[expression]] keeps the (non-serializable) internal column node
    * alive until analysis; custom operators that embed expressions in
    * their own nodes need the converted catalyst tree up front. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical

  /** Resolved plan with bound output attributes — custom binary nodes
    * that embed child attributes in their own expressions need this
    * (the raw logical plan of a freshly-built frame can be unresolved,
    * with empty output). */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
