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

  /** Bloom-filter build aggregate over a hashed (LONG) column; yields
    * one BINARY cell — the serialized filter. Spark only exposes this
    * through the scala-udf-free `bloom_filter_agg` internals, so the
    * catalyst construction lives here, not in operator code. */
  def bloomAggregate(hashed: Column, expectedItems: Long,
                     numBits: Long): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
        eagerExpression(hashed),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Codegen'd membership probe against a driver-built serialized
    * bloom filter (the executor-side half of [[bloomAggregate]]). */
  def bloomMightContain(filterBytes: Array[Byte], hashed: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        filterBytes, org.apache.spark.sql.types.BinaryType),
      eagerExpression(hashed)))
}
