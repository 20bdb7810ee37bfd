package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Access shim: `classic.ExpressionUtils` (Column ⇄ catalyst Expression)
  * and `sessionState` are `private[sql]` in Spark 4, so custom Catalyst
  * expressions (e.g. `graft.functions.FloatVecDot`) need this one-hop
  * bridge to surface as `Column`s / SQL functions. No Spark behavior is
  * modified — these are pure conversions plus a registry insert. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for composing custom logical
    * nodes) and its inverse (wrapping a custom node back into a
    * DataFrame) — both `private[sql]` in Spark 4. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a SQL function on an EXISTING session (the
    * `spark.sql.extensions` path only applies at session build). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
}
