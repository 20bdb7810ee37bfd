package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: `classic.ExpressionUtils` (Column ⇄ catalyst Expression)
  * is `private[sql]` in Spark 4, so custom Catalyst expressions (e.g.
  * `graft.functions.FloatVecDot`) need this one-hop bridge to surface as
  * `Column`s. No Spark behavior is modified — these are pure
  * conversions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
