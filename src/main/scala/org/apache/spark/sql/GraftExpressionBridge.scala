package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic `Column ⇄ Expression` converters, which are
  * `private[sql]` in Spark 4.x. Library-local custom Catalyst expressions
  * (graft.functions.*) are wrapped into `Column`s through here — the standard
  * pattern for Spark-native extension libraries that ship codegen'd
  * expressions without a `SparkSessionExtensions` registration step.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
