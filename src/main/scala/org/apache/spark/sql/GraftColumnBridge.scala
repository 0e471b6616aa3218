package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into the sql-private Column <-> Expression converters
 * (org.apache.spark.sql.classic.ExpressionUtils) so graft can register
 * custom Catalyst expressions (graft.functions.*) as Columns. This is
 * the standard extension-library pattern for Spark 4's column-node API;
 * nothing here depends on unstable behavior, only on the converter
 * entry points.
 */
object GraftColumnBridge {
  def ofExpr(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
