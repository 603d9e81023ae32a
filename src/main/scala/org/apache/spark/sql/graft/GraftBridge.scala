package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Column <-> Expression
  * conversion for registering native Catalyst expressions from the graft
  * packages. Lives under org.apache.spark.sql.* solely for visibility —
  * the standard pattern for out-of-tree Catalyst extensions. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
