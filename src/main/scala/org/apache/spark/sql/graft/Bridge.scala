package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column <-> Expression
  * converters, the standard technique for libraries that ship custom
  * Catalyst expressions (Spark 4 hid the Expression-based Column
  * constructor behind the classic API). Nothing else from the internal
  * surface is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
