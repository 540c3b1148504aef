package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column⇄Expression converters for graft's
  * custom Catalyst expressions (the same device Spark's own extension test
  * suites use: a one-file residence in the org.apache.spark.sql package).
  * Kept to exactly these two forwarding calls. */
object GraftColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
