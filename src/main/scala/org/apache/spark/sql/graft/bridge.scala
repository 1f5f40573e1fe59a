package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression conversions,
  * so graft's custom Catalyst expressions (cosine similarity, hashes) can be
  * exposed as plain `Column`s without a per-session function-registry hop.
  * This is the standard extension-library pattern (same trick as frameless &
  * co.); nothing else in Spark's namespace is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
