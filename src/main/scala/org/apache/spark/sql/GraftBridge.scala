package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the Column API backend-agnostic and gated the classic
  * conversions behind `private[sql]` (`classic.ExpressionUtils`); a library
  * adding native expressions still needs them, so this one-file shim lives
  * in the sql package to re-export the two conversions. No Spark internals
  * are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
