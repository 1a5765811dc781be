package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 made `Column` expression-agnostic (column-node
  * based); the classic conversion lives in `private[sql]`
  * [[org.apache.spark.sql.classic.ExpressionUtils]], so this object sits in a
  * subpackage of `org.apache.spark.sql` to reach it. No Spark internals are
  * modified — this is the sanctioned extension seam used by Spark's own
  * built-in DSL.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
