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

  /** The `attr === literal` leaves under a [[Column]]'s top-level
    * conjunctions, as (single-part attribute name, plain Scala literal
    * value) pairs — the shape a build-time stats map can price. Only
    * `=`/`==` nodes over one unqualified attribute and one non-null
    * literal qualify; anything else contributes nothing (a caller
    * pricing a conjunction by its rarest priceable branch gets an upper
    * bound, which is routing-safe). Node classes are `private[sql]`,
    * hence this lives with the other classic bridges. */
  def equalityLeaves(c: Column): Seq[(String, Any)] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal,
      UnresolvedAttribute, UnresolvedFunction}
    def eq(a: ColumnNode, l: ColumnNode): Option[(String, Any)] =
      (a, l) match {
        case (UnresolvedAttribute(parts, _, _, _), Literal(v, _, _))
            if parts.size == 1 && v != null => Some((parts.head, v))
        case _ => None
      }
    def walk(n: ColumnNode): Seq[(String, Any)] = n match {
      case UnresolvedFunction("=" | "==", Seq(a, b), _, _, _, _) =>
        (eq(a, b) orElse eq(b, a)).toSeq
      case UnresolvedFunction(fn, Seq(a, b), _, _, _, _)
          if fn.equalsIgnoreCase("and") => walk(a) ++ walk(b)
      case _ => Nil
    }
    walk(c.node)
  }
}
