package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector math over `ARRAY<FLOAT>` embedding columns as native Catalyst
  * expressions (codegen'd, whole-stage-compatible) — the Spark-first
  * replacement for the pgvector `<=>` operator the reference leans on
  * (reference: readwise_vector_db/db/supabase_ops.py:267, cosine distance
  * `embedding <=> $1::halfvec`).
  *
  * All accumulation is in Double (each Float operand widened before
  * multiply), which makes results bit-identical to an oracle that casts the
  * float list to DOUBLE[] and sums sequentially.
  */
object VectorMath extends Serializable {
  /** Sequential dot product, Double accumulation. */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Cosine distance = 1 − cos(a,b); zero-norm input → 1.0 (max distance,
    * matching "no similarity" rather than NaN). */
  def cosineDistance(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot(a, b) / (na * nb)
  }

  def l2Distance(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
}

abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Fully-qualified static method on [[VectorMath]] to invoke. */
  protected def mathFn: String

  protected def compute(a: Array[Float], b: Array[Float]): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarders on the object's companion class — Janino-resolvable
    val vm = VectorMath.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $vm.$mathFn($a.toFloatArray(), $b.toFloatArray());")
  }
}

/** pgvector `<=>` equivalent (cosine distance). */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def mathFn: String = "cosineDistance"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorMath.cosineDistance(a, b)
  override def prettyName: String = "cosine_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pgvector `<#>` equivalent is −dot; we expose plain dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def mathFn: String = "dot"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorMath.dot(a, b)
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pgvector `<->` equivalent (Euclidean distance). */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def mathFn: String = "l2Distance"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorMath.l2Distance(a, b)
  override def prettyName: String = "l2_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
