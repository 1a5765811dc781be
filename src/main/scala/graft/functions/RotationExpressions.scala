package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense-rotation and PQ-decode kernels for OPQ (Ge, He, Ke & Sun,
  * CVPR 2013): a learned orthonormal rotation decorrelates the
  * dimensions BEFORE the product quantizer's subspace split, so PQ's
  * independence assumption costs far less on correlated data — same
  * codes-at-rest economics, strictly better reconstruction. The
  * rotation matrix rides as a referenced `double[][]` (d×d doubles is
  * driver state like a codebook; inlining it as literals would be the
  * q97 codegen-size tax). */
object RotMath extends Serializable {

  /** R·v with per-output-dimension sequential double accumulation,
    * rounded to FLOAT — one fused pass, no intermediate allocation
    * beyond the output. */
  def rotate(v: ArrayData, r: Array[Array[Double]]): ArrayData = {
    val d = r.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      val row = r(i)
      var acc = 0.0
      var j = 0
      while (j < row.length) { acc += row(j) * v.getFloat(j); j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side twin of [[rotate]] (rotate the query with the exact
    * arithmetic the scan applies to the corpus). */
  def rotateLocal(v: Array[Float], r: Array[Array[Double]]): Array[Float] = {
    val out = new Array[Float](r.length)
    var i = 0
    while (i < r.length) {
      val row = r(i)
      var acc = 0.0
      var j = 0
      while (j < row.length) { acc += row(j) * v(j); j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  /** PQ reconstruction: the m codewords concatenated back to a full
    * vector — x̂ in the quantizer's space. */
  def decode(codes: Array[Byte], codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val sub = codebooks(0)(0).length
    val out = new Array[Float](codebooks.length * sub)
    var s = 0
    while (s < codebooks.length) {
      System.arraycopy(codebooks(s)(codes(s) & 0xff), 0, out, s * sub, sub)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `ARRAY<FLOAT> -> ARRAY<FLOAT>` — rotate a vector by a referenced
  * orthonormal matrix (double accumulate per output dim, float round). */
case class MatVecRotate(child: Expression,
    rotation: Array[Array[Double]]) extends UnaryExpression {
  require(rotation.nonEmpty && rotation.forall(_.length == rotation.length),
    "mat_vec_rotate: rotation must be square")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_rotate requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    RotMath.rotate(v.asInstanceOf[ArrayData], rotation)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = RotMath.getClass.getName.stripSuffix("$")
    val rRef = ctx.addReferenceObj("rotation", rotation, "double[][]")
    defineCodeGen(ctx, ev, c => s"$o.rotate($c, $rRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "mat_vec_rotate"
}

/** `BINARY(m) -> ARRAY<FLOAT>` — reconstruct a PQ-coded vector from its
  * codewords (the x̂ OPQ's Procrustes step aligns against). */
case class PqDecode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_decode: empty codebook")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_decode requires BINARY codes, got ${other.simpleString}")
  }
  override def nullSafeEval(codes: Any): Any =
    RotMath.decode(codes.asInstanceOf[Array[Byte]], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = RotMath.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("pqDecodeCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c => s"$o.decode($c, $cbRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_decode"
}
