package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Residual quantization (Chen, Guan & Wang 2010; the FAISS
  * `IndexResidualQuantizer` family) as native Catalyst expressions —
  * the sequential, full-dimension sibling of [[PqMath]]'s subspace
  * split. Stage 0 quantizes the vector against its codebook; every
  * later stage quantizes what the previous stages LEFT OVER, so the
  * codebooks specialize coarse-to-fine instead of dimension-by-
  * dimension. Same at-rest economics as PQ (`stages` bytes a vector);
  * where PQ's subspaces can't share structure across the split
  * boundary, RQ's stages see the full vector and so spend codes on the
  * globally largest residual directions — the better quantizer when
  * variance is NOT axis-aligned (and the worse one when it is; both
  * live in the menu for that reason).
  *
  * Float discipline (oracle parity): stage residuals round to FLOAT
  * after each double-precision subtraction — exactly DuckDB's
  * `CAST(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) AS REAL)` — and every
  * argmin / table cell is the sequential-double dot-expansion tree the
  * SQL oracle evaluates ([[PqMath.l2SqSlice]] discipline), so codes and
  * ADC scores are bit-identical cross-engine.
  */
object RqMath extends Serializable {

  /** Encode one vector: per stage, the lowest-index codeword at minimal
    * squared L2 to the CURRENT residual (strict `<` keeps the first on
    * ties — the row_number tie-break the oracle uses), then the
    * residual updates by float-rounded subtraction. */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val dim = codebooks(0)(0).length
    val r = new Array[Float](dim)
    var i = 0
    while (i < dim) { r(i) = v.getFloat(i); i += 1 }
    val out = new Array[Byte](codebooks.length)
    var s = 0
    while (s < codebooks.length) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var aa = 0.0; var ab = 0.0; var bb = 0.0
        var j = 0
        while (j < dim) {
          val a = r(j).toDouble
          val b = cw(j).toDouble
          aa += a * a; ab += a * b; bb += b * b
          j += 1
        }
        val d = aa - 2.0 * ab + bb
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      val cw = cb(best)
      var j = 0
      while (j < dim) {
        r(j) = (r(j).toDouble - cw(j).toDouble).toFloat
        j += 1
      }
      s += 1
    }
    out
  }

  /** The query-side tables for [[adc]], driver-side once per query:
    *  - `qLut(s)(c)`  = ⟨q, c_s⟩ (sequential double dot),
    *  - `nLut(s)(c)`  = ⟨c_s, c_s⟩,
    *  - `xLut(p)(a)(b)` = ⟨c_s[a], c_t[b]⟩ for each stage pair s < t in
    *    lexical order (p = index into the s<t enumeration) — the cross
    *    terms PQ's disjoint subspaces never have.
    * `stages·ksub + stages·ksub + C(stages,2)·ksub²` doubles. */
  def tables(q: Array[Float], codebooks: Array[Array[Array[Float]]])
      : (Array[Array[Double]], Array[Array[Double]], Array[Array[Array[Double]]]) = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    val qLut = codebooks.map(cb => cb.map(cw => dot(q, cw)))
    val nLut = codebooks.map(cb => cb.map(cw => dot(cw, cw)))
    val xLut = (for {
      s <- codebooks.indices
      t <- (s + 1) until codebooks.length
    } yield codebooks(s).map(a => codebooks(t).map(b => dot(a, b)))).toArray
    (qLut, nLut, xLut)
  }

  /** ADC score of stored codes: with x̂ = Σ_s c_s, expand
    * ‖q − x̂‖² = ⟨q,q⟩ − 2·Σ_s⟨q,c_s⟩ + (Σ_s⟨c_s,c_s⟩ + 2·Σ_{s<t}⟨c_s,c_t⟩).
    * Accumulation order is pinned — qc in stage order, nn in stage
    * order then pair order — so the oracle's parenthesized arithmetic
    * reproduces the double tree exactly. Per-row work is
    * `2·stages + C(stages,2)` table loads: the scan never decodes. */
  def adc(codes: Array[Byte], qq: Double, qLut: Array[Array[Double]],
      nLut: Array[Array[Double]], xLut: Array[Array[Array[Double]]]): Double = {
    val stages = qLut.length
    var qc = 0.0
    var s = 0
    while (s < stages) { qc += qLut(s)(codes(s) & 0xff); s += 1 }
    var nn = 0.0
    s = 0
    while (s < stages) { nn += nLut(s)(codes(s) & 0xff); s += 1 }
    var p = 0
    s = 0
    while (s < stages) {
      var t = s + 1
      while (t < stages) {
        nn += 2.0 * xLut(p)(codes(s) & 0xff)(codes(t) & 0xff)
        p += 1
        t += 1
      }
      s += 1
    }
    qq - 2.0 * qc + nn
  }
}

/** `ARRAY<FLOAT> -> BINARY(stages)` — encode a vector to its stagewise
  * residual codes. Codebooks ride as a referenced object like
  * [[PqEncode]]'s (a literal nest would be the q97 codegen-size tax). */
case class RqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "rq_encode: empty codebook")
  require(codebooks.forall(_.length <= 256),
    "rq_encode: ksub must fit one byte (<= 256 codewords per stage)")
  require(codebooks.forall(_.head.length == codebooks.head.head.length),
    "rq_encode: all stages quantize the full dimension")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rq_encode requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    RqMath.encode(v.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = RqMath.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("rqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c => s"$o.encode($c, $cbRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "rq_encode"
}

/** `BINARY(stages) -> DOUBLE` — asymmetric-distance score of stored RQ
  * codes against a query's precomputed tables ([[RqMath.tables]]).
  * Whole-stage-codegen, never decodes a vector. */
case class RqAdcScore(child: Expression, qq: Double,
    qLut: Array[Array[Double]], nLut: Array[Array[Double]],
    xLut: Array[Array[Array[Double]]]) extends UnaryExpression {
  require(qLut.nonEmpty && qLut.length == nLut.length,
    "rq_adc_score: table stage counts disagree")
  require(xLut.length == qLut.length * (qLut.length - 1) / 2,
    "rq_adc_score: need one cross table per stage pair")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rq_adc_score requires BINARY codes, got ${other.simpleString}")
  }
  override def nullSafeEval(codes: Any): Any =
    RqMath.adc(codes.asInstanceOf[Array[Byte]], qq, qLut, nLut, xLut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = RqMath.getClass.getName.stripSuffix("$")
    val qRef = ctx.addReferenceObj("rqQLut", qLut, "double[][]")
    val nRef = ctx.addReferenceObj("rqNLut", nLut, "double[][]")
    val xRef = ctx.addReferenceObj("rqXLut", xLut, "double[][][]")
    // qq is one double of per-query state: a shortest-round-trip literal
    // (Double.toString parses back to the identical bits) keeps it out
    // of the reference-object table
    defineCodeGen(ctx, ev, c =>
      s"$o.adc($c, ${qq}D, $qRef, $nRef, $xRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "rq_adc_score"
}
