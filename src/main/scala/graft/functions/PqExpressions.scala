package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantization — the FAISS `IVFADC` compression half, as native
  * Catalyst expressions. A `dim`-dimensional vector splits into `m`
  * contiguous subspaces; each subspace quantizes to its nearest codeword
  * from a per-subspace codebook (trained by the deterministic L2 Lloyd in
  * [[graft.similarity.Knn.pqTrain]]), so a vector stores as `m` bytes of
  * codes instead of `4·dim` (or `2·dim` fp16) bytes — at 100 TB the
  * difference between an index that fits hot storage and one that
  * doesn't (3072-dim fp32 = 12 KB/vec; m=64 PQ = 64 B/vec, 192×).
  * Queries score WITHOUT decoding: an asymmetric-distance lookup table
  * (LUT — the query's exact distance to every codeword, `m × ksub`
  * doubles computed once per query on the driver) turns per-vector
  * scoring into `m` table loads and adds.
  *
  * Float discipline (oracle parity): every squared-L2 here — training
  * assignment, encoding argmin, LUT cells — is the dot-product expansion
  * `dot(a,a) - 2·dot(a,b) + dot(b,b)` with sequential Double
  * accumulation, the exact tree the DuckDB oracle evaluates, so code
  * assignments and ADC scores are bit-identical cross-engine. Distances
  * are approximate BY DESIGN (that is the compression trade); the
  * deterministic part is that both engines compute the SAME approximate
  * number.
  */
object PqMath extends Serializable {

  /** Squared L2 via the dot expansion over a slice of `v` vs a full
    * codeword — sequential Double sums, matching
    * `list_dot_product`-based SQL token for token. */
  def l2SqSlice(v: ArrayData, off: Int, cw: Array[Float]): Double = {
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    while (i < cw.length) {
      val a = v.getFloat(off + i).toDouble
      val b = cw(i).toDouble
      aa += a * a; ab += a * b; bb += b * b
      i += 1
    }
    aa - 2.0 * ab + bb
  }

  /** Encode one vector: per subspace, the lowest-index codeword at
    * minimal squared L2 (strict `<` keeps the FIRST on ties — the
    * row_number tie-break the oracle uses). */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val d = l2SqSlice(v, off, cb(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += cb(0).length
      s += 1
    }
    out
  }

  /** ADC score: Σ_s lut(s)(code_s), summed in subspace order. */
  def adc(codes: Array[Byte], lut: Array[Array[Double]]): Double = {
    var s = 0
    var sum = 0.0
    while (s < lut.length) {
      sum += lut(s)(codes(s) & 0xff)
      s += 1
    }
    sum
  }

  /** The query-side lookup table: exact squared L2 of each query slice
    * against every codeword — `m × ksub` doubles, driver-side, once per
    * query. */
  def lut(q: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val qd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q)
    val out = new Array[Array[Double]](codebooks.length)
    var s = 0
    var off = 0
    while (s < codebooks.length) {
      val cb = codebooks(s)
      out(s) = Array.tabulate(cb.length)(c => l2SqSlice(qd, off, cb(c)))
      off += cb(0).length
      s += 1
    }
    out
  }

  /** Symmetric-distance tables (SDC, Jégou et al. TPAMI'11 §III.A):
    * tables(s)(x)(y) = ||c_s[x] − c_s[y]||² — m·ksub² doubles computed
    * once driver-side. Code-vs-code distance then never touches a float
    * vector: Σ_s tables(s)(x_s)(y_s), m table loads + adds a pair. */
  def sdcTables(codebooks: Array[Array[Array[Float]]]): Array[Array[Array[Double]]] =
    codebooks.map { cb =>
      Array.tabulate(cb.length, cb.length) { (x, y) =>
        var d = 0.0
        var i = 0
        while (i < cb(x).length) {
          val diff = cb(x)(i).toDouble - cb(y)(i).toDouble
          d += diff * diff
          i += 1
        }
        d
      }
    }

  /** SDC score of two stored codes: Σ_s tables(s)(a_s)(b_s). */
  def sdc(a: Array[Byte], b: Array[Byte],
      tables: Array[Array[Array[Double]]]): Double = {
    var s = 0
    var sum = 0.0
    while (s < tables.length) {
      sum += tables(s)(a(s) & 0xff)(b(s) & 0xff)
      s += 1
    }
    sum
  }
}

/** `ARRAY<FLOAT> -> BINARY(m)` — encode a vector to its `m` subspace
  * codes. Codebooks ride as a referenced object (not literals): a
  * m×ksub×(dim/m) float nest inlined as literals would be the q97
  * codegen-size tax all over again. */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: empty codebook")
  require(codebooks.forall(_.length <= 256),
    "pq_encode: ksub must fit one byte (<= 256 codewords per subspace)")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    PqMath.encode(v.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = PqMath.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c => s"$o.encode($c, $cbRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** `BINARY(m) -> DOUBLE` — asymmetric-distance score of a stored code
  * against a query's precomputed LUT. The per-row work is `m` array
  * loads + adds: the scan stays whole-stage-codegen and never touches a
  * float vector. */
case class PqAdcScore(child: Expression,
    lut: Array[Array[Double]]) extends UnaryExpression {
  require(lut.nonEmpty, "pq_adc_score: empty LUT")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score requires BINARY codes, got ${other.simpleString}")
  }
  override def nullSafeEval(codes: Any): Any =
    PqMath.adc(codes.asInstanceOf[Array[Byte]], lut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = PqMath.getClass.getName.stripSuffix("$")
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[][]")
    defineCodeGen(ctx, ev, c => s"$o.adc($c, $lutRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_adc_score"
}

/** Per-cell ADC: each row's codes score against the LUT of the row's OWN
  * cell — the expression that lets an nprobe-cell IVFADC probe run as
  * ONE scan with a partition IN-filter instead of nprobe single-cell
  * scan legs. Under concurrent serving the per-request serialized
  * planning path is the latency floor, and nprobe legs mean nprobe
  * scans to plan: the 4-leg union probed p95 1.47 s at 20 users where
  * the single-scan ivf shape holds ~0.4 s — this collapses the plan
  * back to one leg. LUTs ride as ONE referenced java.util.HashMap
  * (cell → m×ksub table), so generated code is identical across
  * requests and the codegen cache hits. */
case class PqAdcScoreMulti(codes: Expression, cell: Expression,
    luts: Map[Long, Array[Array[Double]]]) extends BinaryExpression {
  require(luts.nonEmpty, "pq_adc_score_cells: empty LUT map")
  override def left: Expression = codes
  override def right: Expression = cell
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, cell.dataType) match {
      case (BinaryType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, k) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score_cells requires (BINARY, INT/BIGINT), got " +
          s"(${c.simpleString}, ${k.simpleString})")
    }

  @transient private lazy val jluts: java.util.HashMap[java.lang.Long, Array[Array[Double]]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Array[Double]]](luts.size * 2)
    luts.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def nullSafeEval(c: Any, k: Any): Any =
    PqMath.adc(c.asInstanceOf[Array[Byte]],
      jluts.get(java.lang.Long.valueOf(k.asInstanceOf[Number].longValue())))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = PqMath.getClass.getName.stripSuffix("$")
    val mRef = ctx.addReferenceObj("pqLuts", jluts, "java.util.HashMap")
    defineCodeGen(ctx, ev, (c, k) =>
      s"$o.adc($c, (double[][]) $mRef.get(java.lang.Long.valueOf((long) $k)))")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(codes = l, cell = r)
  override def prettyName: String = "pq_adc_score_cells"
}

/** `pq_sdc_score(BINARY, BINARY) -> DOUBLE` — symmetric distance between
  * two stored PQ codes via the precomputed per-subspace codeword-pair
  * tables ([[PqMath.sdcTables]]). The metric a compressed NN-Descent
  * ranks by: proposal joins carry m bytes a vector (m=32 at 3072-dim is
  * 384×) and the per-pair work is m table loads + adds. Tables ride as
  * a referenced object like [[PqEncode]]'s codebooks. */
case class PqSdcScore(left: Expression, right: Expression,
    tables: Array[Array[Array[Double]]]) extends BinaryExpression {
  require(tables.nonEmpty && tables.forall(t => t.nonEmpty),
    "pq_sdc_score: empty tables")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_sdc_score requires (BINARY, BINARY), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    PqMath.sdc(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = PqMath.getClass.getName.stripSuffix("$")
    val tRef = ctx.addReferenceObj("pqSdcTables", tables, "double[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"$o.sdc($a, $b, $tRef)")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_sdc_score"
}
