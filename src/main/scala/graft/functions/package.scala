package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Column-API facade over graft's custom Catalyst expressions, mirroring
  * `org.apache.spark.sql.functions`. Also registers them for SQL use.
  */
package object functions {

  /** SQL builder for `name(text, k)` expressions whose `k` must be a
    * literal integer (it parameterizes generated code) — shared by the
    * per-session registry and [[graft.GraftExtensions]] so the arity and
    * literal checks can't drift between the two registration paths. */
  /** Evaluate a foldable expression as an integral literal, rejecting
    * non-literals and fractional values (2.5 must error, not truncate to
    * 2 — these parameterize generated code, so silent truncation would
    * change semantics invisibly). */
  private def integralLiteral(e: Expression, fn: String, what: String): Long =
    (if (e.foldable) e.eval() else null) match {
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) =>
        n.asInstanceOf[Number].longValue()
      case d: java.math.BigDecimal =>
        try d.longValueExact() catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"$fn: $what=$d must be an integer literal in Long range")
        }
      case d: org.apache.spark.sql.types.Decimal =>
        try d.toJavaBigDecimal.longValueExact()
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"$fn: $what=$d must be an integer literal in Long range")
        }
      case n: Number => throw new IllegalArgumentException(
        s"$fn: $what=$n must be an integer literal (got a fractional value)")
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a literal integer")
    }

  /** [[integralLiteral]] further narrowed to Int range. */
  private def intLiteral(e: Expression, fn: String, what: String): Int = {
    val l = integralLiteral(e, fn, what)
    if (l < Int.MinValue || l > Int.MaxValue)
      throw new IllegalArgumentException(s"$fn: $what=$l is outside Int range")
    l.toInt
  }

  private[graft] def literalKBuilder(name: String)(
      make: (Expression, Int) => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"$name(text, k) requires exactly 2 arguments")
      make(exprs(0), intLiteral(exprs(1), name, "k"))
    }

  /** SQL builder for `hyperplane_bands(vec, bands, rowsPerBand, seed)` —
    * the three parameters configure generated code, so they must be
    * literals; shared by both registration paths. */
  private[graft] val hyperplaneBandsBuilder: Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 4) throw new IllegalArgumentException(
        "hyperplane_bands(vec, bands, rowsPerBand, seed) requires exactly 4 arguments")
      val fn = "hyperplane_bands"
      HyperplaneBands(exprs.head, intLiteral(exprs(1), fn, "bands"),
        intLiteral(exprs(2), fn, "rowsPerBand"),
        integralLiteral(exprs(3), fn, "seed"))
    }

  def cosine_distance(a: Column, b: Column): Column =
    shims.column(CosineDistance(shims.expression(a), shims.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    shims.column(DotProduct(shims.expression(a), shims.expression(b)))

  def l2_distance(a: Column, b: Column): Column =
    shims.column(L2Distance(shims.expression(a), shims.expression(b)))

  def poly_hash(c: Column): Column =
    shims.column(graft.text.PolyHash(shims.expression(c)))

  def nfc_normalize(c: Column): Column =
    shims.column(graft.text.NfcNormalize(shims.expression(c)))

  def word_shingles(c: Column, k: Int): Column =
    shims.column(graft.text.WordShingles(shims.expression(c), k))

  def word_ngrams(c: Column, k: Int): Column =
    shims.column(graft.text.WordNgrams(shims.expression(c), k))

  def char_ngram_hashes(c: Column, n: Int): Column =
    shims.column(graft.text.CharNgramHashes(shims.expression(c), n))

  def array_poly_hash(c: Column): Column =
    shims.column(graft.text.ArrayPolyHash(shims.expression(c)))

  def minhash_sig(c: Column): Column =
    shims.column(graft.text.MinHashSig(shims.expression(c)))

  def simhash16(c: Column): Column =
    shims.column(graft.text.SimHash16(shims.expression(c)))

  def simhash64(c: Column): Column =
    shims.column(graft.text.SimHash64(shims.expression(c)))

  def hyperplane_bands(c: Column, bands: Int, rowsPerBand: Int,
      seed: Long): Column =
    shims.column(HyperplaneBands(shims.expression(c), bands, rowsPerBand, seed))

  /** Product-quantize a vector to `m` subspace codes (BINARY). */
  def pq_encode(c: Column, codebooks: Array[Array[Array[Float]]]): Column =
    shims.column(PqEncode(shims.expression(c), codebooks))

  /** ADC score of PQ codes against a query's precomputed LUT. */
  def pq_adc_score_cells(codes: Column, cell: Column,
      luts: Map[Long, Array[Array[Double]]]): Column =
    shims.column(PqAdcScoreMulti(shims.expression(codes),
      shims.expression(cell), luts))

  def pq_adc_score(c: Column, lut: Array[Array[Double]]): Column =
    shims.column(PqAdcScore(shims.expression(c), lut))

  /** Rotate a vector by a referenced orthonormal matrix (OPQ). */
  def mat_vec_rotate(c: Column, rotation: Array[Array[Double]]): Column =
    shims.column(MatVecRotate(shims.expression(c), rotation))

  /** Reconstruct a PQ-coded vector from its codewords. */
  def pq_decode(c: Column, codebooks: Array[Array[Array[Float]]]): Column =
    shims.column(PqDecode(shims.expression(c), codebooks))

  /** Residual-quantize a vector to `stages` full-dimension codes. */
  def rq_encode(c: Column, codebooks: Array[Array[Array[Float]]]): Column =
    shims.column(RqEncode(shims.expression(c), codebooks))

  /** ADC score of RQ codes against a query's precomputed tables. */
  def rq_adc_score(c: Column, qq: Double, qLut: Array[Array[Double]],
      nLut: Array[Array[Double]], xLut: Array[Array[Array[Double]]]): Column =
    shims.column(RqAdcScore(shims.expression(c), qq, qLut, nLut, xLut))

  def fp16_encode(c: Column): Column =
    shims.column(Fp16Encode(shims.expression(c)))

  def fp16_decode(c: Column): Column =
    shims.column(Fp16Decode(shims.expression(c)))

  def fp16_cosine_distance(b: Column, q: Column): Column =
    shims.column(Fp16CosineDistance(shims.expression(b), shims.expression(q)))

  def int8_encode(c: Column): Column =
    shims.column(Int8Encode(shims.expression(c)))

  def int8_decode(c: Column): Column =
    shims.column(Int8Decode(shims.expression(c)))

  def int8_cosine_distance(b: Column, q: Column): Column =
    shims.column(Int8CosineDistance(shims.expression(b), shims.expression(q)))

  /** Cosine distance between two stored int8 blobs (integer-only loop;
    * scales cancel) — the compressed-descent ranking metric. */
  def int8_cosine_codes(a: Column, b: Column): Column =
    shims.column(Int8CosineCodes(shims.expression(a), shims.expression(b)))

  /** Symmetric PQ distance of two stored codes via precomputed
    * codeword-pair tables ([[PqMath.sdcTables]]). */
  def pq_sdc_score(a: Column, b: Column,
      tables: Array[Array[Array[Double]]]): Column =
    shims.column(PqSdcScore(shims.expression(a), shims.expression(b), tables))

  /** Grouped top-k aggregate: the k smallest (ord, id) pairs per group
    * as ARRAY<STRUCT<ord, id>> — see [[TopKPairs]]. Arguments coerce to
    * (DOUBLE, BIGINT) via Cast, so FLOAT distances and INT ids work. */
  def topk_pairs(ord: Column, id: Column, k: Int): Column =
    shims.column(TopKPairs(
      Cast(shims.expression(ord), DoubleType),
      Cast(shims.expression(id), LongType), k).toAggregateExpression())

  /** Register graft functions in the session's FunctionRegistry so they are
    * callable from `spark.sql(...)` as `cosine_distance(a, b)` etc. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_distance", exprs => CosineDistance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "l2_distance", exprs => L2Distance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "poly_hash", exprs => graft.text.PolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "nfc_normalize", exprs => graft.text.NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      literalKBuilder("word_shingles")(graft.text.WordShingles(_, _)), "built-in")
    reg.createOrReplaceTempFunction("word_ngrams",
      literalKBuilder("word_ngrams")(graft.text.WordNgrams(_, _)), "built-in")
    reg.createOrReplaceTempFunction("char_ngram_hashes",
      literalKBuilder("char_ngram_hashes")(
        graft.text.CharNgramHashes(_, _)), "built-in")
    reg.createOrReplaceTempFunction(
      "array_poly_hash", exprs => graft.text.ArrayPolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => graft.text.MinHashSig(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash16", exprs => graft.text.SimHash16(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => graft.text.SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_bands",
      hyperplaneBandsBuilder, "built-in")
    reg.createOrReplaceTempFunction("topk_pairs", exprs => {
      if (exprs.length != 3) throw new IllegalArgumentException(
        "topk_pairs(ord, id, k) requires exactly 3 arguments")
      val kl = integralLiteral(exprs(2), "topk_pairs", "k")
      if (kl < 1 || kl > (1L << 20)) throw new IllegalArgumentException(
        s"topk_pairs: need 1 <= k <= 2^20, got $kl")
      TopKPairs(Cast(exprs(0), DoubleType), Cast(exprs(1), LongType),
        kl.toInt).toAggregateExpression()
    }, "built-in")
    reg.createOrReplaceTempFunction(
      "fp16_encode", exprs => Fp16Encode(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "fp16_decode", exprs => Fp16Decode(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "fp16_cosine_distance",
      exprs => Fp16CosineDistance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_encode", exprs => Int8Encode(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_decode", exprs => Int8Decode(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_cosine_distance",
      exprs => Int8CosineDistance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_cosine_codes",
      exprs => Int8CosineCodes(exprs(0), exprs(1)), "built-in")
    // fuse decode+cosine on sessions not built through GraftExtensions
    // (extraOptimizations appends a user batch after the main optimizer)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(FuseFp16Cosine))
      spark.experimental.extraOptimizations = extra :+ FuseFp16Cosine
  }
}
