package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-band random-hyperplane LSH signatures for embedding near-dup —
  * the banded scale path the SimHash/MinHash families already have,
  * brought to the embedding modality (replaces the single-band axis-
  * aligned sign bucket of `Dedup.embeddingLshPairs` as the 100-TB shape).
  *
  * Each of `bands × rowsPerBand` hyperplanes is a seeded Rademacher (±1)
  * direction: sign(b, i, j) is derived from a deterministic integer mix of
  * (plane, dimension, seed). ±1 directions are an angle-preserving LSH
  * family in high dimension (sign agreement probability ≈ 1 − θ/π, the
  * Goemans–Williamson / Charikar bound), and — unlike Gaussian draws —
  * the mix is exactly replicable in plain integer SQL, which is what
  * makes the operator oracle-checkable.
  *
  * The mix is two LCG rounds (mod 2³¹, so no 64-bit multiply can
  * overflow — DuckDB raises on int64 overflow rather than wrapping) with
  * an xorshift BETWEEN the rounds: a pure LCG is affine, so planes at
  * constant index stride stay correlated forever (measured mean |corr|
  * 0.50 over this corpus, some planes identical — recall collapses); the
  * xorshift breaks the affinity (measured mean |corr| 0.10 ≈ the 1/√dim
  * Rademacher floor).
  */
object HyperplaneMath extends Serializable {

  private val Mod = 1L << 31
  private val MulA = 1103515245L // Knuth/glibc LCG; MulA · 2³¹ < 2⁶³
  private val IncC = 12345L

  /** ±1 sign of hyperplane `plane`, dimension `j`, under `seed`. */
  def sign(seed: Long, plane: Int, j: Int): Int = {
    val idx = plane.toLong * 65536L + j // injective for dim < 65536
    val x1 = (MulA * ((idx + seed) % Mod) + IncC) % Mod
    val y1 = x1 ^ (x1 >> 15)
    val x2 = (MulA * y1 + IncC) % Mod
    val y2 = x2 ^ (x2 >> 13)
    if (((y2 >> 16) & 1L) == 0L) 1 else -1
  }

  // sign matrices are pure functions of (seed, planes, dim): cache one
  // byte matrix per distinct configuration per executor instead of
  // re-deriving 5 integer ops per (plane, dim) per ROW
  private val cache = new ConcurrentHashMap[(Long, Int, Int), Array[Array[Byte]]]()

  private def signs(seed: Long, planes: Int, dim: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((seed, planes, dim), { _ =>
      Array.tabulate(planes, dim)((p, j) => sign(seed, p, j).toByte)
    })

  /** Band signatures of one vector: `bands` longs, band b's bit i set iff
    * the (b·rowsPerBand + i)-th hyperplane dot product is strictly
    * positive. Sequential double accumulation over j, so an oracle that
    * widens the float list to DOUBLE and folds left reproduces every bit. */
  def bandSignatures(v: ArrayData, bands: Int, rowsPerBand: Int,
      seed: Long): ArrayData = {
    val dim = v.numElements()
    val s = signs(seed, bands * rowsPerBand, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < rowsPerBand) {
        val row = s(b * rowsPerBand + i)
        var dot = 0.0
        var j = 0
        while (j < dim) {
          val x = v.getFloat(j).toDouble
          dot += (if (row(j) > 0) x else -x)
          j += 1
        }
        if (dot > 0.0) sig |= 1L << i
        i += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `hyperplane_bands(vec)` → ARRAY<BIGINT> of length `bands` — one
  * LSH band signature per slot (bit i of band b = sign of hyperplane
  * b·rowsPerBand+i). Codegen'd; band/row/seed parameters are plan-time
  * literals baked into the generated call. */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int,
    seed: Long) extends UnaryExpression {
  require(bands >= 1 && bands <= 64, s"hyperplane_bands: bands in [1,64], got $bands")
  require(rowsPerBand >= 1 && rowsPerBand <= 63,
    s"hyperplane_bands: rowsPerBand in [1,63], got $rowsPerBand")
  require(seed >= 0 && seed < (1L << 31),
    s"hyperplane_bands: seed must be in [0, 2^31), got $seed")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HyperplaneMath.bandSignatures(v.asInstanceOf[ArrayData], bands, rowsPerBand, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hm = HyperplaneMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev,
      c => s"$hm.bandSignatures($c, $bands, $rowsPerBand, ${seed}L)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hyperplane_bands"
}
