package graft.fixtures

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Fp16

/** Deterministic clustered corpus with ANISOTROPIC cell residuals — the
  * regime SOAR's orthogonality-amplified spill loss is derived for
  * (Sun/Guo/Kumar, NeurIPS'23 §4: the λ term pays when a cell's
  * residual distribution has strong principal directions, so the
  * primary quantization error concentrates along a few axes the
  * secondary cell can be chosen to cover).
  *
  * [[ManifoldCorpus]] puts every point on one GLOBAL low-dim manifold:
  * after IVF carves it into cells, within-cell residuals are dominated
  * by the isotropic noise term — measured (SCALE.md §r15 SOAR) λ=1 vs
  * λ=0 within one-hit noise there, because there is no residual
  * direction to exploit. Here the anisotropy is IN the residual by
  * construction:
  *
  *   vec(v) = center(c) + s · Σ_j decay^j · z_j(v) · dir(c, j),
  *   c = v mod clusters
  *
  * with `rank` directions per cluster and geometric `decay`: at the
  * default decay 0.5 the first direction carries ~77 % of residual
  * variance (1 : 0.25 : 0.06 : 0.016), so a vector's quantization
  * error after assignment to its center is nearly collinear with
  * dir(c, 0) — exactly the failure mode the λ term's ⟨r, x−c⟩² penalty
  * steers the secondary assignment away from, and the one plain
  * second-nearest assignment duplicates (the second-nearest center
  * sits along the dominant direction too, on the same axis).
  *
  * Cluster centers are unit vectors; `s` scales residual magnitude
  * relative to them. z_j is a 4-fold Irwin–Hall draw (≈ normal, mean 0,
  * var 1/3) so residual coordinates are bell-shaped, not uniform-boxy.
  * splitmix64 keying throughout (the [[ManifoldCorpus]] lesson: affine
  * mixes degenerate latent draws). Measurement fixture only — nothing
  * here needs SQL reproduction.
  */
object AnisoCorpus {

  val Dim = 64

  private def h64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def unit(key: Long): Double =
    (h64(key) >>> 11).toDouble / (1L << 52).toDouble - 1.0

  /** ≈ N(0, 1/3): mean of 4 uniform [-1,1] draws keeps tails bounded
    * (|z| ≤ 1) while shaping the bulk — enough bell for a residual. */
  private def gauss(key: Long): Double =
    (unit(key) + unit(key ^ 0x5851F42D4C957F2DL) +
      unit(key ^ 0x14057B7EF767814FL) + unit(key ^ 0x27BB2EE687B0B0FDL)) / 2.0

  private val CenterSalt = 0x43454E5445525341L
  private val DirSalt = 0x4449525354414C54L
  private val ZSalt = 0x5A53414C54414E49L

  /** Unit-norm center of cluster `c`. */
  def center(c: Int): Array[Double] = {
    val a = Array.tabulate(Dim)(i => unit(CenterSalt ^ (c.toLong << 16) ^ i.toLong))
    val n = math.sqrt(a.map(x => x * x).sum)
    a.map(_ / n)
  }

  /** Unit-norm residual direction `j` of cluster `c`. */
  def dir(c: Int, j: Int): Array[Double] = {
    val a = Array.tabulate(Dim)(i =>
      unit(DirSalt ^ (c.toLong << 24) ^ (j.toLong << 16) ^ i.toLong))
    val n = math.sqrt(a.map(x => x * x).sum)
    a.map(_ / n)
  }

  // centers/dirs are KBs; memoize per JVM like ManifoldCorpus.basis
  private val centerCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  def vector(vecId: Long, clusters: Int = 512, rank: Int = 4,
      decay: Double = 0.5, s: Double = 0.25): Array[Float] = {
    val c = (Math.floorMod(vecId, clusters.toLong)).toInt
    val ctr = centerCache.computeIfAbsent(c, center)
    val a = new Array[Double](Dim)
    System.arraycopy(ctr, 0, a, 0, Dim)
    var j = 0
    var w = s
    while (j < rank) {
      val d = dirCache.computeIfAbsent(c.toLong << 8 | j.toLong,
        k => dir((k >> 8).toInt, (k & 0xFF).toInt))
      val z = gauss(ZSalt ^ (vecId * 16L + j))
      var i = 0
      while (i < Dim) { a(i) += w * z * d(i); i += 1 }
      w *= decay
      j += 1
    }
    a.map(_.toFloat)
  }

  /** Materialized `(vec_id BIGINT, emb16 BINARY)` fixture —
    * [[Fp16Corpus.prepared]]'s write-once/cache contract, keyed by
    * every shape parameter. */
  def prepared(spark: SparkSession, n: Long, clusters: Int = 512,
      rank: Int = 4, decay: Double = 0.5, s: Double = 0.25): DataFrame = {
    val path = s"${Fp16Corpus.workRoot}/anisocorpus-n$n-c$clusters-r$rank-" +
      s"d$decay-s$s.parquet"
    if (!new File(path, "_SUCCESS").isFile) {
      import spark.implicits._
      spark.range(n)
        .mapPartitions(_.map(vid =>
          (vid, Fp16.encode(vector(vid, clusters, rank, decay, s)))))
        .toDF("vec_id", "emb16")
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path).cache()
  }
}
