package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.HyperplaneMath

/** Multi-band random-hyperplane LSH ([[Dedup.embeddingBandedLshPairs]]):
  * recall against the exact pair set, exactness of the verify stage, seed
  * determinism, and the sign-mix quality guard (the xorshift between LCG
  * rounds is load-bearing — an affine mix leaves planes correlated and
  * recall collapses).
  */
class HyperplaneLshSpec extends SparkTestBase {

  private def emb = table("embeddings").filter(col("vec_id") < 300)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact = pairSet(
    Dedup.embeddingNearDupPairs(emb, "embedding", "vec_id", maxDistance = 0.7))

  test("banded pairs are a subset of the exact pair set (verify stage is exact)") {
    val banded = pairSet(Dedup.embeddingBandedLshPairs(
      emb, "embedding", "vec_id", maxDistance = 0.7))
    assert(banded.nonEmpty)
    assert(banded.subsetOf(exact),
      s"banded reported ${banded.diff(exact).size} pairs the exact scan rejects")
  }

  test("multi-band recall >= 0.95 at the gated threshold where single-band collapses") {
    val banded = pairSet(Dedup.embeddingBandedLshPairs(
      emb, "embedding", "vec_id", maxDistance = 0.7,
      bands = 16, rowsPerBand = 3, seed = 12345L))
    val single = pairSet(Dedup.embeddingLshPairs(
      emb, "embedding", "vec_id", maxDistance = 0.7, nBits = 8))
    val recallBanded = banded.intersect(exact).size.toDouble / exact.size
    val recallSingle = single.intersect(exact).size.toDouble / exact.size
    assert(recallBanded >= 0.95, s"banded recall $recallBanded")
    // the distance-0.7 regime (per-plane agreement ~0.6) is exactly where
    // one band of axis-aligned sign bits loses almost everything
    assert(recallSingle < 0.5, s"single-band recall $recallSingle")
    assert(recallBanded > recallSingle + 0.4)
  }

  test("same seed reproduces the pair set; a different seed still verifies exactly") {
    val a = pairSet(Dedup.embeddingBandedLshPairs(
      emb, "embedding", "vec_id", 0.7, seed = 777L))
    val b = pairSet(Dedup.embeddingBandedLshPairs(
      emb, "embedding", "vec_id", 0.7, seed = 777L))
    assert(a == b)
    assert(a.subsetOf(exact)) // candidates differ by seed, verification never does
  }

  test("plane signs are balanced and pairwise-decorrelated (xorshift guard)") {
    val planes = 48
    val dim = 64
    val s = Array.tabulate(planes, dim)((p, j) =>
      HyperplaneMath.sign(12345L, p, j).toDouble)
    val balance = s.map(row => math.abs(row.sum) / dim)
    assert(balance.max < 0.5, s"worst plane imbalance ${balance.max}")
    val corrs = for {
      p <- 0 until planes; q <- (p + 1) until planes
    } yield math.abs((0 until dim).map(j => s(p)(j) * s(q)(j)).sum / dim)
    val meanCorr = corrs.sum / corrs.size
    // Rademacher floor is 1/sqrt(64) ~ 0.125; the affine-LCG bug this
    // guards against measured mean 0.50 with some planes IDENTICAL
    assert(meanCorr < 0.2, s"mean |corr| $meanCorr — sign mix regressed")
    assert(corrs.max < 1.0, "two planes are identical")
  }

  test("hyperplane_bands is callable from SQL with literal parameters") {
    val out = spark.sql(
      "SELECT hyperplane_bands(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 4, 3, 7) AS h")
      .collect()(0).getSeq[Long](0)
    assert(out.length == 4)
    assert(out.forall(sig => sig >= 0 && sig < 8)) // 3 bits per band
  }

  test("hyperplane_bands rejects fractional and out-of-Int-range literals") {
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil else t.getMessage :: msgs(t.getCause)
      assert(msgs(e).exists(m => m != null && m.contains(frag)),
        s"expected '$frag' in ${msgs(e)}")
    }
    val vec = "array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT))"
    fails(s"SELECT hyperplane_bands($vec, 4.5, 3, 7)", "integer literal")
    fails(s"SELECT hyperplane_bands($vec, 4, 3000000000, 7)",
      "outside Int range")
    fails(s"SELECT word_shingles('a b c', 2.5)", "integer literal")
  }
}
