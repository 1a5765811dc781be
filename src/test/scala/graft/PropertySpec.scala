package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fp16, VectorMath}
import graft.text.TextMath

/** Property tests for the math kernels (SURVEY.md §5: strictly stronger
  * than the reference's mock-based strategy — these are the invariants the
  * oracle comparison rests on). Raw ScalaCheck generators with a fixed seed
  * (the scalatest bridge isn't on the offline classpath); all properties
  * are exact mathematical invariants, so any sample must satisfy them. */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] = {
    var seed = Seed(42L)
    (0 until n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))

  test("cosine distance: symmetry, self-zero, bounds, positive-scale invariance") {
    for (Seq(a, b) <- samples(Gen.listOfN(2, vecGen))) {
      val d = VectorMath.cosineDistance(a, b)
      assert(d >= -1e-9 && d <= 2.0 + 1e-9)
      assert(math.abs(d - VectorMath.cosineDistance(b, a)) < 1e-12)
    }
    for (a <- samples(vecGen) if VectorMath.norm(a) > 1e-3) {
      assert(math.abs(VectorMath.cosineDistance(a, a)) < 1e-9)
      assert(math.abs(VectorMath.cosineDistance(a, a.map(_ * 3.5f))) < 1e-5)
    }
  }

  test("ngrams/shingles: counts, bounds, and distinct-subset invariants") {
    import org.apache.spark.unsafe.types.UTF8String
    val textGen: Gen[String] = Gen.listOf(
      Gen.oneOf("a", "b", "ab", "ccc", "")).map(_.mkString(" "))
    for (s <- samples(textGen); k <- Seq(1, 2, 3)) {
      val t = UTF8String.fromString(s)
      val n = s.split(" ", -1).length
      val all = TextMath.ngrams(t, k)
      val dist = TextMath.shingles(t, k)
      // multiplicity-preserving count is exact; distinct is a subset of it
      assert(all.length == math.max(0, n - k + 1))
      assert(dist.length <= all.length)
      assert(dist.toSet == all.toSet)
      // distinct preserves first-occurrence order
      assert(dist.toSeq == all.toSeq.distinct)
      // duplicate fraction implied by the pair is always in [0, 1)
      if (all.nonEmpty) {
        val frac = 1.0 - dist.length.toDouble / all.length.toDouble
        assert(frac >= 0.0 && frac < 1.0)
      }
    }
  }

  test("l2 distance: symmetry, self-zero, triangle inequality") {
    for (Seq(a, b, c) <- samples(Gen.listOfN(3, vecGen))) {
      val n = Seq(a.length, b.length, c.length).min
      val (x, y, z) = (a.take(n), b.take(n), c.take(n))
      assert(VectorMath.l2Distance(x, y) == VectorMath.l2Distance(y, x))
      assert(VectorMath.l2Distance(x, x) == 0.0)
      assert(VectorMath.l2Distance(x, z) <=
        VectorMath.l2Distance(x, y) + VectorMath.l2Distance(y, z) + 1e-9)
    }
  }

  test("fp16 codec: round-trip relative error ≤ 2^-11 in the normal range") {
    for (v <- samples(Gen.chooseNum(-60000f, 60000f))
         if math.abs(v) > 1e-4f && math.abs(v) < 60000f) {
      val r = Fp16.halfToFloat(Fp16.floatToHalf(v))
      assert(math.abs(r - v) / math.abs(v) <= math.pow(2, -11) + 1e-12,
        s"value $v round-tripped to $r")
    }
    for (a <- samples(vecGen)) {
      val rt = Fp16.decode(Fp16.encode(a))
      assert(rt.length == a.length)
      // fp16 values are fixed points of the codec
      assert(Fp16.encode(rt).toSeq == Fp16.encode(a).toSeq)
    }
  }

  test("polyHash: deterministic, in [0, p)") {
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- samples(Gen.asciiPrintableStr)) {
      val h = TextMath.polyHash(UTF8String.fromString(s))
      assert(h >= 0 && h < TextMath.Mod)
      assert(h == TextMath.polyHash(UTF8String.fromString(s)))
    }
  }

  test("minhash signature: monotone under superset (elementwise min property)") {
    val hashesGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, TextMath.Mod - 1))
    for (Seq(xs, ys) <- samples(Gen.listOfN(2, hashesGen), 150)) {
      val sigUnion = TextMath.minHashSig((xs ++ ys).toArray)
      val sigX = TextMath.minHashSig(xs.toArray)
      assert(sigUnion.zip(sigX).forall { case (u, x) => u <= x })
    }
  }
}
