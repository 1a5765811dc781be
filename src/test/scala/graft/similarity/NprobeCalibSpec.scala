package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Knn.nprobeRecallCurve]] / [[Knn.calibrateNprobe]]: the measured
  * dial's structural guarantees — monotone in width, exact at the full
  * width, deterministic — and the picker's minimality contract. */
class NprobeCalibSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings")
    .filter($"embedding".isNotNull).cache()

  private lazy val cents = Knn.trainCentroids(
    emb.select($"vec_id".as("id"), $"embedding".as("v")),
    "v", "id", k = 8, iters = 2).cache()

  private lazy val qs = emb.filter($"vec_id" % 37 === 0)

  private lazy val curve: Seq[(Int, Double)] =
    Knn.nprobeRecallCurve(emb, "embedding", "vec_id",
        cents, "cvec", "centroid_id", qs, "embedding", "vec_id",
        k = 10, maxNprobe = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq

  test("recall is monotone non-decreasing in probe width") {
    assert(curve.map(_._1) == (1 to 8))
    curve.sliding(2).foreach { case Seq((_, a), (np, b)) =>
      assert(b >= a, s"recall fell from $a to $b at nprobe=$np")
    }
    assert(curve.head._2 > 0.0)
  }

  test("recall at the full width is exactly 1.0") {
    // all cells probed = the exact scan: recall's numerator counts
    // every hit, the integer arithmetic makes equality exact, not ≈
    assert(curve.last == (8, 1.0))
  }

  test("the curve is deterministic under repartitioning") {
    val again = Knn.nprobeRecallCurve(emb.repartition(7), "embedding",
        "vec_id", cents, "cvec", "centroid_id", qs, "embedding",
        "vec_id", k = 10, maxNprobe = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(again == curve)
  }

  test("calibrateNprobe picks the smallest width meeting the target") {
    // a target sitting strictly between two curve points must resolve
    // to the SECOND point's width and never a wider one
    val mid = curve.map(_._2).distinct
    assume(mid.size >= 2, "fixture produced a flat curve")
    val target = (mid(0) + mid(1)) / 2.0
    val picked = Knn.calibrateNprobe(emb, "embedding", "vec_id",
      cents, "cvec", "centroid_id", qs, "embedding", "vec_id",
      k = 10, maxNprobe = 8, targetRecall = target)
    val wantNp = curve.collectFirst {
      case (np, r) if r >= target => np }.get
    assert(picked == wantNp)
    // reachable bottom: target 0 → width 1; unreachable → maxNprobe
    assert(Knn.calibrateNprobe(emb, "embedding", "vec_id",
      cents, "cvec", "centroid_id", qs, "embedding", "vec_id",
      k = 10, maxNprobe = 8, targetRecall = 0.0) == 1)
    assert(Knn.calibrateNprobe(emb, "embedding", "vec_id",
      cents, "cvec", "centroid_id", qs, "embedding", "vec_id",
      k = 10, maxNprobe = 4, targetRecall = 1.1) == 4)
  }
}
