package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SOAR spilled assignment ([[Soar]]): shape, the λ = 0 degeneracy to
  * plain second-nearest multi-assignment, the zero-residual guard, the
  * orthogonality preference the λ term exists to buy, losslessness at
  * exhaustive probes, and the measured recall claim — spilled lists
  * beat single assignment at equal nprobe on boundary-heavy data. */
class SoarSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings")
    .filter($"embedding".isNotNull).cache()

  private lazy val cents8 = Knn.trainCentroidsL2(
    emb.select($"vec_id".as("id"), $"embedding".as("v")),
    "v", "id", k = 8, iters = 2).cache()

  test("every vector appears exactly twice, in two distinct cells") {
    val a = Soar.assign(emb, "embedding", "vec_id", cents8).cache()
    val n = emb.count()
    assert(a.count() == 2 * n)
    val perId = a.groupBy($"id")
      .agg(count(lit(1)).as("copies"),
        countDistinct($"centroid_id").as("cells"),
        countDistinct($"crank").as("ranks"))
    assert(perId.filter($"copies" =!= 2 || $"cells" =!= 2 ||
      $"ranks" =!= 2).count() == 0)
    a.unpersist()
  }

  test("assignment is deterministic under repartitioning") {
    val a = Soar.assign(emb, "embedding", "vec_id", cents8)
      .select($"id", $"centroid_id", $"crank")
      .collect().map(_.toSeq).toSet
    val b = Soar.assign(emb.repartition(7), "embedding", "vec_id", cents8)
      .select($"id", $"centroid_id", $"crank")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("lambda = 0 degenerates to plain second-nearest multi-assignment") {
    val soar0 = Soar.assign(emb, "embedding", "vec_id", cents8,
        lambda = 0.0)
      .filter($"crank" === 2)
      .select($"id", $"centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // plain nprobe=2 picks under the same L2: the second row per id
    val c = emb.select($"vec_id".as("id"), $"embedding".as("v"))
    val second = Knn.cellPicks(c, cents8, nprobe = 2, Knn.l2sq)
      .filter($"crank" === 2)
      .select($"id", $"centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(soar0 == second)
  }

  test("zero residual guards to plain L2 over the remaining cells") {
    // a corpus point that IS a centroid: r = 0, so the secondary must be
    // the plain-L2 nearest of the OTHER cells
    val cents = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(4f, 0f)), (2L, Seq(0f, 3f)))
      .toDF("centroid_id", "cvec")
    val corpus = Seq((7L, Seq(0f, 0f))).toDF("id", "v")
    val sec = Soar.assign(corpus, "v", "id", cents)
      .filter($"crank" === 2).select($"centroid_id")
      .head().getLong(0)
    assert(sec == 2L) // (0,3) at d²=9 beats (4,0) at d²=16
  }

  test("the amplified loss prefers the orthogonal-residual cell") {
    // x=(1,0): primary (0,0) (tie with (2,0) broken to the lower id),
    // r=(1,0). Candidates at equal plain L2=1: (2,0) has residual
    // parallel to r (rdot=-1), (1,1) orthogonal (rdot=0) — λ=1 must
    // pick (1,1); λ=0 ties back to the lower id (2,0).
    val cents = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(2f, 0f)), (2L, Seq(1f, 1f)))
      .toDF("centroid_id", "cvec")
    val corpus = Seq((7L, Seq(1f, 0f))).toDF("id", "v")
    def pick(lambda: Double): (Long, Long) = {
      val rows = Soar.assign(corpus, "v", "id", cents, lambda)
        .orderBy($"crank").select($"centroid_id").collect()
      (rows(0).getLong(0), rows(1).getLong(0))
    }
    assert(pick(1.0) == (0L, 2L))
    assert(pick(0.0) == (0L, 1L))
  }

  test("assignment plans bounded-heap aggregates — no window, no " +
      "sort-aggregate") {
    // the r14 lesson applied to the new operator: both argmins rank
    // through topk_pairs (ObjectHashAggregate) and the loss never rides
    // a window or a struct-min, whose partial pass sorts all n×cells
    // scored rows per task
    val plan = Soar.assign(emb, "embedding", "vec_id", cents8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_pairs"), plan.take(500))
    assert(!plan.contains("Window"), "candidate-wide window resurrected")
    assert(!plan.contains("SortAggregate"),
      "secondary argmin fell back to sort aggregation")
  }

  test("exhaustive probes equal brute-force L2 top-k (copies collapse)") {
    val a = Soar.assign(emb, "embedding", "vec_id", cents8).cache()
    val qv = emb.filter($"vec_id" === 13).select($"embedding")
      .head().getSeq[Float](0).toArray
    val got = Soar.topKProbes(a, cents8, qv, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = emb.select($"vec_id".as("id"),
        Knn.l2sq($"embedding", typedLit(qv)).as("score"))
      .orderBy($"score".asc, $"id".asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("spilled lists beat single assignment at equal nprobe on " +
      "boundary-heavy data") {
    // 64 points on the unit circle, 4 fixed centers on the axes: every
    // cell boundary (the diagonals) is dense with points whose true
    // neighborhoods straddle two cells — the regime SOAR exists for
    val pts = (0 until 64).map { i =>
      val t = 2.0 * math.Pi * i / 64
      (i.toLong, Seq(math.cos(t).toFloat, math.sin(t).toFloat))
    }
    val corpus = pts.toDF("id", "v").cache()
    val cents = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(-1f, 0f)), (3L, Seq(0f, -1f)))
      .toDF("centroid_id", "cvec").cache()
    val single = Knn.ivfAssignL2(corpus, "v", "id",
      cents, "cvec", "centroid_id").cache()
    val spilled = Soar.assign(corpus, "v", "id", cents).cache()
    val k = 5
    def exactTop(qv: Array[Float]): Set[Long] = pts
      .map { case (id, v) =>
        val d = v.zip(qv).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
    var singleHits = 0
    var soarHits = 0
    pts.foreach { case (_, v) =>
      val qv = v.toArray
      val exact = exactTop(qv)
      val s1 = Knn.ivfTopKProbes(single, cents, "cvec", "centroid_id",
          qv, k, nprobe = 1)
        .collect().map(_.getLong(0)).toSet
      val s2 = Soar.topKProbes(spilled, cents, qv, k, nprobe = 1)
        .collect().map(_.getLong(0)).toSet
      // candidate superset ⇒ per-query recall can only improve: the
      // probed cell's spilled membership contains every primary member
      singleHits += (s1 & exact).size
      soarHits += (s2 & exact).size
    }
    assert(soarHits > singleHits,
      s"soar recall $soarHits must beat single-assignment $singleHits " +
        s"on the boundary fixture")
    assert(soarHits >= 64 * k * 9 / 10,
      s"soar recall $soarHits unexpectedly low on 64 queries @ k=$k")
  }
}
