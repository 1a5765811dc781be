package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Anisotropic VQ ([[Anisotropic]]): the η=1 degeneracy to plain Lloyd,
  * determinism, and the learned half of the ScaNN claim — on a corpus
  * with real norm spread, score-aware codewords rank MIPS candidates
  * better than L2-optimal ones at the same budget. */
class AnisotropicSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings")
    .filter($"embedding".isNotNull).cache()

  /** Norm-spread corpus: ‖v‖ scaled 1×–5× by id — inner products are
    * dominated by the high-norm tail, the regime MIPS lives in. */
  private lazy val spread: DataFrame = emb
    .select($"vec_id".as("id"), $"embedding")
    .as[(Long, Seq[Float])]
    .map { case (id, v) =>
      val s = 1.0f + (id % 5)
      (id, v.map(_ * s))
    }.toDF("id", "v").cache()

  test("eta = 1 degenerates to the plain L2 Lloyd codebook") {
    val c = spread.select($"id", $"v")
    val plain = Knn.trainCentroidsL2(c, "v", "id", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val aniso = Anisotropic.train(c, "v", "id", k = 8, iters = 2, eta = 1.0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(plain.keySet == aniso.keySet)
    // same math (A = |S|·I → c = mean), different arithmetic (driver LU
    // solve vs DECIMAL means) — equal to float tolerance, not bits
    val maxDev = plain.keys.map { cid =>
      plain(cid).zip(aniso(cid)).map { case (a, b) =>
        math.abs(a.toDouble - b) }.max
    }.max
    assert(maxDev < 1e-3, s"eta=1 deviates from Lloyd by $maxDev")
  }

  test("training is deterministic under repartitioning") {
    val a = Anisotropic.train(spread, "v", "id", k = 8, iters = 2,
      eta = 4.0).collect().map(_.toSeq).toSet
    val b = Anisotropic.train(spread.repartition(7), "v", "id", k = 8,
      iters = 2, eta = 4.0).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("score-aware codewords beat L2 codewords at MIPS recall, same budget") {
    val c = spread.select($"id", $"v")
    def recallOf(cents: DataFrame, eta: Double): Double = {
      val assigned = Anisotropic.assign(spread, "v", "id", cents, eta)
        .cache()
      val centsSeq = cents.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      val recalls = (0L until 10L).map { q =>
        val qv = emb.filter($"vec_id" === q).select($"embedding")
          .head().getSeq[Float](0).toArray
        val got = Anisotropic.mipsTopK(assigned, centsSeq, qv,
            k = 10, shortlist = 30)
          .select($"id").as[Long].collect().toSet
        val exact = spread
          .withColumn("ip", graft.functions.dot_product($"v", typedLit(qv)))
          .orderBy($"ip".desc, $"id".asc).limit(10)
          .select($"id").as[Long].collect().toSet
        (got intersect exact).size / 10.0
      }
      assigned.unpersist()
      recalls.sum / recalls.length
    }
    val l2Recall = recallOf(
      Knn.trainCentroidsL2(c, "v", "id", k = 16, iters = 3), eta = 1.0)
    val anisoRecall = recallOf(
      Anisotropic.train(c, "v", "id", k = 16, iters = 3, eta = 4.0),
      eta = 4.0)
    assert(anisoRecall > l2Recall,
      s"anisotropic $anisoRecall not above L2 $l2Recall at equal k")
  }
}
