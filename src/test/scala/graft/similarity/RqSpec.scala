package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Residual quantization ([[Knn.rqTrain]]/[[Knn.rqEncode]]/[[Knn.rqTopK]]):
  * code-shape invariants, the stagewise-refinement property that defines
  * the family (each stage strictly shrinks reconstruction error), and the
  * recall the stages×ksub dial buys on the bench corpus.
  */
class RqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings")
    .filter($"embedding".isNotNull).cache()

  private def exactIds(qv: Array[Float], k: Int): Seq[Long] =
    emb.select($"vec_id".as("id"), $"embedding".as("v"))
      .withColumn("d", Knn.l2sq($"v", typedLit(qv)))
      .orderBy($"d".asc, $"id".asc).limit(k)
      .select($"id").as[Long].collect().toSeq

  /** Mean ‖v − x̂‖² over the corpus for a trained codebook stack —
    * decode-and-measure on the collected fixture (test-side only). */
  private def meanReconSq(cb: Array[Array[Array[Float]]]): Double = {
    val rows = Knn.rqEncode(emb, "embedding", "vec_id", cb)
      .join(emb.select($"vec_id".as("id"), $"embedding".as("v")), Seq("id"))
      .select($"codes", $"v").collect()
    val errs = rows.map { r =>
      val codes = r.getAs[Array[Byte]](0)
      val v = r.getSeq[Float](1)
      val xhat = new Array[Double](v.length)
      codes.zipWithIndex.foreach { case (c, s) =>
        val cw = cb(s)(c & 0xff)
        var i = 0
        while (i < cw.length) { xhat(i) += cw(i).toDouble; i += 1 }
      }
      v.indices.map { i =>
        val d = v(i).toDouble - xhat(i); d * d
      }.sum
    }
    errs.sum / errs.length
  }

  test("codes are stages bytes under ksub; encoding deterministic under repartition") {
    val cb = Knn.collectRqCodebooks(Knn.rqTrain(
      emb, "embedding", "vec_id", stages = 3, ksub = 16, iters = 2))
    assert(cb.length == 3 && cb.forall(_.length == 16))
    assert(cb.forall(_.forall(_.length == 64))) // every stage is full-dim
    val enc = Knn.rqEncode(emb, "embedding", "vec_id", cb)
    val rows = enc.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      assert(codes.length == 3)
      assert(codes.forall(c => (c & 0xff) < 16))
    }
    val enc2 = Knn.rqEncode(emb.repartition(7), "embedding", "vec_id", cb)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val enc1 = rows.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(enc1 == enc2)
  }

  test("each stage shrinks reconstruction error — the residual-refinement property") {
    // the family's defining monotonicity: stage s trains ON what stages
    // 0..s-1 left over, so adding a stage can only explain more variance
    val errs = (1 to 3).map { stages =>
      meanReconSq(Knn.collectRqCodebooks(Knn.rqTrain(
        emb, "embedding", "vec_id", stages = stages, ksub = 16, iters = 2)))
    }
    assert(errs(0) > errs(1) && errs(1) > errs(2),
      s"reconstruction error must fall per stage, got $errs")
    // and each stage's drop is a real margin, not float noise: ~9% per
    // stage on the bench corpus (measured 0.895/0.812/0.735 at ksub=16
    // — quasi-uniform data leaves near-isotropic residuals, the
    // documented hard case for coarse codes; clustered corpora drop far
    // faster)
    assert(errs(1) < 0.95 * errs(0), s"stage 2 buys too little: $errs")
    assert(errs(2) < 0.95 * errs(1), s"stage 3 buys too little: $errs")
  }

  test("self-query lands in the ADC top-5; measured recall@10 at stages=2 ksub=16") {
    val cb = Knn.collectRqCodebooks(Knn.rqTrain(
      emb, "embedding", "vec_id", stages = 2, ksub = 16, iters = 2))
    val enc = Knn.rqEncode(emb, "embedding", "vec_id", cb)
    val qv = emb.orderBy($"vec_id").select($"embedding")
      .head().getSeq[Float](0).toArray
    val top = Knn.rqTopK(enc, cb, qv, k = 10)
      .select($"id").as[Long].collect().toSeq
    assert(top.take(5).contains(0L), s"self not in ADC top-5: $top")
    // recall@10 vs exact squared L2, averaged over 10 query vectors
    val recalls = (0L until 10L).map { q =>
      val v = emb.filter($"vec_id" === q).select($"embedding")
        .head().getSeq[Float](0).toArray
      val got = Knn.rqTopK(enc, cb, v, k = 10)
        .select($"id").as[Long].collect().toSet
      (got intersect exactIds(v, 10).toSet).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    // 2 bytes a vector at 64 dims is a 128× compression; the measured
    // floor on the bench corpus (quasi-uniform — the hard case for
    // coarse codes, same caveat as PqSpec's) is ~0.3
    assert(mean >= 0.2, s"mean recall@10 $mean under the measured floor")
  }
}
