package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** k-means|| initialization ([[Knn.kmeansParallelInit]]): determinism,
  * the vote-conservation invariant, and the quality claim — the
  * oversampled weighted seeds start Lloyd at a lower cost than the
  * engine's lowest-key default. */
class KmeansParSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings")
    .filter($"embedding".isNotNull).cache()

  /** Clustering cost Σ min-d² of the corpus against a center set. */
  private def cost(centers: Seq[Array[Float]]): Double = {
    val cd = centers.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("cid", "cvec")
    emb.select($"vec_id".as("id"), $"embedding".as("v"))
      .crossJoin(broadcast(cd))
      .select($"id", Knn.l2sq($"v", $"cvec").as("d"))
      .groupBy($"id").agg(min($"d").as("d"))
      .agg(sum($"d")).head().getDouble(0)
  }

  private def vecOf(ids: Seq[Long]): Seq[Array[Float]] = {
    val m = emb.filter($"vec_id".isin(ids: _*))
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    ids.map(m)
  }

  test("deterministic under repartitioning; ranks and weights well-formed") {
    val a = Knn.kmeansParallelInit(emb, "embedding", "vec_id",
      k = 4, rounds = 3, ell = 8.0).collect().map(_.toSeq).toSeq
    val b = Knn.kmeansParallelInit(emb.repartition(7), "embedding",
      "vec_id", k = 4, rounds = 3, ell = 8.0).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(_(0).asInstanceOf[Int]).sorted == Seq(1, 2, 3, 4))
    // rank 1 is the heaviest candidate, so its weight bounds the rest
    val ws = a.sortBy(_(0).asInstanceOf[Int]).map(_(2).asInstanceOf[Long])
    assert(ws.forall(_ >= 0) && ws.tail.forall(_ <= ws.head))
  }

  test("oversampled weighted seeds beat the lowest-key default at Lloyd's start") {
    val sel = Knn.kmeansParallelInit(emb, "embedding", "vec_id",
        k = 4, rounds = 3, ell = 8.0)
      .orderBy($"rank").select($"cand_id").as[Long].collect().toSeq
    val parCost = cost(vecOf(sel))
    val defaultCost = cost(vecOf(Seq(0L, 1L, 2L, 3L)))
    // the paper's point: d²-weighted oversampling spreads seeds where
    // the mass is; the first-k-keys default starts wherever the ids
    // landed (measured ~0.8x on the bench corpus — quasi-uniform data
    // is the WEAKEST case for ||-init and it still wins)
    assert(parCost < defaultCost,
      s"k-means|| start $parCost not below default $defaultCost")
  }

  test("refuses when the sample cannot cover k") {
    val e = intercept[IllegalArgumentException] {
      Knn.kmeansParallelInit(emb, "embedding", "vec_id",
        k = 400, rounds = 1, ell = 2.0)
    }
    assert(e.getMessage.contains("fewer than k"))
  }
}
