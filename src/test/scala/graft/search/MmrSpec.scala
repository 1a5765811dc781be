package graft.search

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Knn

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings").cache()
  private lazy val probe = emb.filter($"vec_id" === 0).select($"embedding")
    .head().getSeq[Float](0).toArray

  test("rank 1 is the most relevant; ranks are 1..k; deterministic rerun") {
    val r1 = Mmr.rerank(emb, "embedding", "vec_id", probe, k = 5, poolSize = 20)
      .collect()
    assert(r1.map(_.getLong(1)).toSeq == (1L to 5L))
    // rank 1 == exact nearest (the query itself, rel ~ 1)
    assert(r1.head.getLong(0) == 0L && math.abs(r1.head.getDouble(2) - 1.0) < 1e-9)
    val r2 = Mmr.rerank(emb, "embedding", "vec_id", probe, k = 5, poolSize = 20)
      .collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("diversifies: λ=0 ignores relevance order, λ=1 equals plain top-k") {
    val plain = Knn.topK(emb, "embedding", probe, 10, "vec_id")
      .select($"vec_id").as[Long].collect().toSeq
    val lam1 = Mmr.rerank(emb, "embedding", "vec_id", probe,
      k = 10, poolSize = 10, lambda = 1.0)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    // λ=1: pure relevance, same pool, same order as exact top-k
    assert(lam1 == plain, s"λ=1 gave $lam1 vs top-k $plain")
    // λ=0.3 over a deeper pool must depart from relevance order
    val diverse = Mmr.rerank(emb, "embedding", "vec_id", probe,
      k = 10, poolSize = 50, lambda = 0.3)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    assert(diverse != plain, "λ=0.3 did not change the ranking")
    // and the mean pairwise similarity of the diverse set is lower
    def meanPairSim(ids: Seq[Long]): Double = {
      val vs = emb.filter($"vec_id".isin(ids: _*))
        .select($"embedding").collect().map(_.getSeq[Float](0).toArray)
      val sims = for {
        i <- vs.indices; j <- (i + 1) until vs.length
      } yield 1.0 - graft.functions.VectorMath.cosineDistance(vs(i), vs(j))
      sims.sum / sims.size
    }
    assert(meanPairSim(diverse) < meanPairSim(plain),
      "diversified set is not less self-similar")
  }

  test("pool smaller than corpus: selection confined to the pool") {
    val out = Mmr.rerank(emb, "embedding", "vec_id", probe, k = 3, poolSize = 3)
      .select($"vec_id").as[Long].collect().toSet
    val pool = Knn.topK(emb, "embedding", probe, 3, "vec_id")
      .select($"vec_id").as[Long].collect().toSet
    assert(out == pool)
  }
}
