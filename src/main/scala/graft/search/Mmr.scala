package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{cosine_distance, VectorMath}

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR'98)
  * — diversity-aware top-k over a relevance-ranked candidate pool:
  * `mmr(c) = λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`, greedily picking the
  * argmax until k are chosen. De-clumps near-duplicate hits that plain
  * cosine top-k returns as a block.
  *
  * Scale split mirrors the serving layer's contract everywhere else in
  * this engine (SSE sink, probe vectors): the POOL is cut distributedly —
  * one corpus scan into a `TakeOrderedAndProject` heap, so 100 TB never
  * moves — and the greedy selection runs on the ≤`poolSize` (≤ a few
  * hundred) collected survivors, where it is O(k·pool) driver work on
  * kilobytes. All similarity arithmetic is double and tie-breaks are on
  * id, so the selection is deterministic and oracle-replicable.
  */
object Mmr {

  /** Diversified top-k: returns (keyCol, rank, rel, mmr) ordered by rank.
    * `rel` = 1 − cosine distance to the query; `mmr` is the score at
    * selection time (rank 1's is λ·rel − (1−λ)·0). Ties on mmr break
    * toward the smaller id. */
  def rerank(corpus: DataFrame, vecCol: String, keyCol: String,
      queryVec: Array[Float], k: Int, poolSize: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k=$k <= poolSize=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = corpus.sparkSession
    val pool = corpus.filter(col(vecCol).isNotNull)
      .withColumn("dist", cosine_distance(col(vecCol), typedLit(queryVec)))
      .orderBy(col("dist").asc, col(keyCol).asc)
      .limit(poolSize)
      .select(col(keyCol).cast("long").as("id"), col(vecCol).as("v"),
        col("dist"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        1.0 - r.getDouble(2)))
    // sim as 1 − distance with the same op order the oracle uses
    def sim(a: Array[Float], b: Array[Float]): Double =
      1.0 - VectorMath.cosineDistance(a, b)
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(c => c._1 -> c): _*)
    val out = Seq.newBuilder[Row]
    var selected = List.empty[(Long, Array[Float], Double)]
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      var bestId = -1L
      var bestMmr = Double.NegativeInfinity
      remaining.valuesIterator.foreach { case (id, v, rel) =>
        // true max over the selected set (can be negative); empty set → 0,
        // so rank 1 scores λ·rel − (1−λ)·0 — same convention as the oracle
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => sim(v, s._2)).max
        val mmr = lambda * rel - (1.0 - lambda) * maxSim
        if (mmr > bestMmr || (mmr == bestMmr && id < bestId)) {
          bestMmr = mmr; bestId = id
        }
      }
      val c = remaining.remove(bestId).get
      selected ::= c
      out += Row(c._1, rank.toLong, c._3, bestMmr)
      rank += 1
    }
    val schema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("rank", LongType, nullable = false),
      StructField("rel", DoubleType, nullable = false),
      StructField("mmr", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1), schema)
  }
}
