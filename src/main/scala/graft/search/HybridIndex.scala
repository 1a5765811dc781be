package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Knn
import graft.text.TextRank

/** Hybrid dense+BM25 retrieval fused into ONE Spark job per request —
  * the serving-edge follow-up to the two-leg shape: under concurrency
  * the serialized resource is the driver's per-job planning path
  * (SCALE.md's hybrid analysis: two planned jobs/request put p95 at
  * 491 ms against the 500 ms gate; the legs' DATA work is already
  * pruned and tiny), so the fix is structural — build both legs as
  * uncollected frames, rank each inside the plan (a row_number window
  * over an already-LIMITed ≤k-row list, one partition), and fuse by
  * reciprocal rank with [[TextRank.rrfFuse]]'s broadcast full-outer
  * join. One `collect()` = one planned job; the dense cell scan and the
  * bucket-pruned postings scan run as parallel stages inside it.
  *
  * Wraps the two load-once handles ([[Knn.IvfIndex]],
  * [[TextRank.LexIndex]]); compose with [[graft.sync.Reloading]] at the
  * caller when the indexes take live maintenance.
  */
final class HybridIndex(dense: Knn.IvfIndex, lex: TextRank.LexIndex) {

  /** Fused RRF top-k: (id, rank_a, rank_b, rrf) rows, rrf descending —
    * rank_a from the dense leg (cosine ascending), rank_b from BM25
    * (score descending), absent-from-a-leg contributing 0 (the q84 /
    * rrfFuseLocal semantics, unchanged — only the job count moves). */
  def search(queryVec: Array[Float], queryTerms: Seq[String], k: Int,
      nprobe: Int, kRrf: Int = 60): DataFrame = {
    val d = dense.search(queryVec, k, nprobe)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").asc, col("id").asc)))
      .select(col("id"), col("rank"))
    val l = lex.search(queryTerms, k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      .select(col("id"), col("rank"))
    TextRank.rrfFuse(d, l, k, kRrf)
  }
}
