package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge-list DataFrames — the
  * link-structure side of a crawl-corpus pipeline (PageRank-style
  * centrality as a document quality prior, the lineage of the Common
  * Crawl ranking features), kept engine-native: an edge list is just a
  * two-column frame, each iteration is one equi-join + one aggregation,
  * and Catalyst/AQE handle the physical layout.
  */
object Graph {

  /** PageRank with a fixed iteration count and driver-known node count.
    *
    * Per iteration: every node sends `pr / out_degree` along each
    * out-edge (one equi-join of the edge list with the rank frame,
    * hash-partitioned on the source), contributions aggregate per
    * target (partial map-side sums first), and
    * `pr' = (1-d)/N + d * Σ contributions`.
    *
    * Determinism at hash-exact grade: each contribution is quantized to
    * DECIMAL(25,6) BEFORE the sum, so the aggregation is exact integer
    * arithmetic — order-independent under any partitioning — and the
    * only floating-point steps are per-row divisions and one affine
    * update with a fixed expression tree ([[graft.text]] oracle-parity
    * playbook). The quantization error (≤ 5e-7 per edge per iteration)
    * is orders below PageRank's own iteration-truncation error.
    *
    * Dangling nodes (no out-edges) leak their mass — the "leaky" P
    * formulation; redistribute-to-all needs a per-iteration global
    * scalar (one extra tiny agg + broadcast) and is omitted because the
    * intended callers build edge lists with uniform out-degree. Plan
    * depth grows linearly with `iters`; for deep runs checkpoint the
    * rank frame every few rounds like
    * [[graft.dedup.Dedup.connectedComponents]] does.
    *
    * Returns (id, pr) for every node appearing as a source or target. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pageRank: need iters >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: need 0 < damping < 1, got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val nd = nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint() // N is driver-read below; pin one materialization
    val n = nd.count()
    val base = (1.0 - damping) / n
    var pr = nd.withColumn("pr", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contrib = e.join(pr, col("src") === col("id"))
        .select(col("dst"),
          (col("pr") / col("deg")).cast("decimal(25,6)").as("c"))
      val sums = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).cast("double").as("s"))
      pr = nd.join(sums, nd("id") === sums("dst"), "left")
        .select(nd("id"), nd("deg"),
          (lit(base) + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
    }
    pr.select(col("id"), col("pr"))
  }
}
