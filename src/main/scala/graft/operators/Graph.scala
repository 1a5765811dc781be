package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge-list DataFrames — the
  * link-structure side of a crawl-corpus pipeline (PageRank-style
  * centrality as a document quality prior, the lineage of the Common
  * Crawl ranking features), kept engine-native: an edge list is just a
  * two-column frame, each iteration is one equi-join + one aggregation,
  * and Catalyst/AQE handle the physical layout.
  */
object Graph {

  private def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }

  /** PageRank with a fixed iteration count and driver-known node count.
    *
    * Per iteration: every node sends `pr / out_degree` along each
    * out-edge (one equi-join of the edge list with the rank frame,
    * hash-partitioned on the source), contributions aggregate per
    * target (partial map-side sums first), and
    * `pr' = (1-d)/N + d * (Σ contributions + dangling_mass/N)`.
    *
    * Dangling nodes (no out-edges) would otherwise LEAK their mass —
    * the "leaky P" formulation, under which total rank drifts below 1
    * and ranks are no longer comparable across graphs with different
    * dangling fractions. Here their mass redistributes uniformly: a
    * per-round single-row aggregate over the dangling nodes rides into
    * the update as a broadcast cross join — in-plan, no driver-side
    * collect, no extra job. A graph with no dangling nodes pays one
    * empty-input partial agg and adds an exact `+ 0.0` — results are
    * bit-identical to the leak-free formulation.
    *
    * Determinism at hash-exact grade: each contribution — and each
    * dangling node's rank — is quantized to DECIMAL(25,6) BEFORE the
    * sum, so both aggregations are exact integer arithmetic —
    * order-independent under any partitioning — and the only
    * floating-point steps are per-row divisions and one affine update
    * with a fixed expression tree ([[graft.text]] oracle-parity
    * playbook). The quantization error (≤ 5e-7 per edge per iteration)
    * is orders below PageRank's own iteration-truncation error.
    *
    * Plan depth: the rank frame is `localCheckpoint`ed every
    * `checkpointEvery` rounds (superseded generations released, same
    * discipline as [[graft.dedup.Dedup.connectedComponents]]), so plan
    * depth — and per-round analysis cost — is bounded by a constant
    * window instead of growing linearly with `iters`. A deep run (50
    * iterations on a crawl graph) plans each round against at most
    * `checkpointEvery` rounds of lineage. On a production cluster
    * prefer `checkpoint()` to reliable storage for fault tolerance.
    *
    * Returns (id, pr) for every node appearing as a source or target. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"pageRank: need iters >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: need 0 < damping < 1, got $damping")
    require(checkpointEvery >= 1,
      s"pageRank: need checkpointEvery >= 1, got $checkpointEvery")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val nd = nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint() // N is driver-read below; pin one materialization
    val n = nd.count()
    var gen: Option[DataFrame] = None // checkpointed generation backing `pr`
    var done = false // failure path must release what the result won't use
    try {
      // inside the try: the empty-graph fail-fast must release `nd`, not
      // leave it pinned behind an exception (1/0 would otherwise produce
      // silent Infinity ranks, not an error)
      require(n > 0, "pageRank: edge list is empty")
      val base = (1.0 - damping) / n
      var pr = nd.withColumn("pr", lit(1.0 / n))
      for (i <- 1 to iters) {
        // dangling mass this round: one single-row partial agg, broadcast
        // into the update — DECIMAL-quantized pre-sum like contributions,
        // COALESCE'd so a dangling-free graph contributes exactly 0.0
        val dang = pr.filter(col("deg") === 0L)
          .agg(coalesce(sum(col("pr").cast("decimal(25,6)")).cast("double"),
            lit(0.0)).as("__dm"))
        val contrib = e.join(pr, col("src") === col("id"))
          .select(col("dst"),
            (col("pr") / col("deg")).cast("decimal(25,6)").as("c"))
        val sums = contrib.groupBy(col("dst"))
          .agg(sum(col("c")).cast("double").as("s"))
        pr = nd.join(sums, nd("id") === sums("dst"), "left")
          .crossJoin(broadcast(dang))
          .select(nd("id"), nd("deg"),
            (lit(base) + lit(damping) * (coalesce(col("s"), lit(0.0)) +
              col("__dm") / lit(n.toDouble))).as("pr"))
        if (i % checkpointEvery == 0 && i < iters) {
          val ck = pr.localCheckpoint()
          gen.foreach(release)
          gen = Some(ck)
          pr = ck
        }
      }
      done = true
      pr.select(col("id"), col("pr"))
    } finally {
      // the result plan reads from `nd` and the LAST checkpoint (if any):
      // on success both must stay pinned until the caller consumes the
      // ranks. A mid-loop failure must release them — a failed deep run
      // must not pin per-node state for the life of the session.
      if (!done) {
        gen.foreach(release)
        release(nd)
      }
    }
  }
}
