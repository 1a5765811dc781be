package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.expressions.Window
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

  /** Exact per-vertex triangle counting by degree-ordered orientation
    * (Suri & Vassilvitskii, WWW'11 — the "curse of the last reducer"
    * fix). The input edge list is first reduced to the simple
    * UNDIRECTED graph (self-loops dropped, both orientations and
    * multi-edges collapsed via least/greatest + distinct), then every
    * edge orients from its lower endpoint to its higher under the
    * TOTAL order (degree, id). Wedges form only around each triangle's
    * LOWEST vertex — two oriented out-edges joined on their shared
    * source, ordered (deg, id) between the endpoints — and close with
    * one equi-join back to the oriented edge list, so each triangle is
    * found exactly once and per-vertex counts are one explode + count.
    *
    * Why the orientation matters at 100 TB: wedge count is
    * Σ out_deg(v)², and degree-ordering bounds every out-degree by
    * O(√m) however skewed the raw degrees are — a celebrity node with
    * 10⁸ followers contributes no wedges at all (all its edges point
    * INTO it), where the naive per-vertex join would generate 10¹⁶
    * pairs on one reducer. Three hash exchanges total (degree agg,
    * wedge join on src, closure join on the (b, c) pair), every join an
    * equi-join AQE can split; no row ever carries more than three ids.
    *
    * Returns (id, n_tri) for vertices in ≥1 triangle — deterministic
    * exact counts, SQL-replicable for the oracle. */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient toward the higher (deg, id); carry the destination's degree
    // so the wedge ordering needs no further join
    val o = und
      .join(deg.select(col("id").as("u"), col("deg").as("udeg")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("vdeg")), Seq("v"))
      .select(
        when(col("udeg") < col("vdeg") ||
            (col("udeg") === col("vdeg") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(col("udeg") < col("vdeg") ||
            (col("udeg") === col("vdeg") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("dst"),
        when(col("udeg") < col("vdeg") ||
            (col("udeg") === col("vdeg") && col("u") < col("v")),
          col("vdeg")).otherwise(col("udeg")).as("ddeg"))
    val wedges = o.select(col("src"), col("dst").as("b"), col("ddeg").as("bdeg"))
      .join(o.select(col("src"), col("dst").as("c"), col("ddeg").as("cdeg")),
        Seq("src"))
      .filter(col("bdeg") < col("cdeg") ||
        (col("bdeg") === col("cdeg") && col("b") < col("c")))
    val tri = wedges.join(
      o.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    tri.select(explode(array(col("src"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), made deterministic and replayable: every node starts labeled
    * with its own id; each round EVERY node simultaneously adopts the
    * most frequent label among its neighbors (ties toward the smaller
    * label), for a FIXED `rounds` — the same data-independent loop
    * bound as [[pageRank]], so an oracle unrolls it round-for-round and
    * sync-update oscillation (LPA's known behavior on bipartite-ish
    * structures) is simply part of the replayed definition.
    *
    * Communities in a link corpus are the mesoscale signal dedup and
    * PageRank don't expose: boilerplate link rings, mirror families,
    * and topic clusters all surface as labels converging onto hubs.
    *
    * Per round: one equi-join of the adjacency list with the label
    * frame (hash-partitioned on the neighbor id), one partial-agg count
    * per (node, label), one window top-1 per node — all map-side
    * combinable, nothing ever carries more than (id, label, count).
    * Label state localCheckpoints every `checkpointEvery` rounds with
    * superseded-generation release ([[pageRank]]'s lineage discipline).
    * Operates on the simple undirected graph (self-loops and duplicate
    * orientations collapsed); returns (id, label) per non-isolated
    * node. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, checkpointEvery: Int = 5): DataFrame = {
    require(rounds >= 1, s"labelPropagation: need rounds >= 1, got $rounds")
    require(checkpointEvery >= 1,
      s"labelPropagation: need checkpointEvery >= 1, got $checkpointEvery")
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .unionByName(und.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint() // reused every round; pin one materialization
    var gen: Option[DataFrame] = None
    var done = false
    try {
      var lab = adj.select(col("a").as("id")).distinct()
        .withColumn("label", col("id"))
      val w = Window.partitionBy(col("a"))
        .orderBy(col("cnt").desc, col("label").asc)
      for (r <- 1 to rounds) {
        lab = adj
          .join(lab.select(col("id").as("b"), col("label")), Seq("b"))
          .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("a").as("id"), col("label"))
        if (r % checkpointEvery == 0 && r < rounds) {
          val ck = lab.localCheckpoint()
          gen.foreach(release)
          gen = Some(ck)
          lab = ck
        }
      }
      done = true
      lab
    } finally {
      if (!done) {
        gen.foreach(release)
        release(adj)
      }
    }
  }

  /** k-core peeling (Seidman 1983; the distributed fixed-round form):
    * repeatedly delete every node whose CURRENT degree in the surviving
    * subgraph is below `k`, for a fixed `rounds` — the dense-subgraph
    * extraction that separates organic link neighborhoods from pendant
    * chains and spam tendrils (a crawl-quality prior, like [[pageRank]]
    * but structural). After enough rounds the survivors are exactly the
    * k-core (deleting a node only ever lowers OTHER degrees, so peeling
    * is monotone and confluent — round order can't change the fixed
    * point); a fixed round count makes the loop data-independent, so an
    * oracle replays it and a 100 TB run has a hard cost bound. Returns
    * (id, deg) for surviving nodes with their degree INSIDE the
    * surviving subgraph.
    *
    * Per round: one degree count (partial-agg) + two semi-joins
    * restricting the adjacency list to surviving endpoints — all
    * equi-joins on node ids, nothing carries more than two ids.
    *
    * Checkpoint cadence: unlike [[pageRank]] (whose rank frame is
    * referenced twice per iteration and whose un-truncated plan AQE
    * exchange-reuse executes FASTER than per-round materialization —
    * measured warm 0.52 vs 0.94 s at iters = 4 on the q104 graph), each
    * peel references the adjacency THREE times (the degree count and
    * both semi-joins), so an un-checkpointed peel both cubes the
    * recompute and grows the physical plan ~4× per round — at rounds = 3
    * the q131 plan held 2 749 operators / 752 exchanges and Catalyst
    * planning dominated the query (warm 2.8–3.2 s vs 1.0 s with
    * per-round truncation; identical output either way). Default is
    * therefore 1; raise it only for peels shallow enough that plan
    * growth stays trivial. Operates on the simple undirected graph
    * (self-loops and duplicate orientations collapsed). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int, checkpointEvery: Int = 1): DataFrame = {
    require(k >= 1, s"kCore: need k >= 1, got $k")
    require(rounds >= 1, s"kCore: need rounds >= 1, got $rounds")
    require(checkpointEvery >= 1,
      s"kCore: need checkpointEvery >= 1, got $checkpointEvery")
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var adj = und.select(col("u").as("a"), col("v").as("b"))
      .unionByName(und.select(col("v").as("a"), col("u").as("b")))
    var gen: Option[DataFrame] = None
    var done = false
    try {
      for (r <- 1 to rounds) {
        val keep = adj.groupBy(col("a")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("a").as("id"))
        adj = adj
          .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        if (r % checkpointEvery == 0 && r < rounds) {
          val ck = adj.localCheckpoint()
          gen.foreach(release)
          gen = Some(ck)
          adj = ck
        }
      }
      done = true
      adj.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .select(col("a").as("id"), col("deg"))
    } finally {
      if (!done) gen.foreach(release)
    }
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
