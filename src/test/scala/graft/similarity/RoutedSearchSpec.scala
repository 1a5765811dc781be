package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Knn.ivfRoutedSearchIndex]]: the measured-selectivity router —
  * rare predicates scan (exact), plentiful ones probe, the boundary is
  * inclusive, and each branch equals the plan it routes to. */
class RoutedSearchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = table("embeddings")
    .filter($"embedding".isNotNull).cache()

  private lazy val indexDir: String = {
    val dir = Files.createTempDirectory("graft-routed").toString + "/ivf"
    Knn.ivfBuildIndex(emb, "embedding", "vec_id", dir, k = 8, iters = 2,
      trainFilter = $"vec_id" % 5 === 0, attrCols = Seq("label"))
    dir
  }

  private lazy val qv = emb.filter($"vec_id" === 0)
    .select($"embedding").head().getSeq[Float](0).toArray

  test("a rare predicate routes to the exhaustive scan and is exact") {
    val cond = $"label" === 5
    val got = Knn.ivfRoutedSearchIndex(spark, indexDir, qv, k = 10,
      nprobe = 1, filter = cond, bruteThreshold = 100L).collect()
    assert(got.forall(_.getString(3) == "scan"))
    val exact = emb.filter(cond)
      .select($"vec_id".as("id"),
        graft.functions.cosine_distance($"embedding", typedLit(qv))
          .as("score"))
      .orderBy($"score".asc, $"id".asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(r => (r.getLong(0), r.getDouble(2))).toSeq == exact)
  }

  test("a plentiful predicate routes to the pruned probe and matches it") {
    val cond = $"label" % 3 === 1
    val got = Knn.ivfRoutedSearchIndex(spark, indexDir, qv, k = 10,
        nprobe = 2, filter = cond, bruteThreshold = 100L)
      .collect()
    assert(got.forall(_.getString(3) == "probe"))
    val plain = Knn.ivfSearchIndex(spark, indexDir, qv, k = 10,
        nprobe = 2, filter = Some(cond))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got.map(r => (r.getLong(0), r.getDouble(2))).toSeq == plain)
  }

  test("servingTopKRouted: a rare predicate answers in two jobs (count " +
      "+ pruned scan) with the exhaustive plan's exact rows; a broad " +
      "one matches the adaptive path") {
    val idx = Knn.IvfIndex.load(spark, indexDir)
    // 6 matches < k — the predicate shape that starves EVERY probe, so
    // the adaptive ladder walks its full doubling to numCells
    val starved = $"id" % 97 === 0
    // prime the lazy avgCellRows yardstick (one count job, once per
    // load) so the steady-state request shape is what's measured
    idx.servingTopKRouted(qv, 10, 1, starved)
    val sc = spark.sparkContext
    def jobs(f: => Unit): Int = {
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      f
      sc.statusTracker.getJobIdsForGroup(null).length - before
    }
    var got: Array[org.apache.spark.sql.Row] = null
    val routedJobs = jobs { got = idx.servingTopKRouted(qv, 10, 1, starved) }
    val ladderJobs = jobs { idx.searchAdaptiveRows(qv, 10, 1, Some(starved)) }
    // the routed request is count + ONE pruned scan; the adaptive
    // ladder on the same starved predicate pays a widening attempt per
    // doubling (log₂(cells) jobs) to arrive at the same plan
    assert(routedJobs <= 3 && ladderJobs >= 4 && routedJobs < ladderJobs,
      s"narrow routed request ran $routedJobs jobs vs the ladder's " +
        s"$ladderJobs — the widening ladder is back")
    val want = idx.search(qv, 10, idx.numCells, Some(starved)).collect()
      .map(r => (r.get(0), r.getDouble(2))).toSeq
    assert(got.map(r => (r.get(0), r.getDouble(1))).toSeq == want
      && want.length == 6)
    // broad: routed takes the standard adaptive path — identical rows
    val broad = $"label" % 3 === 1
    val gotB = idx.servingTopKRouted(qv, 10, 2, broad)
      .map(r => (r.get(0), r.getDouble(1))).toSeq
    val wantB = idx.searchAdaptiveRows(qv, 10, 2, Some(broad))
      .map(r => (r.get(0), r.getDouble(2))).toSeq
    assert(gotB == wantB)
  }

  test("the threshold boundary is inclusive: matches == threshold scans") {
    val cond = $"label" === 5
    val matches = emb.filter(cond).count()
    val atBoundary = Knn.ivfRoutedSearchIndex(spark, indexDir, qv,
      k = 10, nprobe = 1, filter = cond, bruteThreshold = matches)
      .collect()
    assert(atBoundary.forall(_.getString(3) == "scan"))
    val below = Knn.ivfRoutedSearchIndex(spark, indexDir, qv,
      k = 10, nprobe = 1, filter = cond, bruteThreshold = matches - 1)
      .collect()
    assert(below.forall(_.getString(3) == "probe"))
  }
}
