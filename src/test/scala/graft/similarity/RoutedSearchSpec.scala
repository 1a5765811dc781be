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
    Knn.ivfBuildIndex(emb, "embedding", "vec_id", dir, k = 4, iters = 2,
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
