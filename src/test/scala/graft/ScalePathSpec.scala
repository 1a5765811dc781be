package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sync.HighlightStore

/** Scale-path behaviors: partition pruning on the partitioned store,
  * hot-shingle candidate capping, approx-distinct profiling accuracy. */
class ScalePathSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents: chains, triangles, and singleton pairs label to min id") {
    // components: chain 1-2-3-4 (diameter 3), triangle 10-11-12 + spur 13,
    // isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (12L, 13L), (20L, 21L)).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
    // empty pair set → empty labeling, no iteration
    assert(graft.dedup.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b").isEmpty)
  }

  test("connectedComponents: pointer jumping converges a deep chain in O(log d) rounds") {
    // a 60-hop revision chain: plain propagation needs 60 rounds — far
    // past maxIter — pointer jumping needs ~log2(60) ≈ 6
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.connectedComponents(chain, "id_a", "id_b",
      maxIter = 12).collect()
    assert(got.length == 61)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("connectedComponents: pinned storage does not grow with iteration count") {
    // a 60-hop chain (~6 pointer-jump rounds) and a single pair (1 round)
    // must each leave exactly ONE generation pinned — the result — plus
    // nothing: superseded label checkpoints and the edge list are released.
    // Compare id SETS, not sizes: the ContextCleaner may concurrently drop
    // unrelated orphaned RDDs from earlier suites, which would skew a
    // size-based diff downward.
    def ids = spark.sparkContext.getPersistentRDDs.keySet
    val before = ids
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val deep = Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 12)
    deep.count()
    val pinnedDeep = ids -- before
    assert(pinnedDeep.size == 1,
      s"deep chain pinned ${pinnedDeep.size} RDDs (want 1)")
    val small = Dedup.connectedComponents(
      Seq((100L, 101L)).toDF("id_a", "id_b"), "id_a", "id_b")
    small.count()
    val pinnedSmall = ids -- before -- pinnedDeep
    assert(pinnedSmall.size == 1,
      s"single-pair CC pinned ${pinnedSmall.size} RDDs (want 1)")
  }

  test("connectedComponents: a failed run releases every generation (nothing stays pinned)") {
    // inject a failure mid-function: a 60-hop chain needs ~6 pointer-jump
    // rounds, so maxIter = 2 exhausts and throws AFTER two rounds of
    // checkpointed generations exist. The failure path must release the
    // edge list AND the in-flight label generation — a leak here pins
    // per-node state for the life of the session on every failed dedup
    def ids = spark.sparkContext.getPersistentRDDs.keySet
    val before = ids
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 2)
    }
    assert(ex.getMessage.contains("converge"))
    val leaked = ids -- before
    assert(leaked.isEmpty, s"failed CC left ${leaked.size} RDDs pinned")
  }

  test("partitioned store: source_type filter prunes partitions at plan time") {
    val dir = Files.createTempDirectory("graft-part").toString
    val docs = table("documents").select(
      $"doc_id".cast("string").as("id"), $"text",
      $"source".as("source_type"))
    HighlightStore.writeAtomic(docs, dir, partitionBy = Seq("source_type"))
    val st = docs.select($"source_type").head().getString(0)
    val read = HighlightStore.read(spark, dir).get.filter($"source_type" === st)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.contains(s"source_type"), "filter did not reach PartitionFilters")
    // the pruned read returns exactly that partition's rows
    assert(read.count() == docs.filter($"source_type" === st).count())
    // partition directories exist hive-style inside the pointed-to version
    val version = Files.readString(
      java.nio.file.Paths.get(dir, "CURRENT")).trim
    val parts = Files.list(java.nio.file.Paths.get(dir, version)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(parts)
      .asScala.map(_.getFileName.toString).toSeq
    assert(names.exists(_.startsWith("source_type=")))
  }

  test("jaccardPairs hot-shingle cap: capped pairs are a subset, lower-bound scores") {
    // every doc shares the hot prefix "a b c"; only 1&2 share a rare tail
    val docs = Seq(
      (1L, "a b c x1 y1 z1 q q2 q3"),
      (2L, "a b c x1 y1 z1 r r2 r3"),
      (3L, "a b c p1 p2 p3 p4 p5 p6"),
      (4L, "a b c w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(docs, "text", "doc_id", 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap df at 3: the "a b c" shingle (df=4) drops out of candidates
    val capped = Dedup.jaccardPairs(docs, "text", "doc_id", 0.01,
      maxShingleDf = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(uncapped.contains((3L, 4L))) // hot-shingle-only pair present uncapped
    assert(!capped.contains((3L, 4L))) // …and gone once the hot key is dropped
    assert(capped.contains((1L, 2L))) // rare-shingle pair survives
  }

  test("bloomDecontaminate: no false negatives, exact matches verified, bloom broadcast") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // true overlap
      (2L, "totally unrelated words here apart banana"),
      (3L, "alpha beta gamma completely different tail text")) // partial overlap
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = Dedup.bloomDecontaminate(corpus, bench, "text", "doc_id",
      k = 3, nHash = 3, words = 64)
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // every true shingle overlap is reported (Bloom has NO false negatives):
    // doc 1 shares all 4 of its 3-shingles, doc 3 shares exactly "alpha
    // beta gamma"
    assert(rows(1L)._2 == 4L, rows.toString)
    assert(rows(3L)._2 == 1L, rows.toString)
    // candidates always dominate true matches (FPs only add, never hide)
    rows.values.foreach { case (cand, exact) => assert(cand >= exact) }
    // doc 2, if flagged at all, is pure false positive — zero true matches
    rows.get(2L).foreach { case (_, exact) => assert(exact == 0L) }
    // the bloom side reaches the probe as a BROADCAST, never a shuffle of
    // the corpus against bench postings
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(6).mkString("\n"))
  }

  test("approx_count_distinct tracks exact distinct within 5% (profiling path)") {
    val toks = table("documents")
      .select(explode(graft.text.TextAnalysis.words($"text")).as("tok"))
    val r = toks.agg(
      countDistinct($"tok").as("exact"),
      approx_count_distinct($"tok").as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
