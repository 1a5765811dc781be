package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape guards: the properties that make these operators
  * survive a 100× scale-up, asserted so a refactor can't silently regress
  * them (the driver's BENCH only sees wall-clock at small SF). */
class PlanShapeSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02: filters and column pruning reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    // projection pruned: no unused wide columns in ReadSchema
    assert(!p.contains("l_comment"))
  }

  test("top-k searches plan as TakeOrderedAndProject over a broadcast probe") {
    for (q <- Seq("q14_search_topk", "q15_search_filtered", "q16_search_docs")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost top-k pushdown")
      assert(!p.contains("CartesianProduct"), s"$q fell back to cartesian")
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
        s"$q probe not broadcast")
    }
  }

  test("q04: dimension joins broadcast instead of shuffling the fact side") {
    val p = plan("q04_region_stats")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q06/q07: EXISTS/NOT EXISTS plan as semi/anti joins, not subquery scans") {
    assert(plan("q06_exists").contains("LeftSemi"))
    assert(plan("q07_not_exists").contains("LeftAnti"))
  }

  test("q31: sessionization uses one shuffle for both window passes") {
    val p = plan("q31_sessions")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"expected a single hash exchange on user_id, saw $shuffles")
  }

  test("q53: bucketed join reads bucket files with no Exchange below the join") {
    val p = plan("q53_bucketed_join")
    // both scans carry the bucket spec (count = max(cores, 8), so the
    // join's per-bucket tasks saturate the session's parallelism)...
    val b = graft.fixtures.Bucketed.bucketCount(spark)
    assert(p.split(s"SelectedBucketsCount: $b", -1).length - 1 == 2,
      s"expected two $b-bucket scans:\n$p")
    assert(p.contains("SortMergeJoin"), s"not a sort-merge join:\n$p")
    // ...and the ONLY shuffle in the whole plan is the post-join groupBy —
    // the join itself is co-located by layout
    assert(p.split("Exchange hashpartitioning", -1).length - 1 == 1,
      s"bucketed join still shuffles:\n$p")
  }

  test("q51: stoplist is a posting-list size filter — no join, 2 hash exchanges") {
    val p = plan("q51_jaccard_stoplist")
    // posting-list shape: candidate generation is Generate over the grouped
    // shingle postings; the df-stoplist is a size filter on that list. No
    // join operator anywhere, and the only hash exchanges are the postings
    // groupBy and the per-pair intersection count.
    assert(!p.contains("Join"), s"candidate generation regressed to a join:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 2, s"expected 2 hash exchanges, saw $shuffles:\n$p")
  }

  test("q55: heavy hitters = partial agg + TakeOrdered, nothing else to the driver") {
    val p = plan("q55_ngram_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no top-N operator:\n$p")
    assert("partial_count".r.findAllIn(p).nonEmpty,
      s"aggregate not map-side partial:\n$p")
    assert(!p.contains("Join"))
  }

  test("q59: decontamination generates candidates without a join") {
    val p = plan("q59_decontaminate")
    assert(!p.contains("Join"), s"cross-corpus pairs regressed to a join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q23: LSH candidates come from grouped band buckets, not a join") {
    val p = plan("q23_lsh_pairs")
    assert(!p.contains("Join"), s"band bucketing regressed to a join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q77/q78: simhash candidates come from banded postings, not a join") {
    for (q <- Seq("q77_simhash_pairs", "q78_simhash64_pairs")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q regressed to a join:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q66: repetition scan is a narrow projection — no explode, no hash shuffle") {
    val p = plan("q66_repetition_quality")
    assert(!p.contains("Generate"), s"repetition stats regressed to explode:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"repetition stats shuffle:\n$p")
    assert(!p.contains("Join"))
  }

  test("q101: cohort assignment is a window over user_id — no broadcast, one user exchange") {
    val p = plan("q101_retention")
    // the per-user cohort table has one row PER USER — broadcasting it is
    // a driver OOM at corpus scale. cohort_day must come from a window
    // min that shares the final agg's user_id hash exchange.
    assert(!p.contains("BroadcastExchange"),
      s"q101 broadcasts a user-cardinality table:\n$p")
    assert(!p.contains("Join"), s"q101 regressed to a cohort join:\n$p")
    val userShuffles = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(userShuffles == 1,
      s"expected exactly 1 user_id hash exchange, saw $userShuffles:\n$p")
  }

  test("q129/q130/q131: graph rounds are equi-joins only — nothing n²-shaped") {
    for (q <- Seq("q129_triangle_count", "q130_label_propagation",
        "q131_kcore")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q fell back to a cartesian join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q planned a nested-loop join:\n$p")
    }
  }

  test("q67: familiarity counts attach via the window — no count-table join") {
    val p = plan("q67_bigram_familiarity")
    assert(!p.contains("Join"), s"bigram counts regressed to a join:\n$p")
    // one hash exchange for the per-bigram window, one for the per-doc agg
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 2, s"expected 2 hash exchanges, saw $shuffles:\n$p")
  }

  test("q117: gram frequency via the window — no pair join, 2 hash exchanges") {
    val p = plan("q117_substring_dup")
    assert(!p.contains("Join"), s"substring dedup regressed to a join:\n$p")
    // one exchange on the gram hash (window), one on doc_id (final agg);
    // output stays linear in the corpus however viral a span is
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 2, s"expected 2 hash exchanges, saw $shuffles:\n$p")
  }

  test("q114: both hamming-search cuts are heaps; corpus never shuffles") {
    val p = plan("q114_hamming_search")
    val heaps = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(heaps == 2, s"expected 2 top-k heaps, saw $heaps:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"hamming search shuffles the corpus:\n$p")
  }

  test("q115: int8 approx cut + exact re-rank are heaps; no corpus shuffle") {
    val p = plan("q115_int8_search")
    val heaps = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(heaps == 2, s"expected 2 top-k heaps, saw $heaps:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"int8 search shuffles the corpus:\n$p")
    // the quantized cut scores through the fused kernel, not decode+cosine
    assert(p.contains("int8_cosine_distance"), s"fused kernel missing:\n$p")
  }
}
