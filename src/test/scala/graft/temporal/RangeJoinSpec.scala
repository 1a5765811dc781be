package graft.temporal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("interval join matches points inside intervals, inclusive ends, no dups") {
    val intervals = Seq((1L, 100L, 200L, "a"), (1L, 300L, 400L, "b"),
      (2L, 0L, 1000L, "c")).toDF("ik", "s", "e", "name")
    val points = Seq((1L, 100L), (1L, 200L), (1L, 250L), (1L, 350L),
      (2L, 500L), (3L, 50L)).toDF("pk", "t")
    // bin width smaller than intervals → intervals span multiple bins;
    // each point must still match exactly once
    val got = RangeJoin.intervalJoin(points, intervals,
      "pk", "ik", "t", "s", "e", binWidth = 30L)
      .select($"pk", $"t", $"name").orderBy($"pk", $"t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 100L, "a"), (1L, 200L, "a"), (1L, 350L, "b"),
      (2L, 500L, "c")))
  }

  test("equi-join shape: hash join on (key, bin), no nested loop") {
    val intervals = spark.range(100)
      .select($"id".as("ik"), ($"id" * 100).as("s"), ($"id" * 100 + 50).as("e"))
    val points = spark.range(1000).select(($"id" % 100).as("pk"), ($"id" * 11).as("t"))
    val plan = RangeJoin.intervalJoin(points, intervals,
      "pk", "ik", "t", "s", "e", binWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }
}
