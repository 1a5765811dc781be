package graft.temporal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of: latest right at-or-before, inclusive, per key") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("tk", "t_time", "trade")
    val quotes = Seq((1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 200L, 20.0),
      (2L, 60L, 6.0)).toDF("qk", "q_time", "px")
    val got = AsOfJoin.asofBackward(trades, quotes,
      "tk", "qk", "t_time", "q_time")
      .select($"trade", $"q_time", $"px")
      .orderBy($"trade").collect()
    // t1@100: quote@100 (inclusive equal time), not @90
    assert(got(0).getLong(1) == 100L && got(0).getDouble(2) == 10.0)
    // t2@205: quote@200
    assert(got(1).getLong(1) == 200L && got(1).getDouble(2) == 20.0)
    // t3@50 (key 2): no quote at-or-before → nulls
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }

  test("string keys join on the native type (no silent long-cast nulling)") {
    val trades = Seq(("u1", 100L, "t1"), ("u1", 205L, "t2"), ("u2", 50L, "t3"))
      .toDF("tk", "t_time", "trade")
    val quotes = Seq(("u1", 90L, 9.0), ("u1", 200L, 20.0), ("u2", 60L, 6.0))
      .toDF("qk", "q_time", "px")
    val got = AsOfJoin.asofBackward(trades, quotes,
      "tk", "qk", "t_time", "q_time")
      .select($"trade", $"q_time", $"px")
      .orderBy($"trade").collect()
    // with the old cast-to-long both keys null out and u2's quote@60 leaks
    // into u1's trades — here each key resolves within its own partition
    assert(got(0).getLong(1) == 90L && got(0).getDouble(2) == 9.0)
    assert(got(1).getLong(1) == 200L && got(1).getDouble(2) == 20.0)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }

  test("one shuffle: the as-of plan has a single hash exchange") {
    val l = spark.range(100).select($"id".as("k"), ($"id" * 10).as("lt"))
    val r = spark.range(100).select($"id".as("rk"), ($"id" * 7).as("rt"))
    val plan = AsOfJoin.asofBackward(l, r, "k", "rk", "lt", "rt")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join")) // no join operator at all — window pass
  }
}
