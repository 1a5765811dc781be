package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SemiReduce]]: the Bloom probe admits every true key (no false
  * negatives — the property that makes the reduced join exact), actually
  * cuts the fact side at realistic selectivity, stays within the
  * expected false-positive budget, and compiles to a pure expression
  * filter (no join/exchange on the probe path).
  */
class SemiReduceSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every dim key passes its own bloom") {
    val keys = (0 until 5000).map(i => i * 2654435761L % 999999937L)
      .toDF("k")
    val bloom = SemiReduce.bloomOf(keys, "k", nHash = 3, words = 256)
    assert(keys.filter(SemiReduce.mightContain(col("k"), bloom, 3)).count()
      == 5000L)
  }

  test("reduced join equals the plain join; fact side actually shrinks") {
    val facts = (0 until 20000).map(i => (i.toLong, (i % 4000).toLong))
      .toDF("row_id", "fk")
    val dim = (0 until 80).map(i => ((i * 50).toLong, s"d$i"))
      .toDF("pk", "meta") // 2% of the fk space
    val plain = facts.join(dim, col("fk") === col("pk"))
      .select($"row_id", $"pk", $"meta")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val reduced = SemiReduce.reducedJoin(facts, dim, "fk", "pk",
        nHash = 3, words = 64)
      .select($"row_id", $"pk", $"meta")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(reduced == plain)
    // the probe filter alone removes most of the fact table
    val bloom = SemiReduce.bloomOf(dim, "pk", 3, 64)
    val kept = facts.filter(SemiReduce.mightContain(col("fk"), bloom, 3))
      .count()
    assert(kept >= plain.size)
    assert(kept < 20000 / 2, s"bloom kept $kept of 20000 fact rows")
  }

  test("false-positive rate stays near the (nHash, words) design point") {
    val dim = (0 until 200).map(i => (i * 7919L)).toDF("pk")
    val bloom = SemiReduce.bloomOf(dim, "pk", nHash = 3, words = 64)
    val probes = (0 until 20000).map(i => 1000000000L + i * 13L).toDF("k")
    val fp = probes.filter(SemiReduce.mightContain(col("k"), bloom, 3))
      .count().toDouble / 20000
    // m = 64*62 bits, n = 200, k = 3 → theoretical fp ~ (1-e^(-kn/m))^k ~ 2e-3
    assert(fp < 0.02, s"false-positive rate $fp")
  }

  test("probe is a pure expression filter: no join or exchange before the real join") {
    // parquet-backed facts — a local Seq would be constant-folded into a
    // LocalTableScan at plan time and hide the filter under test
    val facts = table("lineitem")
    val dim = (0 until 10).map(i => (i * 10L)).toDF("pk")
    val bloom = SemiReduce.bloomOf(dim, "pk", 3, 64)
    val filtered = facts
      .filter(SemiReduce.mightContain(col("l_orderkey"), bloom, 3))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(400))
    assert(!plan.contains("Exchange"), plan.take(400))
    assert(plan.contains("Filter"), plan.take(400))
  }
}
