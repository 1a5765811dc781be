package graft.search

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[RankEval]] — hand-computed metrics on a 3-query fixture (full hit,
  * partial, zero), trec conventions, repartition invariance. */
class RankEvalSpec extends SparkTestBase {
  import spark.implicits._

  // gold: 2 items per query (ranks 1, 2)
  private def gold = Seq(
    (1L, 10L, 1), (1L, 11L, 2),
    (2L, 20L, 1), (2L, 21L, 2),
    (3L, 30L, 1), (3L, 31L, 2)
  ).toDF("q", "item", "rank")

  // system: q1 perfect, q2 finds gold item 21 at rank 3, q3 nothing
  private def sys = Seq(
    (1L, 10L, 1), (1L, 11L, 2),
    (2L, 99L, 1), (2L, 98L, 2), (2L, 21L, 3),
    (3L, 97L, 1)
  ).toDF("q", "item", "rank")

  private val idcg2 = 1.0 / (math.log(2.0) / math.log(2.0)) +
    1.0 / (math.log(3.0) / math.log(2.0))

  test("per-query recall/rr/ndcg match hand arithmetic; zero-hit query kept") {
    val m = RankEval.evaluate(sys, gold, "q", "item", "rank")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(1L, 2L, 3L))
    // q1: perfect — recall 1, rr 1, ndcg 1
    assert(m(1L).getDouble(3) == 1.0)
    assert(m(1L).getDouble(4) == 1.0)
    assert(math.abs(m(1L).getDouble(5) - 1.0) < 1e-12)
    // q2: 1 of 2 found at rank 3 — recall .5, rr 1/3, ndcg = (1/log2 4)/idcg2
    assert(m(2L).getDouble(3) == 0.5)
    assert(math.abs(m(2L).getDouble(4) - 1.0 / 3.0) < 1e-12)
    assert(math.abs(m(2L).getDouble(5) - 0.5 / idcg2) < 1e-9)
    // q3: nothing — recall 0, rr NULL (no rank to reciprocate), ndcg 0
    assert(m(3L).getLong(1) == 0L && m(3L).getDouble(3) == 0.0)
    assert(m(3L).isNullAt(4))
    assert(m(3L).getDouble(5) == 0.0)
  }

  test("macroAvg: zero-hit rr counts 0 (trec convention); deterministic") {
    val per = RankEval.evaluate(sys, gold, "q", "item", "rank")
    val r = RankEval.macroAvg(per).head()
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - (1.0 + 0.5 + 0.0) / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - (1.0 + 1.0 / 3.0 + 0.0) / 3.0) < 1e-12)
    val re = RankEval.macroAvg(
      RankEval.evaluate(sys.repartition(7), gold.repartition(5),
        "q", "item", "rank")).head()
    assert(re.getDouble(1) == r.getDouble(1) &&
      re.getDouble(2) == r.getDouble(2) &&
      re.getDouble(3) == r.getDouble(3))
  }

  test("queries only in results are ignored (no gold, nothing to measure)") {
    val extra = sys.unionByName(Seq((9L, 1L, 1)).toDF("q", "item", "rank"))
    val m = RankEval.evaluate(extra, gold, "q", "item", "rank")
    assert(m.select($"q").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
