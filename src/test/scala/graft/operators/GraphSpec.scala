package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Graph.pageRank]]: mass conservation on dangling-free graphs, the
  * uniform fixed point on symmetric graphs, in-link sensitivity (a hub
  * outranks its spokes), and run-to-run determinism (the decimal
  * contribution quantization makes the sum order-free).
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("ring graph: uniform pr is the fixed point; total mass stays 1") {
    val n = 40
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val pr = Graph.pageRank(ring, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(pr.size == n)
    // every node: one in-edge from a node of out-degree 1 → pr stays 1/n
    pr.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-9, v))
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("star graph: the hub outranks every spoke") {
    // spokes 1..20 point at hub 0; hub points back at spoke 1 (no danglers)
    val edges = ((1 to 20).map(i => (i.toLong, 0L)) :+ ((0L, 1L)))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iters = 10)
      .as[(Long, Double)].collect().toMap
    val hub = pr(0L)
    (2 to 20).foreach(i => assert(hub > pr(i.toLong),
      s"hub $hub <= spoke ${pr(i.toLong)}"))
    // mass leaks only via DECIMAL(25,6) truncation: <= 5e-7/edge/iter
    assert(math.abs(pr.values.sum - 1.0) < 21 * 10 * 5e-7)
  }

  test("deterministic across runs and repartitionings") {
    val edges = (0 until 300).flatMap { i =>
      Seq((i.toLong, ((i * 7 + 3) % 300).toLong),
        (i.toLong, ((i * 13 + 5) % 300).toLong))
    }.toDF("src", "dst")
    val a = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(edges.repartition(7), "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(a == b) // bit-identical, not approximately equal
  }
}
