package graft

import org.apache.spark.sql.functions._

import graft.functions.topk_pairs

/** [[graft.functions.TopKPairs]] — the bounded-heap grouped top-k
  * aggregate: result identical to the window formulation (including
  * ties), invariant under repartitioning (the merge path), null-safe,
  * short groups kept whole, runs through ObjectHashAggregate with a
  * partial (map-side) stage, and callable from SQL.
  */
class TopKPairsSpec extends SparkTestBase {
  import spark.implicits._

  // ties forced: ord drawn from 40 distinct values over 5000 rows
  private def rows = (0 until 5000).map { i =>
    (i % 7, ((i * 2654435761L) % 40).toDouble / 8.0, i.toLong)
  }.toDF("g", "ord", "id")

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g").agg(topk_pairs($"ord", $"id", k).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", (col("pos") + 1).cast("int").as("rank"),
        $"col.ord".as("ord"), $"col.id".as("id"))
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"ord".asc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"rank".cast("int"), $"ord", $"id")
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
  }

  test("equals the window top-k, ties included, at several k") {
    Seq(1, 3, 17).foreach { k =>
      assert(viaAgg(rows, k) == viaWindow(rows, k), s"k = $k")
    }
  }

  test("invariant under repartitioning — the partial/merge path is exercised") {
    assert(viaAgg(rows.repartition(13), 5) == viaAgg(rows.repartition(1), 5))
  }

  test("null ord/id rows are skipped; short groups keep all members") {
    val df = Seq(
      (0, Some(1.0), Some(1L)), (0, None, Some(2L)), (0, Some(0.5), None),
      (0, Some(2.0), Some(3L)), (1, Some(9.0), Some(9L)))
      .toDF("g", "ord", "id")
    val got = viaAgg(df, 10)
    assert(got == Set((0, 1, 1.0, 1L), (0, 2, 2.0, 3L), (1, 1, 9.0, 9L)))
  }

  test("plans as ObjectHashAggregate with a partial map-side stage") {
    val plan = rows.groupBy($"g").agg(topk_pairs($"ord", $"id", 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(plan.contains("partial_topk_pairs"), plan.take(400))
  }

  test("SQL k literal: fractional and out-of-range values error, never truncate") {
    graft.functions.registerAll(spark)
    rows.createOrReplaceTempView("tkrows")
    // k=2.5 must be rejected at analysis, not silently become k=2
    val frac = intercept[Exception] {
      spark.sql("SELECT g, topk_pairs(ord, id, 2.5) FROM tkrows GROUP BY g")
        .collect()
    }
    assert(frac.getMessage.contains("integer literal"), frac.getMessage)
    // k beyond Int range must be rejected, not wrap to a small positive k
    val big = intercept[Exception] {
      spark.sql(
        "SELECT g, topk_pairs(ord, id, 4294967297) FROM tkrows GROUP BY g")
        .collect()
    }
    assert(big.getMessage.contains("2^20"), big.getMessage)
  }

  test("callable from SQL once registered") {
    graft.functions.registerAll(spark)
    rows.createOrReplaceTempView("tkrows")
    val n = spark.sql(
      "SELECT g, topk_pairs(ord, id, 3) AS top FROM tkrows GROUP BY g")
      .select(size($"top")).collect().map(_.getInt(0))
    assert(n.length == 7 && n.forall(_ == 3))
  }
}
