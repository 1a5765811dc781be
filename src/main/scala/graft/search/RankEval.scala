package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the measurement harness every ANN/retrieval
  * dial in this engine (nprobe, ef, refine, dPrefix, bands…) is tuned
  * against, as a first-class distributed operator instead of ad-hoc
  * driver arithmetic: per-query recall@k, reciprocal rank and binary
  * nDCG@k of a system ranking against a gold ranking.
  *
  * Scale shape: one equi-join of (query, item) pairs + two per-query
  * aggregations — both sides are ≤ k rows per query however large the
  * corpus they were cut from, so the eval costs O(|queries|·k) total.
  * DCG terms quantize to DECIMAL(25,12) before summing (the PageRank
  * float-state discipline), so metrics are bit-stable under any
  * partitioning — and oracle-replicable.
  */
object RankEval {

  /** `results`: the system ranking — (queryCol, itemCol, rankCol) with
    * rank 1-based dense per query, at most k rows per query.
    * `gold`: the reference ranking, same layout (its OWN rank column is
    * `rankCol` too). Both prunings must use the same k for recall@k's
    * denominator to mean what it says. Queries present in `gold` but
    * absent from `results` score 0/NULL-rr/0; queries only in
    * `results` are ignored (no gold = nothing to measure). */
  def evaluate(results: DataFrame, gold: DataFrame, queryCol: String,
      itemCol: String, rankCol: String): DataFrame = {
    val res = results.select(col(queryCol).as("qid"), col(itemCol).as("item"),
      col(rankCol).cast("int").as("rank"))
    val g = gold.select(col(queryCol).as("qid"), col(itemCol).as("item"),
      col(rankCol).cast("int").as("grank"))
    // per-query gold size (the recall denominator and the iDCG depth)
    val gn = g.groupBy(col("qid")).agg(
      count(lit(1)).as("n_gold"),
      // iDCG = sum_{i=1..n_gold} 1/log2(i+1), DECIMAL-summed
      sum((lit(1.0) / (log(col("grank").cast("double") + lit(1.0)) /
          log(lit(2.0)))).cast("decimal(25,12)")).as("idcg"))
    val hits = res.join(g.select(col("qid"), col("item")), Seq("qid", "item"))
    val perQuery = hits.groupBy(col("qid")).agg(
      count(lit(1)).as("n_hits"),
      min(col("rank")).as("first_hit"),
      sum((lit(1.0) / (log(col("rank").cast("double") + lit(1.0)) /
          log(lit(2.0)))).cast("decimal(25,12)")).as("dcg"))
    gn.join(perQuery, Seq("qid"), "left")
      .select(col("qid").as(queryCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_gold"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_gold").cast("double")).as("recall"),
        // NULL rr for a zero-hit query (no rank to reciprocate) — the
        // macro-average caller decides whether that is 0 or excluded
        (lit(1.0) / col("first_hit").cast("double")).as("rr"),
        (coalesce(col("dcg"), lit(java.math.BigDecimal.ZERO)).cast("double") /
          col("idcg").cast("double")).as("ndcg"))
  }

  /** Macro averages over [[evaluate]]'s per-query rows: zero-hit
    * queries count 0 toward MRR (the trec_eval convention). */
  def macroAvg(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      (sum(col("recall").cast("decimal(25,12)")).cast("double") /
        count(lit(1)).cast("double")).as("mean_recall"),
      (sum(coalesce(col("rr"), lit(0.0)).cast("decimal(25,12)"))
        .cast("double") / count(lit(1)).cast("double")).as("mrr"),
      (sum(col("ndcg").cast("decimal(25,12)")).cast("double") /
        count(lit(1)).cast("double")).as("mean_ndcg"))
}
