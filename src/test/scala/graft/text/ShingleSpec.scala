package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the codegen'd [[WordShingles]] expression byte-for-byte to the
  * higher-order-function formula it replaced (the DuckDB oracle's
  * `sqlShingles` replicates THAT formula, so equivalence here is what
  * keeps every shingle-based gated query hash-exact). */
class ShingleSpec extends SparkTestBase {
  import spark.implicits._

  /** The original Column formula, verbatim. */
  private def hofShingles(text: Column, k: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= k,
      array_distinct(transform(sequence(lit(0), size(w) - k),
        i => concat_ws(" ", slice(w, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  test("WordShingles equals the HOF formula on edge cases and the corpus") {
    val edge = Seq(
      "",                         // one empty token
      "a", "a b",                 // fewer than k words
      "a b c",                    // exactly k
      "a b c d e",
      "a  b c d",                 // double space -> empty token kept
      " a b c",                   // leading space
      "a b c ",                   // trailing space
      "x x x x x x",              // repeated shingles -> distinct
      "héllo wörld ünicode test", // non-ASCII
      null                        // null text -> [] in BOTH forms
    ).toDF("text")
    val corpus = table("documents").select($"text").limit(200)
    for (df <- Seq(edge, corpus); k <- Seq(2, 3, 5)) {
      val bad = df.select(
          TextAnalysis.shingles($"text", k).as("fast"),
          hofShingles($"text", k).as("ref"))
        .filter(not($"fast" <=> $"ref"))
        .head(3)
      assert(bad.isEmpty, s"k=$k mismatch: ${bad.mkString("; ")}")
    }
  }

  test("hashTokens propagates null elements like the transform it replaced") {
    val r = Seq(1).toDF("i")
      .select(TextAnalysis.hashTokens(
        array(lit("a"), lit(null).cast("string"), lit("b"))).as("h"))
      .head().getSeq[Any](0)
    assert(r.length == 3 && r(1) == null && r(0) != null && r(2) != null)
  }

  test("word_shingles is SQL-callable and k must be a literal") {
    graft.functions.registerAll(spark)
    val r = spark.sql("SELECT word_shingles('a b c d', 3) AS sh")
      .head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
  }
}
