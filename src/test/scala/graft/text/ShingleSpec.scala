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
      "",                        // one empty token
      "a", "a b",                // fewer than k words
      "a b c",                   // exactly k
      "a b c d e",
      "a  b c d",                // double space -> empty token kept
      " a b c",                  // leading space
      "a b c ",                  // trailing space
      "x x x x x x",             // repeated shingles -> distinct
      "héllo wörld ünicode test" // non-ASCII
    ).toDF("text")
    val corpus = table("documents").select($"text").limit(200)
    for (df <- Seq(edge, corpus); k <- Seq(2, 3, 5)) {
      val diff = df.select(
          TextAnalysis.shingles($"text", k).as("fast"),
          hofShingles($"text", k).as("ref"))
        .filter(not($"fast" <=> $"ref"))
      assert(diff.isEmpty, s"k=$k mismatch: ${diff.head(3).mkString("; ")}")
    }
  }

  test("word_shingles is SQL-callable and k must be a literal") {
    graft.functions.registerAll(spark)
    val r = spark.sql("SELECT word_shingles('a b c d', 3) AS sh")
      .head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
  }
}
