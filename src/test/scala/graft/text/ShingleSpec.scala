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

  test("WordNgrams equals the HOF formula (duplicates kept, order preserved)") {
    // reference formula: transform over every start index, NO distinct
    def hofNgrams(text: Column, k: Int): Column = {
      val w = split(text, " ")
      when(size(w) >= k,
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", slice(w, i + 1, lit(k)))))
        .otherwise(array().cast("array<string>"))
    }
    val edge = Seq("", "a", "a b", "a b c", "x x x x x x",
      "a  b c d", " a b c", "a b c ", "héllo wörld ünicode test",
      null).toDF("text")
    val corpus = table("documents").select($"text").limit(200)
    for (df <- Seq(edge, corpus); k <- Seq(1, 2, 3)) {
      val bad = df.select(
          TextAnalysis.ngramsAll($"text", k).as("fast"),
          hofNgrams($"text", k).as("ref"))
        .filter(not($"fast" <=> $"ref"))
        .head(3)
      assert(bad.isEmpty, s"k=$k mismatch: ${bad.mkString("; ")}")
    }
    // the distinct/multiplicity contrast that motivates the sibling
    val r = Seq("x y x y z").toDF("text").select(
      TextAnalysis.ngramsAll($"text", 2).as("all"),
      TextAnalysis.shingles($"text", 2).as("dist")).head()
    assert(r.getSeq[String](0) == Seq("x y", "y x", "x y", "y z"))
    assert(r.getSeq[String](1) == Seq("x y", "y x", "y z"))
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

  test("char_ngram_hashes: rolling equals direct polyHash on every gram") {
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(42)
    val samples = Seq("", "a", "abab", "the quick brown fox", "aaaaaaaaaa") ++
      (1 to 30).map(_ => rng.alphanumeric.take(rng.nextInt(120)).mkString) ++
      // non-ASCII BMP chars exercise the full 16-bit code-unit range
      Seq("héllo wörld ünïcode ﬆring", "日本語のテキストです")
    for (s <- samples; n <- Seq(1, 3, 7, 40)) {
      val rolled = TextMath.charNgramHashes(UTF8String.fromString(s), n).toSeq
      val direct = (0 to s.length - n).map(i =>
        TextMath.polyHash(UTF8String.fromString(s.substring(i, i + n))))
      assert(rolled == direct, s"mismatch for n=$n on '$s'")
    }
  }

  test("char_ngram_hashes: SQL-callable, codegen'd, length arithmetic") {
    graft.functions.registerAll(spark)
    val r = spark.sql("SELECT char_ngram_hashes('abcd', 2) AS h")
      .head().getSeq[Long](0)
    assert(r.length == 3)
    // shorter than n → empty, never null
    val e = spark.sql("SELECT char_ngram_hashes('ab', 3) AS h")
      .head().getSeq[Long](0)
    assert(e.isEmpty)
  }
}
