package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Direct unit coverage for the text-analysis column builders (they are
  * oracle-checked end-to-end via q17/q26–q29; these pin the edge cases). */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).head().getAs[T]("v")

  test("shingles: distinct word k-grams, empty below k words") {
    assert(one[scala.collection.Seq[String]](
      TextAnalysis.shingles($"text", 3), "a b c d") == Seq("a b c", "b c d"))
    assert(one[scala.collection.Seq[String]](
      TextAnalysis.shingles($"text", 3), "a b").isEmpty)
    // repeated shingles collapse (array_distinct)
    assert(one[scala.collection.Seq[String]](
      TextAnalysis.shingles($"text", 2), "x y x y") == Seq("x y", "y x"))
  }

  test("quality score stays in [0, 1] over real documents") {
    val bounds = table("documents")
      .select(TextAnalysis.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }

  test("token counts and ratios on degenerate inputs") {
    assert(one[Long](TextAnalysis.tokenCount($"text"), "one two three") == 3L)
    assert(one[Long](TextAnalysis.tokenCount($"text"), "") == 1L) // [''] like split
    assert(one[Long](TextAnalysis.regexTokenCount($"text"), "ab12cd 7") == 4L)
    assert(one[Double](TextAnalysis.stopwordRatio($"text"), "the the xyz")
      == 2.0 / 3.0)
  }

  test("fingerprint equals polyHash of the full text, order-sensitive") {
    import org.apache.spark.unsafe.types.UTF8String
    val got = one[Long](TextAnalysis.fingerprint($"text"), "abc")
    assert(got == TextMath.polyHash(UTF8String.fromString("abc")))
    assert(one[Long](TextAnalysis.fingerprint($"text"), "acb") != got)
  }

  test("withLangId leaves caller columns named like temps untouched") {
    val df = Seq(("the a fast text", "keepme")).toDF("text", "__langid_w")
    val out = TextAnalysis.withLangId(df, "text", "pred")
    assert(out.columns.contains("__langid_w"))
    assert(out.head().getAs[String]("__langid_w") == "keepme")
    assert(out.head().getAs[String]("pred") == "en")
  }
}
