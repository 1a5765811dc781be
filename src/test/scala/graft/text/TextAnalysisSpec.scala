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

  test("count-min sketch: overestimates only, bounded cardinality, shards merge") {
    val docs = (0 until 120).map { i =>
      // three planted heavy shingles + per-doc noise
      val heavy = if (i % 2 == 0) "alpha beta gamma " else "delta eps zeta "
      (i.toLong, heavy + s"noise${i} tail${i * 7} end${i * 13}")
    }.toDF("doc_id", "text")
    val cms = TextAnalysis.cmsShingleCounts(docs, "text", k = 3,
      depth = 4, width = 64).cache()
    // cardinality bound: the sketch NEVER exceeds depth*width rows, no
    // matter the vocabulary
    assert(cms.count() <= 4L * 64)
    // every estimate dominates the exact document frequency
    val exact = docs.select(explode(TextAnalysis.shingles($"text", 3)).as("shingle"))
      .groupBy($"shingle").agg(count(lit(1)).as("doc_freq"))
    val est = TextAnalysis.cmsEstimate(cms, exact, depth = 4, width = 64)
    val bad = est.filter($"cms_estimate" < $"doc_freq").count()
    assert(bad == 0L, s"$bad shingles under-estimated — CMS must only overestimate")
    // mergeability: shard sketches added cell-wise equal the whole-corpus
    // sketch (the property that lets 100 TB shards sketch independently)
    val a = TextAnalysis.cmsShingleCounts(docs.filter($"doc_id" < 60),
      "text", k = 3, depth = 4, width = 64)
    val b = TextAnalysis.cmsShingleCounts(docs.filter($"doc_id" >= 60),
      "text", k = 3, depth = 4, width = 64)
    val merged = a.unionByName(b)
      .groupBy($"row_idx", $"counter_idx").agg(sum($"cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cms.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("hyperloglog: bounded registers, dup-insensitive, shards max-merge, sane estimate") {
    val docs = (0 until 400).map { i =>
      // broad text variation (radix-31 polyHash clusters on shared prefixes)
      val src = if (i % 2 == 0) "a" else "b"
      (i.toLong, src, s"body ${(i * 2654435761L) % 999983} mid ${i * 37} tail $i")
    }.toDF("doc_id", "source", "text")
    val regs = TextAnalysis.hllRegisters(docs, "text", "source", k = 3, p = 6)
      .cache()
    // cardinality bound: at most m rows per group, whatever the vocabulary
    assert(regs.count() <= 2L * 64)
    // distinct-count semantics: repeating the corpus changes nothing
    val doubled = TextAnalysis.hllRegisters(docs.unionByName(docs),
      "text", "source", k = 3, p = 6)
    assert(doubled.exceptAll(regs).isEmpty && regs.exceptAll(doubled).isEmpty)
    // mergeability: shard registers merged by cell-wise MAX equal the
    // whole-corpus registers (shards sketch independently at 100 TB)
    val a = TextAnalysis.hllRegisters(docs.filter($"doc_id" < 200),
      "text", "source", k = 3, p = 6)
    val b = TextAnalysis.hllRegisters(docs.filter($"doc_id" >= 200),
      "text", "source", k = 3, p = 6)
    val merged = a.unionByName(b)
      .groupBy($"source", $"bucket").agg(max($"reg").as("reg"))
    assert(merged.exceptAll(regs).isEmpty && regs.exceptAll(merged).isEmpty)
    // estimate lands within the expected error band (sigma ~ 1.04/sqrt(64)
    // ~ 13% relative; 3-sigma margin keeps the test deterministic-robust)
    val est = TextAnalysis.hllEstimate(regs, "source", p = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = docs
      .select($"source", explode(TextAnalysis.shingles($"text", 3)).as("s"))
      .groupBy($"source").agg(countDistinct($"s").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (src, n) =>
      val rel = math.abs(est(src) - n) / n
      assert(rel < 0.4, s"$src: exact $n, hll ${est(src)} — rel err $rel")
    }
  }

  test("withLangId leaves caller columns named like temps untouched") {
    val df = Seq(("the a fast text", "keepme")).toDF("text", "__langid_w")
    val out = TextAnalysis.withLangId(df, "text", "pred")
    assert(out.columns.contains("__langid_w"))
    assert(out.head().getAs[String]("__langid_w") == "keepme")
    assert(out.head().getAs[String]("pred") == "en")
  }

  test("ngramLmScore: backoff ladder orders fluent > bigram-only > OOV; deterministic") {
    // train: 20 copies of one sentence → its trigrams are all known
    val trainDocs = (0L until 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog"))
    val probes = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // trigram hits
      (101L, "dog the quick lazy over brown fox jumps the"), // words known, order scrambled
      (102L, "zz qq ww rr tt yy uu ii oo pp"))                // pure OOV
    val df = (trainDocs ++ probes).toDF("doc_id", "text")
    val scored = TextAnalysis.ngramLmScore(df, "text", "doc_id",
        trainFilter = col("doc_id") < 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val (n100, s100) = scored(100L)
    val (n102, s102) = scored(102L)
    assert(n100 == 9 && n102 == 10)
    // the ladder: in-model trigrams beat scrambled (backed-off) beat OOV
    assert(s100 > scored(101L)._2, s"$s100 vs ${scored(101L)._2}")
    assert(scored(101L)._2 > s102, s"${scored(101L)._2} vs $s102")
    // the fluent doc's tokens after position 2 are all seen trigrams:
    // p = c3/c2 = 1 exactly, so only the two context-less start tokens
    // pull the average below 0
    assert(s100 > -2.0 && s100 < 0.0)
    // OOV floor: every token scores α²·1/(T+V) — all equal
    assert(s102 < math.log(0.16 / 180.0) + 1e-9)
    // DECIMAL accumulation: score invariant under repartitioning
    val re = TextAnalysis.ngramLmScore(df.repartition(7), "text", "doc_id",
        trainFilter = col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(re == scored.map { case (k, (_, s)) => k -> s })
    // minCount prunes the model: a threshold above the corpus count
    // empties tri/big, so every token backs off to the unigram floor
    val pruned = TextAnalysis.ngramLmScore(df, "text", "doc_id",
        trainFilter = col("doc_id") < 100, minCount = 1000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pruned(100L) < scored(100L)._2)
  }
}
