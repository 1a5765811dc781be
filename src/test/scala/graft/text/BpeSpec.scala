package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Token-boundary truncation semantics (reference: tiktoken encode →
  * take MAX_TOKENS → decode, core/embedding.py:17-31) over the
  * corpus-trained merge table. */
class BpeSpec extends SparkTestBase {

  test("within-budget texts come back unchanged; merges actually fire") {
    for (t <- Seq("", "a", "the winter snow fell on the old stone wall",
        "numbers 123 4567 and punct!? end", "tab\tand\nnewline"))
      assert(BpeTokenizer.truncateToTokens(t, 8191) == t)
    // trained merges compress below the byte count on corpus-like English
    val s = "the winter morning the window the water"
    assert(BpeTokenizer.countTokens(s) < s.getBytes("UTF-8").length)
  }

  test("frozen merge table: token counts are pinned on fixed samples") {
    // the merge table is a CHECKED-IN resource (graft/bpe_merges.txt, 127
    // merges trained once by tools/train_bpe.py) — counts must be stable
    // across corpora and across rounds. If this test fails, the table was
    // regenerated: that changes every stored token count downstream, so it
    // must be a deliberate, documented act — not a side effect of a build.
    // (The counts themselves still diverge from tiktoken's cl100k — that
    // vocabulary is not shippable zero-egress; truncation SEMANTICS match.)
    val pinned = Seq(
      "the winter snow fell on the old stone wall" -> 28L,
      "numbers 123 4567 and punct!? end" -> 29L,
      "Harbor lights flickered over the cold water." -> 32L,
      "unseen-corpus words: zyzzyva qwertyuiop xylophone" -> 46L,
      "tab\tand\nnewline mixed   spaces" -> 24L)
    for ((text, want) <- pinned)
      assert(BpeTokenizer.countTokens(text) == want,
        s"count drifted for: $text")
    val merges = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/bpe_merges.txt")).getLines().size
    assert(merges == 127, s"merge table size drifted: $merges")
  }

  test("truncation cuts at a token boundary and respects the budget") {
    val text = (1 to 500).map(i => s"word$i snow winter").mkString(" ")
    val full = BpeTokenizer.countTokens(text)
    assert(full > 100)
    for (budget <- Seq(1, 7, 50, full.toInt - 1)) {
      val cut = BpeTokenizer.truncateToTokens(text, budget)
      assert(text.startsWith(cut), s"not a prefix at budget $budget")
      assert(cut.length < text.length)
      assert(BpeTokenizer.countTokens(cut) <= budget,
        s"budget $budget overshot: ${BpeTokenizer.countTokens(cut)}")
    }
    // idempotent: truncating the truncation is the identity
    val once = BpeTokenizer.truncateToTokens(text, 50)
    assert(BpeTokenizer.truncateToTokens(once, 50) == once)
  }

  test("char-cap vs token-cap divergence is zero on the corpus, and the " +
      "token cap binds first on synthetic long text") {
    import org.apache.spark.sql.functions._
    val texts = table("documents").select(col("text"))
      .collect().map(_.getString(0)).filter(_ != null)
    assert(texts.nonEmpty)
    // on every corpus document BOTH caps are no-ops — the r3 char-cap
    // divergence could never have fired on real data
    texts.foreach { t =>
      assert(t.length <= 32768)
      assert(BpeTokenizer.countTokens(t) <= BpeTokenizer.MaxTokens)
    }
    // a text past both caps: the 8191-token boundary cuts EARLIER than
    // 32768 chars (the direction the reference's semantics require)
    val long = (1 to 9000).map(i => s"w$i").mkString(" ")
    assert(long.length < 32768 * 2)
    val tokCut = BpeTokenizer.truncateToTokens(long, BpeTokenizer.MaxTokens)
    assert(tokCut.length < math.min(long.length, 32768))
    // and the embedder applies the token cap: its vector differs from the
    // untruncated hash while matching the pre-truncated text's vector
    val e = graft.embed.HashNgramEmbedder()
    assert(e.embed(long).toSeq == e.embed(tokCut).toSeq)
  }
}
