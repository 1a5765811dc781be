package graft.text

import java.nio.charset.StandardCharsets

/** Byte-pair-merge tokenizer + token-boundary truncation — the engine's
  * analog of the reference's tiktoken `cl100k_base` truncation
  * (readwise_vector_db/core/embedding.py:17-31: encode → first 8191
  * tokens → decode). The MECHANISM is the public BPE algorithm — the
  * cl100k pretokenizer regex splits text, each pretoken's UTF-8 bytes are
  * merged bottom-up by rank, truncation cuts at a token boundary and
  * re-decodes — but the merge table is trained from the project's test
  * corpus (`tools/train_bpe.py` → `graft/bpe_merges.txt`), because the
  * real cl100k vocabulary is not shippable in a zero-egress build. That
  * is a VOCABULARY divergence, not a semantics one: token counts differ
  * from tiktoken's, token-boundary truncation behaves identically
  * (SURVEY.md §7.4).
  */
object BpeTokenizer extends Serializable {

  /** Reference MAX_TOKENS (core/embedding.py:11). */
  val MaxTokens = 8191

  /** cl100k_base pretokenizer pattern (public, from the tiktoken repo). */
  private val Pretoken = (
    "'(?i:[sdmt]|ll|ve|re)|[^\\r\\n\\p{L}\\p{N}]?\\p{L}+|\\p{N}{1,3}" +
    "| ?[^\\s\\p{L}\\p{N}]+[\\r\\n]*|\\s*[\\r\\n]|\\s+(?!\\S)|\\s+").r

  /** (left bytes, right bytes) → rank; loaded once per JVM. */
  private lazy val ranks: Map[(Seq[Byte], Seq[Byte]), Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().zipWithIndex.map { case (line, rank) =>
      val Array(a, b) = line.trim.split(" ")
      def hex(s: String): Seq[Byte] =
        s.grouped(2).map(Integer.parseInt(_, 16).toByte).toSeq
      (hex(a), hex(b)) -> rank
    }.toMap
    finally src.close()
  }

  /** One pretoken's UTF-8 bytes → token parts, by repeatedly merging the
    * lowest-rank adjacent pair (all occurrences, left-to-right) until no
    * ranked pair remains — deterministic for a fixed merge table. */
  private def mergeParts(bytes: Array[Byte]): Vector[Seq[Byte]] = {
    var parts: Vector[Seq[Byte]] = bytes.iterator.map(b => Seq(b)).toVector
    var done = parts.length < 2
    while (!done) {
      val best = parts.iterator.zip(parts.iterator.drop(1))
        .flatMap(p => ranks.get(p).map(r => (r, p)))
        .minByOption(_._1)
      best match {
        case None => done = true
        case Some((_, (a, b))) =>
          val out = Vector.newBuilder[Seq[Byte]]
          var i = 0
          while (i < parts.length) {
            if (i + 1 < parts.length && parts(i) == a && parts(i + 1) == b) {
              out += (a ++ b); i += 2
            } else { out += parts(i); i += 1 }
          }
          parts = out.result()
          done = parts.length < 2
      }
    }
    parts
  }

  private def pretokens(text: String): Iterator[String] =
    Pretoken.findAllIn(text)

  def countTokens(text: String): Long =
    if (text == null) 0L
    else pretokens(text).map(pt =>
      mergeParts(pt.getBytes(StandardCharsets.UTF_8)).length.toLong).sum

  /** Truncate to at most `maxTokens` tokens at a TOKEN boundary (encode →
    * take → decode, embedding.py:24-31). The kept bytes are a prefix of
    * the original UTF-8 encoding; a cut inside a multi-byte character
    * decodes with replacement — the same contract as tiktoken's
    * `decode(errors="replace")`. Texts within budget come back unchanged. */
  def truncateToTokens(text: String, maxTokens: Int = MaxTokens): String = {
    if (text == null) return null
    var budget = maxTokens
    val kept = new java.io.ByteArrayOutputStream()
    var truncated = false
    val it = pretokens(text)
    while (budget > 0 && it.hasNext && !truncated) {
      val pt = it.next()
      val parts = mergeParts(pt.getBytes(StandardCharsets.UTF_8))
      if (parts.length <= budget) {
        kept.write(pt.getBytes(StandardCharsets.UTF_8))
        budget -= parts.length
      } else {
        parts.take(budget).foreach(p => kept.write(p.toArray))
        budget = 0
        truncated = true
      }
    }
    if (!truncated && !it.hasNext && budget >= 0) text
    else new String(kept.toByteArray, StandardCharsets.UTF_8)
  }
}
