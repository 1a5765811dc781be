package graft.embed

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import graft.text.TextMath

/** Deterministic local text embedder replacing the reference's OpenAI call
  * (reference: readwise_vector_db/core/embedding.py:44-73 — network call to
  * `text-embedding-3-large`, 3072-dim, 8191-token truncation). Zero-egress
  * environment ⇒ hash-n-gram random-projection embedding with a fixed seed:
  * same text always maps to the same unit-norm vector, so oracle and engine
  * share vectors (SURVEY.md §7.1).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]

  /** Batch hook: a real model overrides this to amortize per-call setup
    * (tokenizer, device transfer) across a batch — the reference's OpenAI
    * client is batch-shaped for the same reason (jobs/backfill.py:57-64).
    * The deterministic default just maps. */
  def embedAll(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Feature = whitespace tokens + char trigrams; each feature's poly-hash
  * picks a bucket and a sign; L2-normalized. Over-long input is truncated
  * at a TOKEN boundary first — the reference's 8191-token cap
  * (core/embedding.py:47-54), via [[graft.text.BpeTokenizer]] — with
  * `maxChars` kept as a belt-and-braces guard (vacuous after token
  * truncation: 8191 single-merge tokens stay far below 32768 chars). */
final case class HashNgramEmbedder(dim: Int = 64, maxChars: Int = 32768,
    maxTokens: Int = graft.text.BpeTokenizer.MaxTokens)
    extends Embedder {

  def embed(text: String): Array[Float] = {
    // tokens never outnumber UTF-8 bytes (merging only shrinks): texts
    // provably within budget skip the tokenizer entirely. The cheap char
    // bound (bytes ≤ 3×chars) short-circuits without touching the bytes;
    // the exact byte count (one O(n) scan, no allocation) covers the
    // common ASCII case up to maxTokens chars before the merge loop runs
    def utf8Len(s: String): Long = {
      var i = 0; var n = 0L
      while (i < s.length) {
        val c = s.charAt(i)
        n += (if (c < 0x80) 1 else if (c < 0x800) 2
          else if (Character.isHighSurrogate(c)) { i += 1; 4 } else 3)
        i += 1
      }
      n
    }
    val tokCapped =
      if (text.length.toLong * 3 <= maxTokens || utf8Len(text) <= maxTokens)
        text
      else graft.text.BpeTokenizer.truncateToTokens(text, maxTokens)
    val t = if (tokCapped.length > maxChars) tokCapped.substring(0, maxChars)
      else tokCapped
    val v = new Array[Float](dim)
    def add(feature: String): Unit = {
      val h = TextMath.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(feature))
      val idx = (h % dim).toInt
      val sign = if (((h / dim) & 1L) == 0L) 1f else -1f
      v(idx) += sign
    }
    t.split(" ").foreach(add)
    var i = 0
    while (i + 3 <= t.length) { add(t.substring(i, i + 3)); i += 1 }
    var norm = 0.0
    v.foreach(x => norm += x.toDouble * x.toDouble)
    val n = math.sqrt(norm)
    if (n > 0) { var j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
    v
  }
}

object Embedder {
  val Default: Embedder = HashNgramEmbedder()

  /** Column form; the embedder is tiny and serializes into the closure —
    * at real scale broadcast heavier models instead. */
  def embedUdf(embedder: Embedder = Default): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) null else embedder.embed(s))

  def register(spark: SparkSession, embedder: Embedder = Default): Unit =
    spark.udf.register("embed_text", embedUdf(embedder))

  /** Batched per-partition embedding: rows stream through
    * [[Embedder.embedAll]] in `batchSize` chunks (narrow, no shuffle) —
    * the plumbing a real model needs; identical output to the UDF form
    * for the deterministic embedder. Null text → null vector. */
  def embedBatched(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String = "embedding", embedder: Embedder = Default,
      batchSize: Int = 256): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val outSchema = df.schema.add(outCol, ArrayType(FloatType), nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val texts = chunk.map(r => Option(r.getString(idx)))
        val present = texts.flatten
        val vecs = embedder.embedAll(present).iterator
        chunk.zip(texts).map { case (r, t) =>
          Row.fromSeq(r.toSeq :+ t.map(_ => vecs.next()).orNull)
        }
      }
    }(enc)
  }
}
