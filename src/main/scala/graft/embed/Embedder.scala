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
}

/** Feature = whitespace tokens + char trigrams; each feature's poly-hash
  * picks a bucket and a sign; L2-normalized. maxChars mirrors the
  * reference's 8191-token truncation (core/embedding.py:49-54) as a
  * deterministic char cap. */
final case class HashNgramEmbedder(dim: Int = 64, maxChars: Int = 32768)
    extends Embedder {

  def embed(text: String): Array[Float] = {
    val t = if (text.length > maxChars) text.substring(0, maxChars) else text
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
}
