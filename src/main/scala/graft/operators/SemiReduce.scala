package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextMath

/** Bloom semi-join reduction — the runtime-filter shape for selective
  * large×large joins: when a predicate makes one join side selective, a
  * KB-scale Bloom summary of its surviving keys is collected and inlined
  * as a LITERAL-ARRAY filter expression on the other side, so
  * non-matching fact rows are dropped inside the scan stage, BEFORE the
  * join's shuffle ever sees them. At 100 TB the exchange is the cost; a
  * 2%-selective dim side becomes a ~98% fact-row cut upstream of it.
  *
  * Versus the engine's own `spark.sql.optimizer.runtime.bloomFilter`:
  * same idea, but explicit — it applies regardless of join strategy or
  * cost-model thresholds, the false-positive budget is caller-chosen
  * (`words`), and the probe is a pure codegen'd expression (`nHash`
  * `element_at`s on a literal array + bit tests), not an injected
  * aggregate subquery. Bloom semantics guarantee NO false negatives, so
  * [[reducedJoin]]'s result is exactly the plain join's; false positives
  * only ride to the join and drop there.
  *
  * Hash family: the MinHash affine family over `pmod(key, Mod)` (the
  * pre-mod keeps `a * key` inside Long for ANY key value), 62-bit words
  * like [[graft.dedup.Dedup.bloomDecontaminate]]'s — shifts never touch
  * the sign bit.
  */
object SemiReduce {

  private val Bits62 = 62L

  /** Bloom bit index of hash probe `j` for a long key column. */
  private def bitIndex(key: Column, j: Int, words: Int): Column =
    (lit(TextMath.MinHashA(j)) * pmod(key, lit(TextMath.Mod)) +
      lit(TextMath.MinHashB(j))) % lit(TextMath.Mod) %
      lit(words * Bits62)

  private def wordIdx(b: Column): Column =
    ((b - pmod(b, lit(Bits62))) / lit(Bits62)).cast("int")

  private def mask(b: Column): Column =
    call_function("shiftleft", lit(1L), pmod(b, lit(Bits62)).cast("int"))

  /** Build the Bloom words for a key column: `words` longs held on the
    * driver. One aggregation whose output is at most `words` rows after
    * map-side bit_or — the collect moves a KB, not a key set. */
  def bloomOf(df: DataFrame, keyCol: String, nHash: Int = 3,
      words: Int = 64): Array[Long] = {
    require(nHash >= 1 && nHash <= 8 && words >= 1,
      s"bloomOf: need 1 <= nHash <= 8 and words >= 1, got $nHash/$words")
    val addr = (0 until nHash).map { j =>
      val b = bitIndex(col(keyCol), j, words)
      struct(wordIdx(b).as("w"), mask(b).as("m"))
    }
    val rows = df.select(explode(array(addr: _*)).as("bm"))
      .groupBy(col("bm.w").as("w")).agg(bit_or(col("bm.m")).as("word"))
      .collect()
    val out = Array.fill(words)(0L)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Pure-expression Bloom membership probe for a long key column
    * against driver-held words — `nHash` literal-array lookups + bit
    * tests, fully codegen'd: no join, no shuffle, pushes with the scan. */
  def mightContain(key: Column, bloom: Array[Long], nHash: Int = 3): Column =
    (0 until nHash).map { j =>
      val b = bitIndex(key, j, bloom.length)
      val word = element_at(typedlit(bloom.toSeq), wordIdx(b) + lit(1))
      val m = mask(b)
      word.bitwiseAND(m) === m
    }.reduce(_ && _)

  /** The reduced join: Bloom over `other`'s keys, literal probe filter
    * on `facts`, then the plain equi-join. Result is EXACTLY
    * `facts.join(other, factKey === otherKey)` — the oracle for any
    * query through here is the plain join. */
  def reducedJoin(facts: DataFrame, other: DataFrame,
      factKey: String, otherKey: String,
      nHash: Int = 3, words: Int = 64): DataFrame = {
    val bloom = bloomOf(other, otherKey, nHash, words)
    facts.filter(mightContain(col(factKey), bloom, nHash))
      .join(other, col(factKey) === col(otherKey))
  }
}
