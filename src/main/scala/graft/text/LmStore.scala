package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained n-gram language model — the
  * [[TextAnalysis.ngramLmScore]] count relations under the same
  * segment + atomic-pointer discipline as the lexical and IVF indexes
  * ([[graft.sync.SegmentedIndex]]).
  *
  * Counts are ADDITIVE, which makes the maintenance story simpler than
  * either index: an appended batch is one segment holding the batch's
  * own (w,c1)/(w2,w,c2)/(w1,w2,w,c3) counts, and a DELETE is the same
  * segment with the counts NEGATED — merged reads sum per gram and a
  * fully-retracted gram nets to zero and drops out. No tombstone
  * scoping needed (addition commutes; delete-then-reappend sums to the
  * re-appended counts either way), no compaction correctness concern
  * (compaction is the same merge materialized). Model updates after a
  * corpus refresh cost O(delta) — count the delta, flip signs for
  * removals — never a corpus recount.
  *
  * Scale shape: each segment write is the batch's partial-aggregated
  * counts (shuffled by gram key once); merged reads union the segments
  * and re-aggregate — the sum re-shuffles only the segment COUNTS (one
  * row per distinct gram per segment), never token streams. Compaction
  * bounds segment fan-out exactly like the indexes.
  */
object LmStore {

  private def writeSegment(grams: DataFrame, segDir: String,
      negate: Boolean): Unit = {
    val (uni, big, tri) = TextAnalysis.lmCounts(grams)
    def sign(df: DataFrame, c: String): DataFrame =
      if (negate) df.withColumn(c, -col(c)) else df
    sign(uni, "c1").write.mode("overwrite").parquet(s"$segDir/uni")
    sign(big, "c2").write.mode("overwrite").parquet(s"$segDir/big")
    sign(tri, "c3").write.mode("overwrite").parquet(s"$segDir/tri")
  }

  /** Create the store from an initial training corpus: one segment +
    * one atomic pointer commit. */
  def build(train: DataFrame, textCol: String, keyCol: String,
      storeDir: String): Unit = {
    val seg = graft.sync.SegmentedIndex.newSegmentName()
    writeSegment(TextAnalysis.lmGrams(train, textCol, keyCol, None),
      s"$storeDir/$seg", negate = false)
    graft.sync.SegmentedIndex.commit(train.sparkSession, storeDir, Seq(seg))
  }

  private def extend(batch: DataFrame, textCol: String, keyCol: String,
      storeDir: String, negate: Boolean): Unit = {
    val spark = batch.sparkSession
    val existing = graft.sync.SegmentedIndex.resolve(spark, storeDir)
      .getOrElse(throw new IllegalStateException(
        s"LmStore: no segmented LM store at $storeDir (build first)"))
    val seg = graft.sync.SegmentedIndex.newSegmentName()
    writeSegment(TextAnalysis.lmGrams(batch, textCol, keyCol, None),
      s"$storeDir/$seg", negate)
    graft.sync.SegmentedIndex.commit(spark, storeDir, existing :+ seg)
  }

  /** Add a document batch's counts: O(batch) — one count pass, one
    * immutable segment, one pointer replace. Batch docs must be new to
    * the store (dedup upstream), like the index append contracts. */
  def append(batch: DataFrame, textCol: String, keyCol: String,
      storeDir: String): Unit =
    extend(batch, textCol, keyCol, storeDir, negate = false)

  /** Retract documents by re-counting them NEGATED — the exact inverse
    * of the append that introduced them (same tokenization, same
    * grams). Pass the documents' text as stored; a fully-retracted
    * gram nets to zero and vanishes from merged reads. */
  def delete(docs: DataFrame, textCol: String, keyCol: String,
      storeDir: String): Unit =
    extend(docs, textCol, keyCol, storeDir, negate = true)

  /** Structured-Streaming micro-batch maintenance: each batch lands as
    * one count segment ([[append]]; the first batch [[build]]s) — the
    * same foreachBatch discipline as the lexical and IVF index streams.
    * At-least-once caveat: a replayed batch double-counts — dedup
    * upstream, or [[delete]] the replayed docs once and re-append
    * (counts are additive, so the correction is exact). */
  def appendStream(batches: DataFrame, textCol: String, keyCol: String,
      storeDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        if (graft.sync.SegmentedIndex.resolve(spark, storeDir).isEmpty)
          build(batch, textCol, keyCol, storeDir)
        else append(batch, textCol, keyCol, storeDir)
      }
    }

  /** Merge all live segments into one (the additive compaction):
    * materializes [[read]]'s summed relations and swaps the pointer,
    * physically erasing retracted grams. */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val existing = graft.sync.SegmentedIndex.resolve(spark, storeDir)
      .getOrElse(throw new IllegalStateException(
        s"LmStore: no segmented LM store at $storeDir"))
    if (existing.size <= 1) return
    val (uni, big, tri) = read(spark, storeDir)
    val seg = graft.sync.SegmentedIndex.newSegmentName()
    uni.write.mode("overwrite").parquet(s"$storeDir/$seg/uni")
    big.write.mode("overwrite").parquet(s"$storeDir/$seg/big")
    tri.write.mode("overwrite").parquet(s"$storeDir/$seg/tri")
    graft.sync.SegmentedIndex.commit(spark, storeDir, Seq(seg))
  }

  /** The merged model: per-gram count sums across live segments, with
    * netted-to-zero (fully retracted) grams dropped — bit-identical
    * relations to a wholesale recount of the surviving corpus, which
    * is exactly what the q136 gate proves. */
  def read(spark: SparkSession, storeDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val list = graft.sync.SegmentedIndex.resolve(spark, storeDir)
      .getOrElse(throw new IllegalStateException(
        s"LmStore: no segmented LM store at $storeDir"))
    require(!list.exists(graft.sync.SegmentedIndex.isTombstone),
      s"LmStore at $storeDir carries tombstone segments — deletes here " +
        "are negative-count segments, not tombstones")
    def merged(rel: String, keys: Seq[String], c: String): DataFrame =
      list.map(s => spark.read.parquet(s"$storeDir/$s/$rel"))
        .reduce(_ unionByName _)
        .groupBy(keys.map(col): _*).agg(sum(col(c)).as(c))
        .filter(col(c) > 0)
    (merged("uni", Seq("w"), "c1"),
      merged("big", Seq("w2", "w"), "c2"),
      merged("tri", Seq("w1", "w2", "w"), "c3"))
  }

  /** Score documents against the store's merged model — same backoff,
    * same DECIMAL accumulation as the wholesale
    * [[TextAnalysis.ngramLmScore]]. */
  def score(df: DataFrame, textCol: String, keyCol: String,
      storeDir: String, alpha: Double = 0.4,
      minCount: Long = 1L): DataFrame = {
    val (uni, big, tri) = read(df.sparkSession, storeDir)
    TextAnalysis.lmScoreWith(
      TextAnalysis.lmGrams(df, textCol, keyCol, None), uni, big, tri,
      alpha, minCount, keyCol)
  }
}
