package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Streaming incremental dedup: a real MemoryStream run through
  * `foreachBatch` must agree with sequentially applying the batch
  * pipeline, and a replayed batch must converge to a no-op. */
class IncrementalDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def w(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // 12-word docs; a "drifted" copy changes the final word → shingle
  // Jaccard 9/11 ≈ 0.82, comfortably over the 0.5 threshold
  private val docA = w("alpha", 12)
  private val docAdrift = w("alpha", 11) + " drifttail"
  private val docB = w("bravo", 12)
  private val docC = w("charlie", 12)
  private val docD = w("delta", 12)
  private val docDdrift = w("delta", 11) + " endcap"

  private val batch1 = Seq((1L, docA), (2L, docAdrift), (3L, docB))
  private val batch2 = Seq((10L, docA), (11L, docC), (12L, docD), (13L, docDdrift))

  private def corpusIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet

  test("stream run agrees with sequential batch application") {
    val root = Files.createTempDirectory("dedup-stream").toString
    val streamDir = s"$root/stream-corpus"
    val batchDir = s"$root/batch-corpus"

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val batches = input.toDF().toDF("doc_id", "text")
    val q = Dedup.incrementalDeduplicateStream(
        batches, streamDir, "text", "doc_id", threshold = 0.5)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // the same drops through the batch API, one call per micro-batch
    def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    Dedup.appendDeduplicated(df(batch1), batchDir, "text", "doc_id", 0.5)
    Dedup.appendDeduplicated(df(batch2), batchDir, "text", "doc_id", 0.5)

    val streamed = corpusIds(streamDir)
    assert(streamed == corpusIds(batchDir))
    // semantics: batch1 keeps one of the A-clique (min key 1) + B;
    // batch2 drops the corpus-dup A, keeps C and one of the D-clique
    assert(streamed == Set(1L, 3L, 11L, 12L))
  }

  test("replaying an already-committed batch appends nothing (self-healing)") {
    val dir = Files.createTempDirectory("dedup-replay").toString + "/corpus"
    val b = batch1.toDF("doc_id", "text")
    Dedup.appendDeduplicated(b, dir, "text", "doc_id", 0.5)
    val after1 = corpusIds(dir)
    Dedup.appendDeduplicated(b, dir, "text", "doc_id", 0.5) // replay
    assert(corpusIds(dir) == after1)
  }
}
