package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Substring-level (window) exact dedup: planted-block detection, tail
  * exclusion, and span cutting with keeper semantics. */
class WindowDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val boiler = (0 until 10).map(i => s"b$i").mkString(" ") // 10 words
  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("planted block surfaces in every carrier; unique windows never report") {
    val docs = Seq(
      (1L, boiler + " " + words("one", 25)),   // block at window 0
      (2L, boiler + " " + words("two", 25)),   // block at window 0
      (3L, words("thr", 10) + " " + boiler + " " + words("thr2", 10)), // window 1
      (4L, words("solo", 40))                  // nothing shared
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "text", "doc_id", windowWords = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(spans == Set((1L, 0), (2L, 0), (3L, 1)))
    val nDocs = Dedup.duplicatedSpans(docs, "text", "doc_id", windowWords = 10)
      .select("n_docs").distinct().as[Long].collect().toSet
    assert(nDocs == Set(3L))
  }

  test("partial tail windows are excluded even when byte-identical") {
    // shared 5-word tail: a full 10-word window would catch it; the
    // 5-word tail fragment must not
    val docs = Seq(
      (1L, words("a", 10) + " tail0 tail1 tail2 tail3 tail4"),
      (2L, words("b", 10) + " tail0 tail1 tail2 tail3 tail4")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(docs, "text", "doc_id", 10).count() == 0)
  }

  test("cutDuplicatedSpans keeps one corpus-wide copy (min key) and all unique text") {
    val docs = Seq(
      (5L, boiler + " " + words("one", 10)),
      (3L, boiler + " " + words("two", 10)),
      (7L, words("solo", 12))
    ).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, "text", "doc_id", windowWords = 10)
      .as[(Long, String)].collect().toMap
    assert(out(3L) == boiler + " " + words("two", 10)) // keeper: block stays
    assert(out(5L) == words("one", 10))                // cut: unique tail only
    assert(out(7L) == words("solo", 12))               // untouched roundtrip
  }

  test("a document that is all duplicated windows survives as empty text") {
    val docs = Seq(
      (1L, boiler),
      (2L, boiler)
    ).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, "text", "doc_id", windowWords = 10)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == boiler) // keeper
    assert(out(2L) == "")     // cut to nothing, still present
  }
}
