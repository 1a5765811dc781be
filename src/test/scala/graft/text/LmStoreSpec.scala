package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[LmStore]] — the n-gram model under segment maintenance: additive
  * counts make append/delete/compact exact (no tombstone scoping, no
  * approximation), so every maintained read must equal a wholesale
  * recount of the surviving corpus bit-for-bit. */
class LmStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (0L until 60L).map { i =>
    (i, s"the quick w${i % 7} fox jumps over the lazy w${i % 5} dog end$i")
  }.toDF("doc_id", "text")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("lmstore").toString

  private def rm(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2))).toMap

  test("build+append+delete merges to the wholesale recount, bit-for-bit") {
    val dir = tmp()
    try {
      val d = corpus
      LmStore.build(d.filter($"doc_id" % 2 === 0), "text", "doc_id", dir)
      LmStore.append(d.filter($"doc_id" % 2 === 1), "text", "doc_id", dir)
      LmStore.delete(d.filter($"doc_id" % 7 === 3), "text", "doc_id", dir)
      val maintained = scores(LmStore.score(d, "text", "doc_id", dir))
      val wholesale = scores(TextAnalysis.ngramLmScore(d, "text", "doc_id",
        trainFilter = $"doc_id" % 7 =!= 3))
      assert(maintained == wholesale)
      // three segments live before compaction; one after — same scores
      assert(graft.sync.SegmentedIndex.resolve(spark, dir).get.size == 3)
      LmStore.compact(spark, dir)
      assert(graft.sync.SegmentedIndex.resolve(spark, dir).get.size == 1)
      assert(scores(LmStore.score(d, "text", "doc_id", dir)) == wholesale)
      // a fully-retracted gram is GONE from the merged model (netted to
      // zero), not just down-weighted: delete every doc that carries a
      // w6 token and the unigram vanishes
      val (uni, _, _) = LmStore.read(spark, dir)
      assert(uni.filter($"w" === "w6").count() ==
        (if (d.filter($"doc_id" % 7 =!= 3 && $"text".contains("w6"))
          .count() > 0) 1L else 0L))
    } finally rm(dir)
  }

  test("delete-then-reappend nets to the reappended counts (CDC shape)") {
    val dir = tmp()
    try {
      val d = corpus
      LmStore.build(d, "text", "doc_id", dir)
      val moving = d.filter($"doc_id" % 11 === 5)
      LmStore.delete(moving, "text", "doc_id", dir)
      LmStore.append(moving, "text", "doc_id", dir)
      val roundTrip = scores(LmStore.score(d, "text", "doc_id", dir))
      val wholesale = scores(TextAnalysis.ngramLmScore(d, "text", "doc_id",
        trainFilter = lit(true)))
      assert(roundTrip == wholesale)
    } finally rm(dir)
  }

  test("appendStream: MemoryStream run equals the wholesale model") {
    val root = tmp()
    try {
      val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val df = input.toDF().toDF("doc_id", "text")
      val q = LmStore.appendStream(df, "text", "doc_id", s"$root/store")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try {
        input.addData(rows.filter(_._1 < 30): _*) // first batch BUILDS
        q.processAllAvailable()
        input.addData(rows.filter(_._1 >= 30): _*) // second APPENDS
        q.processAllAvailable()
      } finally q.stop()
      assert(graft.sync.SegmentedIndex
        .resolve(spark, s"$root/store").get.size == 2)
      val streamed = scores(LmStore.score(corpus, "text", "doc_id",
        s"$root/store"))
      val wholesale = scores(TextAnalysis.ngramLmScore(corpus, "text",
        "doc_id", trainFilter = lit(true)))
      assert(streamed == wholesale)
    } finally rm(root)
  }

  test("append to a missing store fails loudly; minCount prunes at read") {
    val dir = tmp()
    try {
      intercept[IllegalStateException] {
        LmStore.append(corpus, "text", "doc_id", dir)
      }
      LmStore.build(corpus, "text", "doc_id", dir)
      val pruned = scores(LmStore.score(corpus, "text", "doc_id", dir,
        minCount = 1000L))
      val full = scores(LmStore.score(corpus, "text", "doc_id", dir))
      // an absurd threshold empties tri/big → every score drops to the
      // backed-off floor
      assert(corpus.collect().forall { r =>
        pruned(r.getLong(0))._2 < full(r.getLong(0))._2 })
    } finally rm(dir)
  }
}
