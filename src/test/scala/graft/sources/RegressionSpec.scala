package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Cli, SparkTestBase}
import graft.sync.HighlightStore

/** Regressions from the round-2 self-review. */
class RegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("DSv2 timestamps: negative offsets, naive-as-UTC, garbage → null") {
    assert(ExportDataSource.parseTimestampMicros("2024-01-15T10:00:00-05:00")
      == (1705330800L * 1000000L)) // 15:00 UTC
    assert(ExportDataSource.parseTimestampMicros("2024-01-15T10:00:00+02:00")
      == (1705305600L * 1000000L)) // 08:00 UTC
    assert(ExportDataSource.parseTimestampMicros("2024-01-15T10:00:00Z")
      == (1705312800L * 1000000L))
    assert(ExportDataSource.parseTimestampMicros("2024-01-15T10:00:00")
      == (1705312800L * 1000000L)) // naive = UTC (session tz)
    assert(ExportDataSource.parseTimestampMicros("not-a-date") == null)
  }

  test("store swap: CURRENT pointer always resolves; legacy layout readable") {
    val dir = Files.createTempDirectory("swap").toString
    val v1 = Seq((1L, "a")).toDF("id", "text")
    HighlightStore.writeAtomic(v1, dir)
    assert(Files.exists(Paths.get(dir, "CURRENT")))
    HighlightStore.writeAtomic(Seq((1L, "b")).toDF("id", "text"), dir)
    HighlightStore.writeAtomic(Seq((1L, "c")).toDF("id", "text"), dir)
    // after three commits the pointer names the newest version; retention
    // keeps exactly the 2 newest version dirs (grace period for lazy
    // readers of the just-superseded one)
    assert(HighlightStore.read(spark, dir).get.head().getString(1) == "c")
    val versions = scala.util.Using.resource(Files.list(Paths.get(dir))) {
      s => scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString).filter(_.startsWith("v-")).toSeq
    }
    assert(versions.length == 2, s"retention kept $versions")
    assert(versions.sorted.last ==
      Files.readString(Paths.get(dir, "CURRENT")).trim)
    // legacy layout: plain `current` directory without a pointer
    val legacy = Files.createTempDirectory("legacy").toString
    Seq((7L, "legacy")).toDF("id", "text")
      .write.parquet(s"$legacy/current")
    assert(HighlightStore.read(spark, legacy).get.head().getString(1) == "legacy")
  }

  test("empty pages dir: CLI backfill syncs 0 rows instead of crashing") {
    val dir = Files.createTempDirectory("emptysync").toString
    Files.createDirectories(Paths.get(dir, "pages"))
    val client = Cli.dirClient(s"$dir/pages")
    val n = graft.sync.Sync.backfill(spark, client, s"$dir/store", s"$dir/ckpt")
    assert(n == 0)
  }

  test("fatal fetch errors skip the retry budget") {
    var calls = 0
    val c = new ExportClient(
      fetchPage = (_, _) => { calls += 1; throw new FatalFetchException("401") },
      retryAttempts = 3, sleep = _ => fail("must not back off on fatal"))
    intercept[FatalFetchException](c.export(None).toList)
    assert(calls == 1)
  }

  test("MCP line guard is byte-accurate for multibyte text") {
    import graft.serve.{McpFraming, McpFramingException}
    // 400 chars of 3-byte CJK = 1200 bytes > a 1000-byte cap
    val wide = "世" * 400
    val line = s"""{"jsonrpc":"2.0","method":"search","params":{"q":"$wide"}}"""
    intercept[McpFramingException](McpFraming.parseLine(line, maxLineLength = 1000))
    // same char count in ASCII fits
    val ascii = "x" * 400
    val ok = s"""{"jsonrpc":"2.0","method":"search","params":{"q":"$ascii"}}"""
    assert(McpFraming.parseLine(ok, maxLineLength = 1000).method.contains("search"))
  }
}

class ExportStreamingSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("graft-export streaming: new page files arrive as micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("dsv2stream").toString
    def page(hid: String): String =
      s"""{"results":[{"user_book_id":1,"title":"B","author":"A","category":"books",
         |"source":"k","source_url":"u","highlights":[
         |{"id":"$hid","text":"t $hid","note":null,"location":1,"url":null,"tags":[],
         |"highlighted_at":"2024-02-01T08:00:00Z","updated_at":null}]}]}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "p0.json"), page("h1"))
    val q = spark.readStream.format("graft-export").load(dir)
      .writeStream.format("memory").queryName("export_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("export_stream").count() == 1)
      // a new page lands -> next micro-batch picks up ONLY the new file
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), page("h2"))
      q.processAllAvailable()
      val ids = spark.table("export_stream")
        .select(col("id")).collect().map(_.getString(0)).sorted.toSeq
      assert(ids == Seq("h1", "h2"))
    } finally q.stop()
  }
}
