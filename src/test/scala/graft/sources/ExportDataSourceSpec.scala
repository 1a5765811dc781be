package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.serve.Metrics

class ExportDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def writePages(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "page0.json"),
      """{"results":[{"user_book_id":1,"title":"B1","author":"A1","category":"books",
        |"source":"kindle","source_url":"https://b/1","highlights":[
        |{"id":"h1","text":"alpha","note":"n1","location":5,"url":"https://h/1",
        |"tags":[{"name":"t1"},{"name":"t2"}],
        |"highlighted_at":"2024-02-01T08:30:00Z","updated_at":"nope"},
        |{"id":"h2","text":"beta","note":null,"location":null,"url":null,
        |"tags":[],"highlighted_at":null,"updated_at":"2024-02-02T01:00:00Z"}]}]}"""
        .stripMargin.replace("\n", ""))
    Files.writeString(Paths.get(dir, "page1.json"),
      """{"results":[{"user_book_id":2,"title":"B2","author":null,"category":null,
        |"source":"web","source_url":"https://b/2","highlights":[
        |{"id":"h3","text":"gamma","note":null,"location":1,"url":null,
        |"tags":[{"name":"t3"}],"highlighted_at":"2024-03-01T00:00:00Z",
        |"updated_at":"2024-03-01T00:00:00Z"}]}]}""".stripMargin.replace("\n", ""))
  }

  test("graft-export DSv2: canonical rows, one partition per page, pruning") {
    val dir = Files.createTempDirectory("dsv2").toString
    writePages(dir)
    val df = spark.read.format("graft-export").load(dir)
    assert(df.rdd.getNumPartitions == 2) // one per page file
    val rows = df.orderBy($"id").collect()
    assert(rows.length == 3)
    val h1 = rows(0)
    assert(h1.getAs[String]("source_title") == "B1")
    assert(h1.getAs[String]("source_url") == "https://h/1") // url beats book fallback
    assert(h1.getAs[scala.collection.Seq[String]]("tags") == Seq("t1", "t2"))
    assert(h1.getAs[java.sql.Timestamp]("highlighted_at").toString
      .startsWith("2024-02-01 08:30:00"))
    assert(h1.isNullAt(h1.fieldIndex("updated_at"))) // "nope" → null-on-error
    val h2 = rows(1)
    assert(h2.isNullAt(h2.fieldIndex("location")))
    assert(h2.getAs[String]("source_url") == "https://b/1") // book fallback
    val h3 = rows(2)
    assert(h3.getAs[String]("source_type") == "article") // null category default

    // column pruning reaches the reader: plan's ReadSchema is just id/text
    val pruned = df.select($"id", $"text")
    val plan = pruned.queryExecution.executedPlan.toString
    // BatchScan's bracket list is the pruned read schema handed to the reader
    assert(plan.matches("(?s).*BatchScan graft-export:[^\\[]*\\[id#\\d+, text#\\d+\\].*"),
      s"scan not pruned to id,text:\n$plan")
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq("h1", "h2", "h3"))
  }

  test("DSv2 source agrees with the from_json ingest pipeline") {
    val dir = Files.createTempDirectory("dsv2b").toString
    writePages(dir)
    val viaDsv2 = spark.read.format("graft-export").load(dir)
      .select($"id", $"text", $"source_title", $"tags")
    val pages = Seq(
      Files.readString(Paths.get(dir, "page0.json")),
      Files.readString(Paths.get(dir, "page1.json")))
    val viaFromJson = ExportSource.pagesToHighlights(spark, pages)
      .select($"id", $"text", $"source_title", $"tags")
    assert(viaDsv2.except(viaFromJson).count() == 0)
    assert(viaFromJson.except(viaDsv2).count() == 0)
  }
}

class RetryAndMetricsSpec extends SparkTestBase {

  test("ExportClient retries with exponential backoff, then surfaces the error") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new ExportClient(
      fetchPage = (_, _) => {
        calls += 1
        if (calls < 3) throw new RuntimeException("flap")
        Page("""{"results":[]}""", None)
      },
      retryAttempts = 3, retryBaseMillis = 1000,
      sleep = d => delays += d)
    assert(flaky.export(None).toList.length == 1)
    assert(calls == 3)
    assert(delays.toSeq == Seq(1000L, 2000L)) // 1s, then 2s

    var calls2 = 0
    val dead = new ExportClient(
      fetchPage = (_, _) => { calls2 += 1; throw new RuntimeException("down") },
      retryAttempts = 3, sleep = _ => ())
    intercept[RuntimeException](dead.export(None).toList)
    assert(calls2 == 3) // gave up after the attempt budget
  }

  test("sync metrics: rows counter and duration timer move") {
    Metrics.reset()
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    val client = new ExportClient(
      fetchPage = (_, _) => Page(
        """{"results":[{"user_book_id":1,"title":"B","author":"A","category":"books",
          |"source":"k","source_url":"u","highlights":[
          |{"id":"m1","text":"x","note":null,"location":1,"url":null,"tags":[],
          |"highlighted_at":"2024-02-01T08:00:00Z","updated_at":null}]}]}"""
          .stripMargin.replace("\n", ""), None),
      sleep = _ => ())
    graft.sync.Sync.backfill(spark, client, s"$dir/store", s"$dir/ckpt")
    val snap = Metrics.snapshot
    assert(snap("rows_synced_total") == 1L)
    assert(snap("sync_duration_seconds_count") == 1L)
    assert(snap("sync_duration_seconds_sum").asInstanceOf[Double] > 0.0)
  }
}

class ExportTransportsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("HTTP request shape: auth header, base URL, encoded cursor params") {
    val req = ExportTransports.buildRequest(
      "https://readwise.io", "tok-123", "/api/v2/export/",
      Map("updatedAfter" -> "2024-01-01T00:00:00Z", "pageCursor" -> "c 1"))
    assert(req.method() == "GET")
    assert(req.headers().firstValue("Authorization").get() == "Token tok-123")
    assert(req.uri().toString ==
      "https://readwise.io/api/v2/export/?pageCursor=c+1&updatedAfter=2024-01-01T00%3A00%3A00Z")
  }

  test("nextPageCursor extraction: present, null, absent") {
    assert(ExportTransports.nextCursor("""{"results":[],"nextPageCursor":"abc"}""")
      .contains("abc"))
    assert(ExportTransports.nextCursor("""{"results":[],"nextPageCursor":null}""").isEmpty)
    assert(ExportTransports.nextCursor("""{"results":[]}""").isEmpty)
  }
}
