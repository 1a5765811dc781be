package graft.sync

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.{ExportClient, ExportSource, Page}

class ExportClientSpec extends SparkTestBase {

  private def page(books: String, cursor: Option[String]): String =
    s"""{"results":[$books]${cursor.map(c => s""","nextPageCursor":"$c"""").getOrElse("")}}"""

  private def book(id: Int, nHighlights: Int): String = {
    val hs = (0 until nHighlights).map { i =>
      s"""{"id":"${id * 100 + i}","text":"highlight $i of book $id",
         |"note":null,"location":${i + 1},"url":null,
         |"tags":[{"name":"t$i"}],
         |"highlighted_at":"2024-02-0${i + 1}T08:00:00Z","updated_at":"bogus"}""".stripMargin.replace("\n", "")
    }.mkString(",")
    s"""{"user_book_id":$id,"title":"Book $id","author":"A$id","category":"books",
       |"source":"kindle","source_url":"https://b/$id","highlights":[$hs]}""".stripMargin.replace("\n", "")
  }

  test("cursor pagination: follows nextPageCursor, paces between pages") {
    var delays = 0
    val fetched = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    val client = new ExportClient(
      fetchPage = (_, params) => {
        fetched += params
        params.get("pageCursor") match {
          case None => Page(page(book(1, 2), Some("c1")), Some("c1"))
          case Some("c1") => Page(page(book(2, 1), Some("c2")), Some("c2"))
          case Some("c2") => Page(page(book(3, 1), None), None)
          case other => fail(s"unexpected cursor $other")
        }
      },
      delayMillis = 3000,
      sleep = _ => delays += 1)
    val pages = client.export(Some("2024-01-01T00:00:00Z")).toList
    assert(pages.length == 3)
    assert(delays == 2) // paced between pages, not before the first
    assert(fetched.head.get("updatedAfter").contains("2024-01-01T00:00:00Z"))
    assert(fetched.head.get("pageCursor").isEmpty)
    assert(fetched(2).get("pageCursor").contains("c2"))
  }

  test("pagesToHighlights: declared schema parse + flatten + canonicalize") {
    val pages = Seq(page(book(1, 2) + "," + book(2, 1), None))
    val df = ExportSource.pagesToHighlights(spark, pages)
    val rows = df.orderBy(col("id")).collect()
    assert(rows.length == 3)
    val r = rows.head
    assert(r.getAs[String]("id") == "100")
    assert(r.getAs[String]("source_title") == "Book 1")
    assert(r.getAs[String]("source_author") == "A1")
    assert(r.getAs[String]("source_url") == "https://b/1") // coalesce: book fallback
    assert(r.getAs[scala.collection.Seq[String]]("tags") == Seq("t0"))
    assert(r.getAs[java.sql.Timestamp]("highlighted_at") != null)
    assert(r.isNullAt(r.fieldIndex("updated_at"))) // "bogus" → null-on-error
  }
}

class SyncSpec extends SparkTestBase {

  private def pageJson(bookId: Int, text: String, hid: String): String =
    s"""{"results":[{"user_book_id":$bookId,"title":"B$bookId","author":"A","category":"books",
       |"source":"kindle","source_url":"https://b/$bookId","highlights":[
       |{"id":"$hid","text":"$text","note":null,"location":1,"url":null,"tags":[],
       |"highlighted_at":"2024-02-01T08:00:00Z","updated_at":"2024-02-01T08:00:00Z"}]}]}"""
      .stripMargin.replace("\n", "")

  private def clientFor(pages: Seq[String]): ExportClient = {
    new ExportClient(
      fetchPage = (_, params) => {
        val idx = params.get("pageCursor").map(_.toInt).getOrElse(0)
        val next = if (idx + 1 < pages.length) Some((idx + 1).toString) else None
        Page(pages(idx), next)
      },
      sleep = _ => ())
  }

  test("backfill then incremental: upsert newest-wins, watermark advances") {
    val dir = Files.createTempDirectory("graft-sync").toString
    val store = s"$dir/store"
    val ckpt = s"$dir/ckpt"
    var clock = Instant.parse("2024-03-01T00:00:00Z")

    // backfill: two pages, two highlights
    val n1 = Sync.backfill(spark,
      clientFor(Seq(pageJson(1, "original text", "h1"), pageJson(2, "other", "h2"))),
      store, ckpt, now = () => clock)
    assert(n1 == 2)
    val wm1 = graft.ingest.SyncState.read(ckpt, Sync.ServiceName)
    assert(wm1.contains(clock))
    val after1 = HighlightStore.read(spark, store).get
    assert(after1.count() == 2)
    assert(after1.filter(col("embedding").isNotNull).count() == 2)

    // incremental: h1 updated, h3 new; watermark advances to new clock
    clock = Instant.parse("2024-03-02T00:00:00Z")
    val n2 = Sync.incremental(spark,
      clientFor(Seq(pageJson(1, "updated text", "h1"), pageJson(3, "brand new", "h3"))),
      store, ckpt, now = () => clock)
    assert(n2.contains(2L))
    val after2 = HighlightStore.read(spark, store).get
    assert(after2.count() == 3)
    assert(after2.filter(col("id") === "h1").head().getAs[String]("text") == "updated text")
    assert(graft.ingest.SyncState.read(ckpt, Sync.ServiceName).contains(clock))

    // idempotence: re-running the same increment changes nothing
    val n3 = Sync.incremental(spark,
      clientFor(Seq(pageJson(1, "updated text", "h1"))),
      store, ckpt, now = () => clock)
    assert(n3.contains(1L))
    assert(HighlightStore.read(spark, store).get.count() == 3)
  }

  test("backfill parses pages on executors: one DSv2 partition per page") {
    val dir = Files.createTempDirectory("graft-sync3").toString
    val spool = s"$dir/landing"
    val pages = Seq(pageJson(1, "p1", "h1"), pageJson(2, "p2", "h2"),
      pageJson(3, "p3", "h3"))
    val n = Sync.backfill(spark, clientFor(pages), s"$dir/store", s"$dir/ckpt",
      spoolDir = Some(spool))
    assert(n == 3)
    // the landing zone holds one file per page in cursor order...
    val files = new java.io.File(spool).listFiles().map(_.getName)
      .filter(_.endsWith(".json")).filterNot(_.startsWith(".")).sorted
    assert(files.toSeq == Seq("page-000000.json", "page-000001.json", "page-000002.json"))
    // ...and the scan the backfill ran is the multi-partition DSv2 source
    // (executor-side parse), not a driver-materialized page list
    val scan = spark.read.format("graft-export").load(spool)
    assert(scan.rdd.getNumPartitions == 3)
    assert(scan.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(HighlightStore.read(spark, s"$dir/store").get.count() == 3)
  }

  test("incremental routes through the spool: multi-partition DSv2 scan, " +
      "lenient timestamps parsed like the batch path") {
    val dir = Files.createTempDirectory("graft-sync4").toString
    val spool = s"$dir/landing-inc"
    // a page whose timestamps use the space-separated and date-only forms
    // datetime.fromisoformat (and try_to_timestamp) accept
    val lenient =
      s"""{"results":[{"user_book_id":9,"title":"B9","author":"A","category":"books",
         |"source":"kindle","source_url":"https://b/9","highlights":[
         |{"id":"h9","text":"lenient","note":null,"location":1,"url":null,"tags":[],
         |"highlighted_at":"2024-02-01 08:30:00","updated_at":"2024-02-03"}]}]}"""
        .stripMargin.replace("\n", "")
    val pages = Seq(pageJson(1, "p1", "h1"), pageJson(2, "p2", "h2"), lenient)
    val n = Sync.incremental(spark, clientFor(pages), s"$dir/store",
      s"$dir/ckpt", since = Some(Instant.parse("2024-01-01T00:00:00Z")),
      spoolDir = Some(spool))
    assert(n.contains(3L))
    // the increment's input is the landing zone parsed by the DSv2 source:
    // one partition per page (executor-side parse), same as backfill
    val files = new java.io.File(spool).listFiles().map(_.getName)
      .filter(_.endsWith(".json")).filterNot(_.startsWith(".")).sorted
    assert(files.toSeq == Seq("page-000000.json", "page-000001.json", "page-000002.json"))
    val scan = spark.read.format("graft-export").load(spool)
    assert(scan.rdd.getNumPartitions == 3)
    assert(scan.queryExecution.executedPlan.toString.contains("BatchScan"))
    val store = HighlightStore.read(spark, s"$dir/store").get
    val h9 = store.filter(col("id") === "h9").head()
    assert(h9.getAs[java.sql.Timestamp]("highlighted_at").toInstant ==
      Instant.parse("2024-02-01T08:30:00Z"))
    assert(h9.getAs[java.sql.Timestamp]("updated_at").toInstant ==
      Instant.parse("2024-02-03T00:00:00Z"))
  }

  test("reused spoolDir: a run ingests only its own pages, so a stale " +
      "page from an earlier run cannot tie with the store's newer copy") {
    val dir = Files.createTempDirectory("graft-sync6").toString
    val spool = s"$dir/landing-reuse"
    var clock = Instant.parse("2024-03-01T00:00:00Z")
    val n1 = Sync.backfill(spark,
      clientFor(Seq(pageJson(1, "v1 text", "h1"))),
      s"$dir/store", s"$dir/ckpt", now = () => clock, spoolDir = Some(spool))
    assert(n1 == 1)
    // second run into the SAME landing zone carries an updated h1; the old
    // page-000000.json (stale h1) must NOT be restamped with this run's
    // version — that tie would make the winner nondeterministic
    clock = Instant.parse("2024-03-02T00:00:00Z")
    val n2 = Sync.incremental(spark,
      clientFor(Seq(pageJson(1, "v2 text", "h1"))),
      s"$dir/store", s"$dir/ckpt", now = () => clock, spoolDir = Some(spool))
    assert(n2.contains(1L), "second run ingests only its own single page")
    val h1 = HighlightStore.read(spark, s"$dir/store").get
      .filter(col("id") === "h1").head()
    assert(h1.getAs[String]("text") == "v2 text")
    // both runs' pages are on disk (the landing zone the stream tails)...
    val files = new java.io.File(spool).listFiles().map(_.getName)
      .filter(_.endsWith(".json")).filterNot(_.startsWith(".")).sorted
    assert(files.toSeq == Seq("page-000000.json", "page-000001.json"))
    // ...and the startafter option is what scopes a batch read to the tail
    val tail = spark.read.format("graft-export")
      .option("startafter", "page-000000.json").load(spool)
    assert(tail.count() == 1)
    assert(tail.head().getAs[String]("text") == "v2 text")
  }

  test("failed export walk does not leak an auto-created spool") {
    val dir = Files.createTempDirectory("graft-sync5").toString
    val ckpt = s"$dir/ckpt"
    val boom = new ExportClient(
      fetchPage = (_, params) => params.get("pageCursor") match {
        case None => Page(pageJson(1, "ok", "h1"), Some("c1"))
        case _ => throw new RuntimeException("transport died mid-walk")
      },
      sleep = _ => ())
    intercept[RuntimeException] {
      Sync.backfill(spark, boom, s"$dir/store", ckpt)
    }
    val leftovers = Option(new java.io.File(ckpt).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.contains("spool"))
    assert(leftovers.isEmpty, s"leaked spool dirs: $leftovers")
  }

  test("FsUtil.atomicReplace swaps an existing destination on local FS") {
    val dir = Files.createTempDirectory("graft-fsutil")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir.toString)
    val fs = root.getFileSystem(conf)
    def put(name: String, body: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root, name)
      scala.util.Using.resource(fs.create(p, true))(_.write(body.getBytes("UTF-8")))
      p
    }
    val dst = put("CURRENT", "v-old")
    val tmp = put(".CURRENT.tmp", "v-new")
    FsUtil.atomicReplace(fs, conf, tmp, dst)
    val got = scala.util.Using.resource(fs.open(dst))(in =>
      new String(in.readAllBytes(), "UTF-8"))
    assert(got == "v-new")
    assert(!fs.exists(tmp))
    // a second replace over the now-existing dst also succeeds (the case
    // Hadoop's local rename cannot do without a delete+rename window)
    val tmp2 = put(".CURRENT.tmp2", "v-newer")
    FsUtil.atomicReplace(fs, conf, tmp2, dst)
    assert(scala.util.Using.resource(fs.open(dst))(in =>
      new String(in.readAllBytes(), "UTF-8")) == "v-newer")
  }

  test("incremental without watermark or since → None (backfill required)") {
    val dir = Files.createTempDirectory("graft-sync2").toString
    val r = Sync.incremental(spark, clientFor(Seq(pageJson(1, "x", "h1"))),
      s"$dir/store", s"$dir/ckpt")
    assert(r.isEmpty)
  }
}
