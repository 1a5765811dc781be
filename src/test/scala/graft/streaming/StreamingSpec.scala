package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Real Structured Streaming runs (MemoryStream source → memory sink):
  * watermarked tumbling aggregation and stateful sessionization. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumblingHourlyStream: append-mode windows close as watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Events.tumblingHourlyStream(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), 1L, "view", 1.0),
        (ts("2024-01-01 10:40:00"), 2L, "view", 2.0),
        (ts("2024-01-01 11:10:00"), 1L, "click", 3.0))
      q.processAllAvailable()
      // watermark (2h) hasn't passed 10:00+1h+2h yet → nothing emitted
      assert(spark.table("hourly").count() == 0)
      // advance event time far enough to close the 10:00 and 11:00 windows
      input.addData((ts("2024-01-01 14:30:00"), 3L, "view", 4.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 18:00:00"), 3L, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .orderBy($"hour", $"event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
        Seq(("2024-01-01 10:00:00", "view", 2L),
            ("2024-01-01 11:00:00", "click", 1L),
            ("2024-01-01 14:00:00", "view", 1L)))
      assert(rows(0).getDouble(3) == 3.0) // sum_value of the 10:00 window
    } finally q.stop()
  }

  test("sessionizeStream: sessions split on gap and close on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
    val q = Events.sessionizeStream(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 50-min gap event
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L, 1.0),
        (ts("2024-01-01 09:05:00"), 1L, 2.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 09:55:00"), 1L, 4.0)) // gap 50min > 30min
      q.processAllAvailable()
      // the first session closes immediately via the in-batch gap split
      val afterGap = spark.table("sessions").as[Events.Session].collect()
      assert(afterGap.length == 1)
      assert(afterGap(0).n_events == 2 && afterGap(0).sum_value == 3.0)
      // push the watermark past 09:55 + 30min gap → open session times out
      input.addData((ts("2024-01-01 11:30:00"), 2L, 9.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 2L, 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Events.Session].collect()
        .sortBy(s => (s.user_id, s.start_us))
      assert(all.exists(s => s.user_id == 1L && s.n_events == 1 && s.sum_value == 4.0))
    } finally q.stop()
  }

  test("dedupEventsStream: re-deliveries inside the watermark collapse to one row") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Events.dedupEventsStream(events, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
        (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0), // same-batch dup
        (2L, ts("2024-01-01 10:05:00"), 2L, "click", 2.0))
      q.processAllAvailable()
      // a later batch re-delivers id 1 within the 1h horizon → still dropped
      input.addData((1L, ts("2024-01-01 10:10:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L),
        s"expected one row per id, got ${ids.toSeq}")
      // batch form agrees: same input as a batch → same surviving ids
      val batchIds = Events.dedupEvents(Seq(
          (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
          (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
          (2L, ts("2024-01-01 10:05:00"), 2L, "click", 2.0),
          (1L, ts("2024-01-01 10:10:00"), 1L, "view", 1.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select("event_id").as[Long].collect().sorted
      assert(batchIds.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("correlateStream: watermarked stream-stream join matches the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long, String)]
    val clicks = MemoryStream[(Long, Timestamp, Long, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = Events.correlateStream(
        views.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*),
        windowMinutes = 10, watermarkDelay = "20 minutes")
      .writeStream.format("memory").queryName("correlated")
      .outputMode("append").start()
    try {
      val viewRows = Seq(
        (10L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (11L, ts("2024-01-01 10:30:00"), 1L, "view"),
        (12L, ts("2024-01-01 10:00:00"), 2L, "view"))
      val clickRows = Seq(
        (20L, ts("2024-01-01 10:04:00"), 1L, "click"), // in window of 10
        (21L, ts("2024-01-01 10:31:00"), 1L, "click"), // in window of 11
        (22L, ts("2024-01-01 10:15:00"), 2L, "click"), // outside 10-min bound
        (23L, ts("2024-01-01 09:59:00"), 1L, "click")) // before the view
      views.addData(viewRows: _*)
      clicks.addData(clickRows: _*)
      q.processAllAvailable()
      // push both watermarks far past every bound so all matches emit
      views.addData((99L, ts("2024-01-01 12:00:00"), 9L, "view"))
      clicks.addData((98L, ts("2024-01-01 12:00:00"), 9L, "click"))
      q.processAllAvailable()
      val streamed = spark.table("correlated")
        .select("left_id", "right_id", "lag_us")
        .as[(Long, Long, Long)].collect().sorted
      val batch = Events.correlate(
          (viewRows :+ ((99L, ts("2024-01-01 12:00:00"), 9L, "view"))).toDF(cols: _*),
          (clickRows :+ ((98L, ts("2024-01-01 12:00:00"), 9L, "click"))).toDF(cols: _*),
          windowMinutes = 10)
        .select("left_id", "right_id", "lag_us")
        .as[(Long, Long, Long)].collect().sorted
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
        s"stream $streamed vs batch $batch")
      // and the expected attribution pairs, explicitly
      assert(streamed.map(r => (r._1, r._2)).toSeq ==
        Seq((10L, 20L), (11L, 21L), (99L, 98L)))
    } finally q.stop()
  }

  test("slidingHourBy30mStream: each event lands in two windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Events.slidingHourBy30mStream(events)
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 10:40:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 15:00:00"), 2L, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      val wins = spark.table("sliding").orderBy($"win_start")
        .collect().map(r => (r.getString(0), r.getLong(2)))
      // the 10:40 event belongs to the 10:00 and 10:30 sliding windows
      assert(wins.take(2).toSeq ==
        Seq(("2024-01-01 10:00:00", 1L), ("2024-01-01 10:30:00", 1L)))
      // and matches the batch form on the same data
      val batch = Events.slidingHourBy30m(
        Seq((ts("2024-01-01 10:40:00"), 1L, "view", 1.0))
          .toDF("ts", "user_id", "event_type", "value"))
        .orderBy($"win_start").collect().map(r => (r.getString(0), r.getLong(2)))
      assert(batch.toSeq == wins.take(2).toSeq)
    } finally q.stop()
  }

  test("upsert tie-break: same version → the update beats the existing row") {
    val base = Seq(("k1", "old", 5L)).toDF("id", "text", "version")
    val upd = Seq(("k1", "new", 5L)).toDF("id", "text", "version")
    val r = graft.ingest.Ingest.upsert(base, upd, "id", "version").collect()
    assert(r.length == 1 && r(0).getString(1) == "new")
  }

  test("streaming ingest: foreachBatch upsert keeps newest-wins store (ST1)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString
    val input = MemoryStream[(String, String, Long)]
    val updates = input.toDF().toDF("id", "text", "version")
    val q = updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = graft.sync.HighlightStore.read(spark, s"$dir/store") match {
          case Some(existing) =>
            graft.ingest.Ingest.upsert(existing, batch, "id", "version")
          case None => batch
        }
        graft.sync.HighlightStore.writeAtomic(merged, s"$dir/store")
      }
      .start()
    try {
      input.addData(("h1", "one", 1L), ("h2", "two", 1L))
      q.processAllAvailable()
      input.addData(("h1", "one-v2", 2L), ("h3", "three", 2L))
      q.processAllAvailable()
      val store = graft.sync.HighlightStore.read(spark, s"$dir/store").get
      assert(store.count() == 3)
      assert(store.filter($"id" === "h1").head().getAs[String]("text") == "one-v2")
    } finally q.stop()
  }

  test("hllRegisters over a stream: complete-mode registers equal the batch sketch") {
    // the HLL register aggregation is a monotone MAX — it runs unchanged
    // on a stream with state bounded at groups × m rows, no watermark,
    // and the streamed result must equal the batch sketch of the union
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = graft.text.TextAnalysis
      .hllRegisters(input.toDF().toDF("source", "text"), "text", "source",
        k = 3, p = 6)
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    val rows = (0 until 300).map { i =>
      (s"s${i % 2}", s"body ${(i * 2654435761L) % 999983} mid ${i * 37} tail $i")
    }
    try {
      input.addData(rows.take(100): _*)
      q.processAllAvailable()
      input.addData(rows.slice(100, 200): _*)
      q.processAllAvailable()
      input.addData(rows.drop(200): _*)
      q.processAllAvailable()
      val streamed = spark.table("hllregs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val batch = graft.text.TextAnalysis
        .hllRegisters(rows.toDF("source", "text"), "text", "source", 3, 6)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == batch)
      assert(streamed.size <= 2 * 64)
    } finally q.stop()
  }
}
