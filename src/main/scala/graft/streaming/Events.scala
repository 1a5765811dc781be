package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators over the `events` table (ts, user_id, event_type,
  * value). Batch and Structured-Streaming forms share the same column
  * logic; the streaming form adds watermarking. (The reference streams
  * results but has no windowed aggregation — SURVEY.md §2.8; this is the
  * 100-TB extension surface.)
  */
object Events {

  /** Tumbling window aggregate, batch form. Hour-truncation keyed — one
    * partial-aggregated shuffle. Output window as formatted string for
    * timezone-free comparison. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("min_value"), col("max_value"))

  /** Tumbling window aggregate, Structured Streaming form (append mode with
    * a watermark for state eviction). */
  def tumblingHourlyStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** At-least-once delivery dedup, batch form: one row per event_id with a
    * deterministic winner — earliest ts, then EVERY remaining orderable
    * column in name order, so the order is total over whatever schema the
    * caller passes (re-deliveries are byte-identical in practice, but two
    * same-id rows differing only in a column outside a fixed sort list
    * would otherwise pick an arbitrary winner). Non-orderable columns
    * (maps) ride along unsorted-on and cannot be tie-broken — callers
    * with such columns and non-identical re-deliveries should project
    * first. One hash shuffle on the id. */
  def dedupEvents(events: DataFrame): DataFrame = {
    val orderable = events.schema.fields
      .filter(f => f.name != "event_id" &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType))
      .map(_.name)
    val rest = orderable.filter(_ != "ts").sorted.map(col(_).asc)
    val ord0 = if (orderable.contains("ts")) col("ts").asc +: rest else rest
    // row_number requires an ordering; with nothing orderable beyond the
    // id the rows are indistinguishable anyway — order by the id itself
    val ord = if (ord0.isEmpty) Seq(col("event_id").asc) else ord0.toSeq
    val w = Window.partitionBy(col("event_id")).orderBy(ord: _*)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** At-least-once delivery dedup, Structured Streaming form:
    * `dropDuplicatesWithinWatermark` keys state on event_id and evicts it
    * once the watermark passes the id's first-seen event time, so state is
    * O(ids inside the horizon) — not O(all ids ever) as with plain
    * `dropDuplicates` — while still collapsing every re-delivery that
    * lands within the delay. This is the exactly-once input adapter the
    * rest of the streaming surface (windows, sessions, ingest upsert)
    * composes with. */
  def dedupEventsStream(events: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user action→response correlation (batch form): every `right`
    * event of the same user whose timestamp lands in
    * `[left.ts, left.ts + windowMinutes)` pairs with the `left` event —
    * attribution / funnel analysis (view→click, impression→conversion).
    * An equi-join on user_id with a residual time predicate: ONE shuffle
    * per side, no range explosion. Expects (event_id, ts, user_id,
    * event_type) on both inputs. */
  def correlate(left: DataFrame, right: DataFrame,
      windowMinutes: Int): DataFrame =
    correlateJoin(correlateLeft(left), correlateRight(right), windowMinutes)

  private def correlateLeft(df: DataFrame): DataFrame =
    df.select(col("user_id"), col("event_id").as("left_id"),
      col("event_type").as("left_type"), col("ts").as("left_ts"))

  private def correlateRight(df: DataFrame): DataFrame =
    df.select(col("user_id").as("__ru"), col("event_id").as("right_id"),
      col("event_type").as("right_type"), col("ts").as("right_ts"))

  /** Shared join+projection body of [[correlate]]/[[correlateStream]] —
    * the batch/stream parity StreamingSpec asserts holds BECAUSE both
    * variants run this exact plan (they differ only in watermarks). */
  private def correlateJoin(l: DataFrame, r: DataFrame,
      windowMinutes: Int): DataFrame = {
    val bound = expr(s"INTERVAL $windowMinutes MINUTES")
    l.join(r, col("user_id") === col("__ru") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") < col("left_ts") + bound)
      .select(col("user_id"), col("left_id"), col("left_type"),
        col("right_id"), col("right_type"),
        (unix_micros(col("right_ts")) - unix_micros(col("left_ts")))
          .as("lag_us"))
  }

  /** [[correlate]], Structured Streaming form — a WATERMARKED
    * stream-stream join: both sides declare event-time watermarks and the
    * join carries the time-bound condition, so Spark buffers each side's
    * state only until the other side's watermark proves no further match
    * can arrive (state is O(events inside the horizon), evicted as event
    * time advances — an unbounded stream-stream join without the bound
    * would require infinite state and is rejected in append mode).
    * Results are identical to the batch form over the same data once the
    * watermark closes (StreamingSpec asserts agreement). */
  def correlateStream(left: DataFrame, right: DataFrame,
      windowMinutes: Int, watermarkDelay: String = "1 hour"): DataFrame =
    correlateJoin(
      correlateLeft(left).withWatermark("left_ts", watermarkDelay),
      correlateRight(right).withWatermark("right_ts", watermarkDelay),
      windowMinutes)

  /** Gap-based sessionization (batch form): a new session starts when the
    * user's inter-event gap exceeds `gapMinutes`. Two window passes over
    * the same (user_id, ts) partitioning — one shuffle total.
    *
    * Gaps are computed on whole microsecond longs so the oracle (epoch_us)
    * is bit-exact. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val us = unix_micros(col("ts"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(us.asc, col("event_id").asc)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("__us", us)
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(byUser) > gapUs ||
          lag(col("__us"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** One event on the stream-facing schema. `ts` stays a TimestampType so
    * the upstream watermark survives into the stateful operator. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Open-session state kept per user between micro-batches. */
  final case class SessionState(startUs: Long, endUs: Long, n: Long, sum: Double)

  /** One closed session. */
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization, Structured-Streaming form: custom per-key
    * state via `flatMapGroupsWithState` with an *event-time* timeout —
    * a session closes either when a later event for the same user exceeds
    * the gap, or when the watermark passes end + gap (no more on-time
    * events can extend it). The batch form above answers the same question
    * over historical data; this is the operator a live event firehose needs:
    * state is per-user-tiny, partitioned by the group key, and evicted on
    * timeout.
    *
    * Input must carry a watermarked TimestampType `ts` plus user_id/value.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts"), col("value").cast("double").as("value"))
      .as[Ev]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startUs, s.endUs, s.n, s.sum))
          } else {
            val sorted = it.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(s) if us - s.endUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, math.max(s.endUs, us),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(user, s.startUs, s.endUs, s.n, s.sum)
                  cur = Some(SessionState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close once the watermark passes the last event + gap
              state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Sliding-window counts, Structured-Streaming form: the built-in
    * `window(ts, "1 hour", "30 minutes")` generator with a watermark —
    * append mode emits each window once the watermark passes its end. */
  def slidingHourBy30mStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Sliding-window counts (batch form): 1-hour windows sliding by 30
    * minutes. Each event lands in exactly 2 windows — generated with a
    * 2-element explode, then one aggregation shuffle. */
  def slidingHourBy30m(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val slideUs = 30L * 60L * 1000000L
    val winUs = 2L * slideUs
    // latest slide boundary ≤ ts, and the one before it (exact long math)
    val base = us - pmod(us, lit(slideUs))
    events
      .withColumn("win_start_us", explode(array(base, base - slideUs)))
      .groupBy(col("win_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(timestamp_micros(col("win_start_us")), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"),
        col("event_type"), col("n_events"))
  }
}
