package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
