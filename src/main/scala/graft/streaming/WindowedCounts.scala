package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over the events log — the
  * standard Structured-Streaming windowed-agg machinery (`withWatermark` +
  * `window()` groupBy) the reference has no equivalent of (SURVEY §2.2:
  * "no watermark/session-window machinery"), shipped because event-log
  * analytics needs it.
  *
  * The SAME expression runs batch and streaming (watermark is a no-op in
  * batch): q32 verifies the semantics against a DuckDB oracle, and
  * `WindowedCountsSpec` proves the streaming execution converges to the
  * batch result over micro-batches.
  *
  * Scale notes: a tumbling window groupBy is ONE shuffle on
  * (user_id, window) with partial aggregation; streaming state is one row
  * per open (key, window) and the watermark both bounds that state and
  * admits late data up to `delay` — state size is O(keys × windows inside
  * the lateness horizon), independent of stream length.
  */
object WindowedCounts {

  /** Per-user tumbling-window counts and purchase totals.
    * Input needs (user_id, ts_ms, event_type, value_c). */
  def tumbling(
      events: DataFrame,
      windowDur: String = "1 hour",
      delay: String = "30 days"): DataFrame =
    events
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", delay)
      .groupBy(col("user_id"), window(col("eventTime"), windowDur).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", col("value_c")).otherwise(lit(0L)))
          .as("purchase_c"))
      .select(
        col("user_id"),
        (col("w.start").cast("long") * 1000).as("window_start_ms"),
        col("n_events"),
        col("purchase_c"))

  /** Hopping (sliding) windows — q79's expression with a watermark: each
    * event fans out map-side to window/slide assignments, then ONE
    * partial-aggregated shuffle on (window, type). Streaming state is one
    * row per open (window, type) inside the lateness horizon — the fan-out
    * multiplies state by window/slide, not by stream length. */
  def hopping(
      events: DataFrame,
      windowDur: String = "6 hours",
      slide: String = "3 hours",
      delay: String = "30 days"): DataFrame =
    events
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", delay)
      .groupBy(window(col("eventTime"), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value_c").as("sum_value_c"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value_c"))
}
