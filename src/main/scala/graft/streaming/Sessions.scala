package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-window aggregation over the events log — the streaming-native
  * form of gap sessionization ([[graft.ops.Relational.sessionize]] is the
  * per-event batch labeling; this is the per-session AGGREGATE, and it runs
  * the same expression in batch and streaming via `session_window`).
  *
  * Session semantics (Spark's, spec-pinned): an event at exactly the gap
  * boundary still MERGES — a new session starts only when diff > gap,
  * the same contract as q29's `sessionize`. `session_end_ms` is last
  * event time + gap, Spark's window.end.
  *
  * Scale: ONE shuffle on user_id; streaming state is one row per OPEN
  * session bounded by the watermark horizon; merging of out-of-order
  * events into/between sessions is handled by the session-window state
  * store machinery (sessions can merge when a late bridging event
  * arrives — exactly the case the batch twin + convergence spec pin).
  */
object Sessions {

  val DefaultGap = "30 minutes"

  /** Per-user session aggregate: (user_id, session_start_ms,
    * session_end_ms, n_events). Input needs (user_id, ts_ms). */
  def sessionStats(
      events: DataFrame,
      gap: String = DefaultGap,
      delay: String = "30 days"): DataFrame =
    events
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", delay)
      .groupBy(col("user_id"), session_window(col("eventTime"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"))
}
