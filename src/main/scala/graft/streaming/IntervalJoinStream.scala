package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join: the continuous form of
  * [[graft.ops.Relational.binnedRangeJoin]] (q60's "follow-on activity
  * within 1h of each signup"), as a watermarked Structured Streaming
  * stream-stream inner join.
  *
  * Where the batch form buckets time to turn the inequality into an
  * equi-join, the streaming form states the raw time-range predicate and
  * lets Spark's stream-stream join derive the state bound from it: with
  * both sides watermarked and the join condition constraining
  * `follow.time` to `[signup.time, signup.time + window)`, the state store
  * evicts a buffered signup once the follow-side watermark passes its
  * window end, and a buffered follow once the signup-side watermark passes
  * its timestamp — state is O(events inside watermark + window horizon),
  * never unbounded.
  *
  * Batch ≡ streaming: IntervalJoinStreamSpec replays the q60 input through
  * MemoryStreams in shuffled micro-batches and pins the aggregated result
  * to the batch `binnedRangeJoin` output.
  */
object IntervalJoinStream {

  /** Join `signups` (cols: `user_id`, `s_ts` epoch-ms, `s_event_id`) with
    * `follows` (cols: `user_id`, `f_ts` epoch-ms, `value_c`) on same user
    * and `f_ts` in `[s_ts, s_ts + windowMs)`. Both inputs may be streaming
    * DataFrames; event-time columns are derived from the epoch-ms values.
    *
    * `joinType = "left_outer"` additionally emits each unmatched signup
    * ONCE (null `f_ts`/`value_c`) — but only after the global watermark
    * (min of both streams) passes the signup's window end, i.e. once no
    * future follow can still match it. Until then the signup stays
    * buffered; outer results are inherently watermark-delayed.
    */
  def followOn(
      signups: DataFrame,
      follows: DataFrame,
      windowMs: Long,
      lateness: String = "10 seconds",
      joinType: String = "inner"): DataFrame = {
    val s = signups
      .withColumn("s_time", timestamp_millis(col("s_ts")))
      .withWatermark("s_time", lateness)
    val f = follows
      .withColumnRenamed("user_id", "f_user_id")
      .withColumn("f_time", timestamp_millis(col("f_ts")))
      .withWatermark("f_time", lateness)
    s.join(
      f,
      col("user_id") === col("f_user_id") &&
        col("f_time") >= col("s_time") &&
        col("f_time") < col("s_time") + expr(s"INTERVAL $windowMs MILLISECONDS"),
      joinType)
      .select("user_id", "s_event_id", "s_ts", "f_ts", "value_c")
  }
}
