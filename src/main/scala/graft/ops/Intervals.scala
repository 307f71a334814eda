package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-table operators over a keyed event log: the batch analytics a
  * team runs NEXT to a CDC view maintainer (reference semantics: the view
  * is "current status per transaction", reference
  * `TransactionViewUpsertService.kt:60-124` — these operators answer "what
  * was the status WHEN", i.e. the history the reference's view discards).
  *
  * Both operators are one hash shuffle on the entity key; every window is
  * partitioned by the key (or key+day), so no task ever sees more than one
  * entity's history — the shape that survives any corpus size.
  */
object Intervals {

  /** SCD Type-2 run-collapse: the keyed event log folded into
    * (key, status, valid_from, valid_to, version) intervals — one row per
    * CHANGE of `attr`, consecutive duplicates collapsed, the last interval
    * open-ended (`valid_to` = `openEnd` sentinel, -1 by default, so the
    * result stays null-free for hashing).
    *
    * Ties on `ts` are sequenced by `tie` (same contract as the funnel and
    * gap analytics: deterministic total order per key). Two window passes
    * share ONE shuffle: both windows are partitioned by `key`, and the
    * change-filter preserves partitioning, so the second sort is
    * partition-local.
    */
  def scd2(
      df: DataFrame,
      key: String,
      ts: String,
      tie: String,
      attr: String,
      openEnd: Long = -1L): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tie))
    val changes = df
      .select(col(key), col(ts), col(tie), col(attr))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .drop("__prev")
    changes
      .withColumn("valid_to", coalesce(lead(col(ts), 1).over(w), lit(openEnd)))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(key), col(attr).as("status"),
        col(ts).as("valid_from"), col("valid_to"), col("version"))
  }

  /** Last-observation-carried-forward daily fill: per key, a dense daily
    * grid from the key's first to last observed day, each day carrying the
    * LAST observed `attr` on-or-before it (the classic gap-fill / as-of
    * snapshot series).
    *
    *   1. last observation per (key, day): `row_number` + count windows
    *      over (key, day) — one shuffle, the tie order (ts desc, tie desc)
    *      picks the day's final event deterministically;
    *   2. per-key span → `sequence()` explode builds the grid (fan-out
    *      bounded by the calendar span, not the event count);
    *   3. forward fill: `last(ignoreNulls)` window partitioned by key —
    *      each window group is one key's days, never the whole table.
    *
    * The first grid day is always observed (the span starts at an
    * observation), so `attr_filled` is never null.
    */
  def locfDailyFill(
      events: DataFrame,
      key: String,
      tsMs: String,
      tie: String,
      attr: String,
      dayMs: Long): DataFrame = {
    val ev = events
      .select(col(key), col(tsMs), col(tie), col(attr))
      .withColumn("__day", expr(s"$tsMs div ${dayMs}L"))
    val wd = Window.partitionBy(col(key), col("__day"))
      .orderBy(col(tsMs).desc, col(tie).desc)
    val daily = ev
      .withColumn("__rn", row_number().over(wd))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(key), col("__day"))))
      .filter(col("__rn") === 1)
      .select(col(key), col("__day"), col(attr).as("__day_last"),
        col("__n").as("__n_events"))
    val grid = ev.groupBy(key)
      .agg(min("__day").as("__d0"), max("__day").as("__d1"))
      .select(col(key), explode(sequence(col("__d0"), col("__d1"))).as("__day"))
    val wf = Window.partitionBy(key).orderBy("__day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(key, "__day"), "left")
      .withColumn("__filled", last(col("__day_last"), ignoreNulls = true).over(wf))
      .select(col(key),
        (col("__day") * lit(dayMs)).as("day_ms"),
        col("__filled").as(s"${attr}_filled"),
        coalesce(col("__n_events"), lit(0L)).as("n_events"),
        col("__day_last").isNotNull.cast("long").as("observed"))
  }
}
