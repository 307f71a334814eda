package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar-partitioned event storage — the other storage-layout lever
  * next to [[Bucketing]] (key co-location): laying the event log out as
  * `day=<epoch-day>/` directories makes every time-bounded query prune at
  * the DIRECTORY level, before any file is opened. At 100 TB of events, a
  * "last 7 days" query over a year-partitioned log touches ~2% of the
  * files; without the layout it scans everything and filters rows. The
  * reference's resume-token seek (O2) is the streaming form of the same
  * idea — skip history by position, not by reading it.
  *
  * The partition column is derived (epoch-day from the epoch-ms event
  * time), so readers filter on `day` — or use [[readRange]], which derives
  * the day bounds FROM the millisecond bounds so callers never hand-compute
  * them (off-by-one on the boundary day silently drops rows). Pruning is
  * pinned in DatePartitioningSpec via `FileSourceScanExec.partitionFilters`.
  */
object DatePartitioning {

  val DayMs = 86400000L

  /** Write `df` partitioned by the epoch-day of `tsMsCol`. Partition count
    * = calendar span, bounded and time-ordered — appends land in new day
    * dirs without touching old ones (the append-friendly layout property
    * hash bucketing lacks). */
  def writeDaily(df: DataFrame, tsMsCol: String, path: String): Unit =
    df.withColumn("day", expr(s"$tsMsCol div ${DayMs}L"))
      .write.mode("overwrite").partitionBy("day").parquet(path)

  /** Idempotent day-level backfill: replace exactly the day partitions
    * present in `df`, leaving every other day's files untouched (dynamic
    * partition overwrite). THE re-land primitive: a corrected day's data
    * re-lands atomically per dir without a full-table rewrite, and running
    * the same backfill twice converges to the same state. */
  def relandDays(df: DataFrame, tsMsCol: String, path: String): Unit =
    df.withColumn("day", expr(s"$tsMsCol div ${DayMs}L"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)

  /** Events with `tsMsCol` in `[fromMs, untilMs)`, reading only the day
    * directories that can contain them. The `day` filter prunes partitions
    * at planning time; the `tsMsCol` filter trims the boundary days'
    * rows. */
  def readRange(spark: SparkSession, path: String, tsMsCol: String,
      fromMs: Long, untilMs: Long): DataFrame =
    spark.read.parquet(path)
      .where(col("day").between(
        Math.floorDiv(fromMs, DayMs), Math.floorDiv(untilMs - 1, DayMs)))
      .where(col(tsMsCol) >= fromMs && col(tsMsCol) < untilMs)
}
