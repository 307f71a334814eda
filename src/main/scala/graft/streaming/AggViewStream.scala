package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a per-key AGGREGATE view — the reference's
  * materialized-view pattern (keep a view current as events arrive)
  * generalized from "latest state per key" ([[CdcStream]]) to MERGEABLE
  * aggregates: each micro-batch first reduces to ONE partial row per key
  * (map-side combine does most of the work before the shuffle), and the
  * partial merges into the stored totals key-by-key through the bucketed
  * [[ViewStore]]. The event history is never re-read — per-batch cost is
  * O(batch + touched buckets), independent of stream age, which is what
  * keeps a year-old 100 TB event log maintainable.
  *
  * Merge algebra: (count, sum, max) — commutative + associative, so batch
  * boundaries and arrival order don't change the fixpoint (spec-proven).
  * Replay idempotence comes from the ViewStore batchId marker: additive
  * partials are exactly the state a naive re-merge would double-count
  * (ADVICE r1 on the events view — same fix, now for aggregates).
  */
object AggViewStream {

  case class UserTotals(user_id: Long, n_events: Long, purchase_c: Long, last_ts_ms: Long)

  /** One partial row per key for a micro-batch.
    * Input needs (user_id, event_type, value_c, ts_ms). */
  def partials(batch: DataFrame): Dataset[UserTotals] = {
    import batch.sparkSession.implicits._
    batch.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", col("value_c")).otherwise(lit(0L)))
          .as("purchase_c"),
        max(col("ts_ms")).as("last_ts_ms"))
      .as[UserTotals]
  }

  /** foreachBatch body: fold the batch's partials into the stored view.
    * Skips replayed batchIds; only buckets containing batch keys are
    * read/rewritten. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, viewPath: String, batchId: Long): Unit = {
    import spark.implicits._
    if (ViewStore.alreadyApplied(spark, viewPath, batchId)) return
    val part = partials(batch)
    val touched = part.toDF()
      .select(ViewStore.bucketOf(col("user_id")).as("b")).distinct()
      .collect().map(_.getLong(0).toInt).toSeq.sorted
    val existing: Dataset[UserTotals] =
      ViewStore.readBuckets(spark, viewPath, touched)
        .map(_.as[UserTotals])
        .getOrElse(spark.emptyDataset[UserTotals])
    val merged = existing.groupByKey(_.user_id).cogroup(part.groupByKey(_.user_id)) {
      (k, olds, news) =>
        val merged = (olds ++ news).reduceOption { (a, b) =>
          UserTotals(k, a.n_events + b.n_events, a.purchase_c + b.purchase_c,
            math.max(a.last_ts_ms, b.last_ts_ms))
        }
        merged.iterator
    }
    ViewStore.commit(spark, viewPath,
      merged.toDF().withColumn("__bucket", ViewStore.bucketOf(col("user_id"))),
      touched, batchId)
  }
}
