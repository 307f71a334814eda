package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** X415 — continuous temporal-integrity monitoring (streaming X412):
  * the ship-after-order contract audited AS ROWS ARRIVE — per-group
  * (priority) violation/line counts and the worst lag fold additively
  * (counts) and by MIN (worst lag) per micro-batch, so the monitor
  * holds the exact q379 census over everything ingested with
  * O(batch) + O(|groups|) work per batch. A data contract is the
  * canonical thing to watch continuously: by the time a batch audit
  * runs, the poisoned rows have already joined.
  *
  * Persistence is the [[SprtStream]] generation + pointer-flip
  * discipline; counts are additive (NOT idempotent), so the batchId
  * guard is load-bearing, while the MIN component would be idempotent
  * on its own — the guard protects the pair.
  */
object ContractStream {

  /** Current per-group (n_lines, n_violations, min_lag) state.
    * Pointer format is owned by [[GenState]] (round-8 ADVICE: one
    * owner, not three private parsers). */
  def snapshot(spark: SparkSession, statePath: String): DataFrame =
    GenState.currentGen(statePath) match {
      case Some(gen) =>
        spark.read.parquet(new java.io.File(statePath, gen).toString)
      case None =>
        import spark.implicits._
        Seq.empty[(String, Long, Long, Long)]
          .toDF("g", "n_lines", "n_violations", "min_lag_days")
    }

  private def lastBatchId(statePath: String): Long =
    GenState.lastBatchId(statePath)

  /** The q379-shaped report off a state snapshot. */
  def report(state: DataFrame): DataFrame =
    state
      .withColumn("violation_x10k", expr(
        "CASE WHEN n_lines = 0 THEN 0L ELSE (10000 * n_violations) div n_lines END"))
      .select("g", "n_lines", "n_violations", "violation_x10k", "min_lag_days")
      .orderBy("g")

  /** Maintain contract state from a STREAMING frame with `g` (group)
    * and `lag_days` (BIGINT; negative = violation) columns. */
  def maintain(
      rows: DataFrame,
      statePath: String,
      checkpoint: String): StreamingQuery = {
    require(rows.isStreaming, "maintain expects a streaming DataFrame")
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatchId(statePath) && !batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = batch.groupBy("g")
            .agg(count(lit(1)).as("n_lines"),
              sum(when(col("lag_days") < 0, 1L).otherwise(0L)).as("n_violations"),
              min("lag_days").as("min_lag_days"))
          val next = snapshot(spark, statePath).unionByName(delta)
            .groupBy("g")
            .agg(sum("n_lines").as("n_lines"),
              sum("n_violations").as("n_violations"),
              min("min_lag_days").as("min_lag_days"))
          val gen = s"gen-${System.currentTimeMillis()}-$batchId"
          next.write.mode("overwrite")
            .parquet(new java.io.File(statePath, gen).toString)
          GenState.flip(statePath, batchId, gen)
        }
        ()
      }
      .start()
  }
}
