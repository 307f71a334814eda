package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous windowed anomaly detection — the streaming twin of q72's
  * integer σ-test.
  *
  * Shape: [[WindowedCounts.tumbling]] in APPEND mode emits a window's
  * per-user counts exactly once, when the watermark passes the window end
  * — so every row of a given window arrives in the SAME micro-batch, and
  * the per-window statistics are complete inside `foreachBatch` with NO
  * extra streaming state. [[flagBatch]] then applies the exact integer
  * mean + 2σ test (`cn − S > 0 ∧ (cn − S)² > 4(n·Σc² − S²)`) — bit-equal
  * to the batch query, which AnomalyStreamSpec pins over shuffled
  * micro-batch delivery.
  *
  * This is the general pattern for "per-completed-window analytics that
  * need the whole window": let the watermark close the window in the
  * stateful aggregation, do the cross-key math statelessly per batch.
  */
object AnomalyStream {

  /** Per-closed-window anomaly flags from an APPEND-mode counts batch
    * (cols: `user_id`, `window_start_ms`, `n_events`). Pure batch logic —
    * call inside foreachBatch. */
  def flagBatch(counts: DataFrame): DataFrame = {
    val stats = counts.groupBy("window_start_ms").agg(
      count(lit(1)).as("n"), sum("n_events").as("s"),
      sum(col("n_events") * col("n_events")).as("s2"))
    counts.join(broadcast(stats), "window_start_ms")
      .withColumn("__d", col("n_events") * col("n") - col("s"))
      .where(col("__d") > 0 &&
        col("__d") * col("__d") > lit(4L) * (col("n") * col("s2") - col("s") * col("s")))
      .select(col("window_start_ms"), col("user_id"), col("n_events"),
        col("n").as("n_active_users"))
  }
}
