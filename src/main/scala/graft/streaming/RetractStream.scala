package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** X188 — retraction-aware aggregate maintenance: keyed counts that go
  * DOWN. The CDC wire formats carry deletes (Debezium `op: d` —
  * [[graft.cdc.CdcDecode.fromDebeziumEnvelope]] decodes them; the
  * reference's own stream only ever upserts), and a maintained aggregate
  * over a log WITH deletes must fold each change as a SIGNED delta:
  * +1 per create, −1 per delete, net per key — the retract-stream model
  * (Flink's retraction semantics) on the foreachBatch maintenance path.
  *
  * Per batch: the arriving changes partial-aggregate to per-key deltas
  * (map-side — O(batch)), merge into the stored totals by addition, and
  * keys whose net count returns to ZERO are REMOVED from the store —
  * state is bounded by live keys, not by keys-ever-seen (a delete-heavy
  * workload would otherwise grow the store forever). Deletes arriving
  * before their insert (cross-batch reordering) leave a negative
  * intermediate that converges once the insert lands — the merge is
  * commutative, so any batch split of the same change set folds to the
  * same totals (spec-pinned).
  *
  * Persistence: generation-per-batch + atomic pointer flip with a
  * batchId re-delivery guard ([[ComponentStream]] discipline — addition
  * is not idempotent, the guard is load-bearing).
  */
object RetractStream {

  private val Pointer = "_CURRENT"

  /** Current per-key net counts (empty, correctly-shaped if none). */
  def totals(spark: SparkSession, statePath: String): DataFrame = {
    val ptr = new java.io.File(statePath, Pointer)
    if (ptr.exists()) {
      val gen = java.nio.file.Files.readString(ptr.toPath).trim.split(':')(1)
      spark.read.parquet(new java.io.File(statePath, gen).toString)
    } else {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("k", "net")
    }
  }

  private def lastBatchId(statePath: String): Long = {
    val ptr = new java.io.File(statePath, Pointer)
    if (ptr.exists()) java.nio.file.Files.readString(ptr.toPath).trim.split(':')(0).toLong
    else -1L
  }

  /** Maintain net counts from a STREAMING frame of changes with columns
    * `opCol` ('c' creates, 'd' deletes — other ops ignored) and `keyCol`. */
  def maintain(
      changes: DataFrame,
      statePath: String,
      checkpoint: String,
      opCol: String = "op",
      keyCol: String = "k"): StreamingQuery = {
    require(changes.isStreaming, "maintain expects a streaming DataFrame")
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatchId(statePath) && !batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = batch
            .filter(col(opCol).isin("c", "d"))
            .groupBy(col(keyCol).cast("string").as("k"))
            .agg(sum(when(col(opCol) === "c", 1L).otherwise(-1L)).as("net"))
          val next = totals(spark, statePath).unionByName(delta)
            .groupBy("k").agg(sum("net").cast("long").as("net"))
            .filter(col("net") =!= 0L)
          val gen = s"gen-${System.currentTimeMillis()}-$batchId"
          next.write.mode("overwrite")
            .parquet(new java.io.File(statePath, gen).toString)
          // atomic pointer flip + superseded-generation sweep (GenState)
          GenState.flip(statePath, batchId, gen)
        }
        ()
      }
      .start()
  }
}
