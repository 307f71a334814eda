package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ingest into a persisted IVF index
  * ([[graft.ops.AnnIndex]]): each micro-batch of embedding rows is
  * assigned against the index's FROZEN centroids and appended into its
  * inverted-list partitions — the streaming half of the
  * build-once/append-forever lifecycle a production vector corpus runs
  * (periodic [[graft.ops.AnnIndex.build]] rebuilds absorb quantizer
  * drift; queries see new vectors as soon as their batch commits).
  *
  * Exactly-once: foreachBatch is AT-LEAST-ONCE under crash/retry — a
  * batch can be re-delivered after its append already hit the lists — so
  * the append runs in idempotent mode: ids already present in the bucket
  * partitions the batch touches are anti-joined away first (a
  * partition-pruned read of just those lists, never the whole index).
  * Re-delivery therefore converges to exactly-once OUTPUT.
  *
  * Scale shape per batch: one broadcast pass over the batch (centroids
  * are tiny), one argmax shuffle of batch rows, one pruned read of the
  * touched lists, one partitioned append. The index itself is never
  * rewritten.
  */
object AnnIndexStream {

  /** Start the ingest: `embeddings` must be a STREAMING DataFrame with
    * (`idCol`, `vecCol`) columns; the index at `path` must already be
    * built (the centroids are read per batch so a rebuild between
    * batches is picked up without restart). */
  def ingest(
      embeddings: DataFrame,
      path: String,
      checkpoint: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery = {
    require(embeddings.isStreaming, "ingest expects a streaming DataFrame")
    embeddings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.ops.AnnIndex.append(batch, path, idCol, vecCol, dedupe = true)
      }
      .start()
  }
}
