package graft.streaming

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension refresh for streaming enrichment.
  *
  * A plain stream-static join resolves the static side's file listing when
  * the query STARTS — a dimension overwritten mid-stream keeps enriching
  * with stale rows until restart. The production pattern is per-batch
  * re-resolution inside `foreachBatch`: every micro-batch joins against
  * the dimension as it exists NOW. This helper makes that cheap: the
  * directory is re-LISTED per batch (an O(files) metadata call), but the
  * DataFrame is re-BUILT only when the listing signature (file count +
  * max mtime + total bytes) actually changed.
  *
  * Scale shape: the dimension is broadcast into the batch join — the
  * stream side never shuffles for the enrichment; a dimension too big to
  * broadcast belongs in [[graft.sources.Bucketing]] co-location instead.
  */
class DimRefresh(spark: SparkSession, dimPath: String) extends Serializable {

  @transient private var sig: Option[(Long, Long, Long)] = None
  @transient private var cached: Option[DataFrame] = None
  @transient private var reloadCount: Long = 0L

  private def fs: FileSystem =
    FileSystem.get(new URI(dimPath), spark.sparkContext.hadoopConfiguration)

  private def dirSig(): (Long, Long, Long) = {
    val stats = fs.listStatus(new Path(dimPath)).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
    (stats.length.toLong, stats.map(_.getModificationTime).maxOption.getOrElse(0L),
      stats.map(_.getLen).sum)
  }

  /** The dimension as of NOW — reloaded only if the directory changed
    * since the last call. Driver-side (call from foreachBatch). */
  def current(): DataFrame = synchronized {
    val s = dirSig()
    if (!sig.contains(s)) {
      cached = Some(spark.read.parquet(dimPath))
      sig = Some(s)
      reloadCount += 1
    }
    cached.get
  }

  /** How many times the dimension was actually re-read (monitoring and
    * spec hook: listing per batch, reload per CHANGE). */
  def reloads: Long = synchronized(reloadCount)
}

object DimRefresh {

  /** The per-batch enrichment: broadcast left join of the batch against
    * the current dimension rows on `key`. */
  def enriched(batch: DataFrame, dim: DataFrame, key: String): DataFrame =
    batch.join(broadcast(dim), Seq(key), "left")
}
