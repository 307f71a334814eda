package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational count–min sketch core (X172) — shared by the batch query
  * (q162, [[graft.queries.SketchQueries]]) and the continuous maintainer
  * ([[graft.streaming.SketchStream]], X184).
  *
  * The sketch is a plain (r, bucket) → count table of `depth`·`width`
  * rows: every token occurrence increments one cell per hash row
  * (bucket = md5("r:token") — the house md5-derived hash, so a DuckDB
  * oracle replays it bit-for-bit), and a token's frequency estimate is
  * the MIN of its `depth` cells. Cells partial-aggregate map-side and
  * two sketches union by per-cell ADDITION — the mergeability that makes
  * the sketch a streaming/cross-corpus artifact: fold any split of the
  * corpus in any order, same table.
  */
object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 256L

  /** The (r, bucket) cell a token hashes into on hash row `r`. */
  def bucketOf(token: Column, r: Column, width: Long): Column =
    pmod(conv(substring(md5(concat_ws(":", r, token)), 1, 4), 16, 10)
      .cast("long"), lit(width))

  /** Sketch cells of a token bag (`tokenCol` one occurrence per row). */
  def cells(toks: DataFrame, tokenCol: String = "token",
      depth: Int = DefaultDepth, width: Long = DefaultWidth): DataFrame =
    toks
      .select(col(tokenCol).as("token"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("bucket", bucketOf(col("token"), col("r"), width))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).cast("long").as("cell"))

  /** Merge two sketches of the SAME geometry (per-cell addition). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket")
      .agg(sum("cell").cast("long").as("cell"))

  /** Frequency estimates for `probes` (a frame with a `token` column —
    * extra columns pass through): min over the `depth` cells. Tokens
    * hashing into never-written cells estimate 0 via the left join. */
  def estimate(cellsDf: DataFrame, probes: DataFrame,
      depth: Int = DefaultDepth, width: Long = DefaultWidth): DataFrame = {
    val keyed = probes
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", bucketOf(col("token"), col("r"), width))
      .join(broadcast(cellsDf), Seq("r", "bucket"), "left")
      .withColumn("cell", coalesce(col("cell"), lit(0L)))
    keyed.groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min("cell").cast("long").as("est"))
  }
}
