package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment — the layout step a
  * training-data pipeline runs LAST: examples must reach the trainer in a
  * reproducible pseudo-random order, split into a fixed number of shard
  * files, independent of which cluster / how many tasks produced them.
  *
  * The shuffle key is `md5(seed ":" id)` — the same cross-engine-exact
  * construction as [[Relational]]'s hash sampling (md5 is the engine's one
  * cross-engine hash; seed-switchable so epochs reshuffle). Position in the
  * shuffled order comes from [[Relational.globalIndex]] (two-phase global
  * row number — range shuffle + broadcast prefix offsets, NEVER a
  * single-partition window), and the shard id is a pure scalar on the key,
  * so the whole operator is one range shuffle at any corpus size. Writing
  * the result partitioned by `shard` then gives the trainer its files.
  */
object Sharding {

  /** Reproducible pseudo-random sort key for `id` under `seed`. */
  def shuffleKey(idCol: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), idCol.cast("string")))

  /** Shard id in [0, nShards) from the key's first 8 hex chars — uniform,
    * derived from the SAME key as the order so one scan computes both. */
  def shardId(keyCol: Column, nShards: Int): Column =
    pmod(conv(substring(keyCol, 1, 8), 16, 10).cast("long"), lit(nShards.toLong))

  /** `df` + (`shuffle_key`, `shard`, `posCol`): the deterministic shuffled
    * order (1-based dense position) and shard assignment. `idCol` must be
    * unique (it makes the md5 key a total order — globalIndex's contract). */
  def deterministicShuffle(
      df: DataFrame,
      idCol: Column,
      seed: String,
      nShards: Int,
      posCol: String = "global_pos"): DataFrame = {
    val keyed = df
      .withColumn("shuffle_key", shuffleKey(idCol, seed))
      .withColumn("shard", shardId(col("shuffle_key"), nShards))
    Relational.globalIndex(keyed, Seq(col("shuffle_key")), posCol)
  }
}
