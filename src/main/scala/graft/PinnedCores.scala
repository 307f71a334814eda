package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The session-pinned shared cores, enumerated for explicit prewarming.
  *
  * Bench (round-7 VERDICT item): without prewarming, each pinned core's
  * one-time build cost lands on whichever consumer query happens to run
  * first in a pass, so per-query numbers for core-sharing families
  * (q114/q196/the q91 graph family) are not attributable and a
  * regression in the CORE itself hides inside an arbitrary consumer.
  * [[prewarm]] forces each core with its own timed action, in
  * dependency order, so each entry's seconds are its MARGINAL build
  * cost (dependencies are already memoized) and consumer queries time
  * pure consumption.
  *
  * This is also the production shape: at corpus scale these cores are
  * staged tables materialized once per corpus snapshot, not artifacts
  * rebuilt inside whichever query runs first.
  */
object PinnedCores {

  /** (name, force) per core, in dependency order — `force` builds the
    * core (memoized) and runs a counting action to materialize the
    * pinned cache. */
  private def builders(
      spark: SparkSession, dir: String): Seq[(String, () => Long)] = {
    import graft.queries.{DataPrepQueries, OlapQueries, TrainPrepQueries}
    val n = DataPrepQueries.ShingleN
    Seq(
      "shingles" ->
        (() => graft.ops.Dedup.pinnedShingles(spark, dir, n).count()),
      "set_sizes" ->
        (() => graft.ops.Dedup.pinnedSetSizes(spark, dir, n).count()),
      "pair_intersections" ->
        (() => graft.ops.Dedup.pinnedIntersections(
          spark, dir, n, DataPrepQueries.JaccardMaxDf)._1.count()),
      "knn_graph" ->
        (() => OlapQueries.knnGraphPinned(spark, dir).count()),
      "knn_undirected" ->
        (() => OlapQueries.knnUndirectedPinned(spark, dir).count()),
      "classifier_scores" ->
        (() => TrainPrepQueries.classifierScores(spark, dir).count()),
      "bpe_segmentations" ->
        (() => TrainPrepQueries.bpeSegmentationsPinned(spark, dir).count()),
      "bm25_docs" ->
        (() => graft.queries.SearchQueries.bm25Docs(spark, dir).count()),
      "bm25_scored" ->
        (() => graft.queries.SearchQueries.bm25Scored(spark, dir).count()),
      "block_candidates" ->
        (() => graft.queries.LinkageQueries.blockingCandidates(spark, dir).count()),
      "lsh_pairs" ->
        (() => DataPrepQueries.lshPairsPinned(spark, dir).count()),
      "simhash_pairs" ->
        (() => DataPrepQueries.simhashPairsPinned(spark, dir).count()))
  }

  /** Build + materialize every pinned core for (spark, dir), returning
    * each core's marginal build seconds in dependency order. Idempotent
    * within a session (memo hits re-count the cached table — fast). */
  def prewarm(spark: SparkSession, dir: String): Seq[(String, Double)] =
    builders(spark, dir).map { case (name, force) =>
      val t0 = System.nanoTime()
      force()
      name -> (System.nanoTime() - t0) / 1e9
    }
}
