package graft.ops

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for PINNED shared cores — the materialize-once
  * artifacts a bench/production session reuses across many queries (the
  * kNN graph, the shingle table, the pair-intersection core).
  *
  * Why a memo on top of [[Dedup.cachePinned]]: plan-identity cache hits
  * already dedup the WORK, but a memo returns the same DataFrame
  * instance, so every consumer's plan shares one CacheManager entry by
  * construction (no per-call "already cached" churn) and release is
  * exact.
  *
  * Lifecycle (the round-5 ADVICE leak fix): every memo instance
  * registers itself, and [[Dedup.unpersistPinned]] evicts the session's
  * entries from ALL memos when it releases the pinned tier — a later
  * call rebuilds and re-pins instead of returning an
  * unpersisted-but-memoized frame. Entries of stopped sessions are
  * purged opportunistically on every access, so a long-lived JVM
  * cycling sessions does not accumulate dead keys.
  *
  * Contract: a memoized core serves the snapshot of its inputs as of
  * the first call. If the data under a key's `dir` changes within a
  * session, call [[Dedup.unpersistPinned]] to invalidate.
  */
final class PinnedCoreMemo[K] {
  private val m = new ConcurrentHashMap[(SparkSession, K), DataFrame]()
  PinnedCoreMemo.register(this)

  /** The memoized core for (spark, key), building + pinning on first
    * call. `build` runs at most once per live (session, key). */
  def getOrBuild(spark: SparkSession, key: K)(build: => DataFrame): DataFrame = {
    m.keySet.removeIf(k => k._1.sparkContext.isStopped)
    // cachePinned, NOT checkpointPinned (round-12 A/B): the pinned tier
    // depends on PLAN-IDENTITY substitution — queries that build their
    // own copy of a core-equal plan (q33/q37/q74/q81/q124/q135/q157...)
    // are served from the CacheManager without ever touching the memo,
    // and the IMR's size stats keep their joins broadcast-planned. A
    // checkpoint leaf loses both (board A/B: +0.3-1.1 s across the
    // shingle/LSH family, q16 0.15->0.55, q135 0.82->1.94).
    m.computeIfAbsent((spark, key), _ => Dedup.cachePinned(build))
  }

  private[ops] def evict(spark: SparkSession): Unit =
    m.keySet.removeIf(k => k._1 eq spark)
}

object PinnedCoreMemo {
  private val all = new ConcurrentLinkedQueue[PinnedCoreMemo[_]]()
  private def register(memo: PinnedCoreMemo[_]): Unit = all.add(memo)

  /** Drop `spark`'s entries from every registered memo — called by
    * [[Dedup.unpersistPinned]] so memo identity and cache lifetime
    * cannot diverge. */
  private[graft] def evictAll(spark: SparkSession): Unit =
    all.forEach(_.evict(spark))
}
