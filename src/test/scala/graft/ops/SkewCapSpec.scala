package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.functions._

/** Skew-injection enforcement for the inverted-index family (round-6
  * VERDICT): synthesize a corpus-hot key and pin, per query discipline,
  * the mechanism that bounds the task —
  *
  *  - q16/q76/q114 (Jaccard core) and q222 (blocking linkage) ride
  *    [[Dedup.cappedPostingPairs]]: the df cap prunes the hot key with a
  *    count aggregate + LEFT SEMI join BEFORE any posting list is
  *    collected, so the hot key costs a long per map task, never an id
  *    array (the round-6 ADVICE operation-order fix, pinned here both
  *    semantically and in the optimized plan's node order);
  *  - q200 (PPJoin) has no df cap — its guard is STRUCTURAL: the
  *    df-ascending prefix ordering ranks a corpus-hot token last in
  *    every doc, so it never enters the prefix key table and the
  *    candidate equijoin never keys on it;
  *  - residual skew (hot-but-under-cap keys) is AQE's skew-join split,
  *    which every session enables (asserted against the live conf).
  */
class SkewCapSpec extends SparkSpec {
  import spark.implicits._

  test("cappedPostingPairs: a key at exactly maxDf pairs fully; one past the cap contributes nothing") {
    val maxDf = 4
    val hot = (0 to maxDf).map(i => (100L + i, "hotkey")) // df = maxDf+1 → pruned
    val warm = (0 until maxDf).map(i => (200L + i, "warmkey")) // df = maxDf → kept
    val solo = Seq((300L, "solokey")) // df = 1 → below the pairing floor
    val keyed = (hot ++ warm ++ solo).toDF("id", "k")
    val pairs = Dedup.cappedPostingPairs(keyed, "k", "id", maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty && pairs.forall { case (a, b) =>
      a >= 200L && a < 300L && b >= 200L && b < 300L && a < b },
      s"only warm-key pairs, ordered id_a < id_b, expected: $pairs")
    assert(pairs.distinct.size == maxDf * (maxDf - 1) / 2,
      s"the at-cap key must pair completely: $pairs")
  }

  test("cappedPostingPairs: the cap lives IN the collector — one aggregate, no two-pass count+semi") {
    // round-8: the df cap moved from a count + LEFT SEMI prune into the
    // CappedCollectLongs aggregate (bounded buffer: a hot key saturates
    // at maxDf+1 buffered ids and emits empty). The pin flips with it:
    // the plan must have NO semi join and NO unbounded CollectList — the
    // single aggregate IS the bound.
    val keyed = (0 until 12).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "k")
    val optimized = Dedup.cappedPostingPairs(keyed, "k", "id", 4)
      .queryExecution.optimizedPlan
    val semis = optimized.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.isEmpty,
      s"the two-pass df prune should be fused into the capped collector:\n$optimized")
    val unboundedCollects = optimized.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.find(_.isInstanceOf[CollectList]).isDefined) => a
    }
    assert(unboundedCollects.isEmpty,
      s"no unbounded collect_list may materialize a posting list:\n$optimized")
    val capped = optimized.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.find(_.isInstanceOf[graft.expressions.CappedCollectLongs]).isDefined) => a
    }
    assert(capped.nonEmpty, s"expected the CappedCollectLongs aggregate:\n$optimized")
  }

  test("q200 discipline: a corpus-hot token never enters the PPJoin prefix key table") {
    // 8 docs x 10 distinct tokens: one token shared by ALL docs (df=8,
    // the injected skew), the rest unique (df=1). At tau=0.8 the prefix
    // keeps ranks <= 10 - ceil(0.8*10) + 1 = 3; the hot token's
    // df-ascending rank is 10 in every doc.
    val toks = (0 until 8).flatMap { d =>
      ("HOT" +: (0 until 9).map(t => s"u${d}_$t")).map(t => (s"doc$d", t))
    }.toDF("doc_id", "token")
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    val pkeys = graft.queries.IndexQueries.ppjoinPrefixKeys(toks, sizes)
    val hotRows = pkeys.filter(col("token") === "HOT").count()
    assert(hotRows == 0L,
      "the df-ascending prefix ordering must exclude the corpus-hot token from every prefix " +
        s"(got $hotRows prefix rows for it) — PPJoin's structural skew guard")
    // and the candidate join keys only on surviving (rare) tokens
    assert(pkeys.count() == 8L * 3L, "each doc contributes exactly its prefix length")
  }

  test("residual skew mechanism: AQE skew-join split is live in the session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "under-cap hot keys rely on AQE's skew-join split at scale")
  }
}
