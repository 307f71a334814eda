package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan pins for the round-9 stacked-rank rewrites: q168 (three RFM
  * quintile ranks) and q189 (two Spearman metric ranks) must rank all
  * their independent signals through ONE range shuffle — the stacked
  * (sig, v, key) globalIndex — not one chained range shuffle per
  * signal. A regression back to chained passes stays value-correct, so
  * only the plan shape can catch it. */
class StackedRankPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rangeShuffles(df: DataFrame): Int =
    collectAllPlans(executedPlan(df)).collect {
      case s: ShuffleExchangeExec
          if s.outputPartitioning.toString.contains("rangepartitioning") => s
    }.size

  test("q168 RFM: three quintile ranks ride ONE range shuffle (stacked globalIndex)") {
    val n = rangeShuffles(
      graft.queries.RetailQueries.q168_rfm_segments(spark, sfDir))
    // one stacked rank + the final ORDER BY segment = at most 2 range
    // exchanges; the round-8 chained form had 4
    assert(n <= 2, s"expected <= 2 range shuffles (stacked rank + output sort), got $n")
  }

  test("q189 Spearman: both metric ranks ride ONE range shuffle") {
    val n = rangeShuffles(
      graft.queries.StatQueries.q189_spearman_rfm(spark, sfDir))
    // the output is a 1-row aggregate — the stacked rank's exchange is
    // the only range shuffle in the plan
    assert(n <= 1, s"expected <= 1 range shuffle (stacked rank only), got $n")
  }

  test("q127 Borda: the two signal ranks share one range shuffle; only the blend adds a second") {
    val n = rangeShuffles(
      graft.queries.HygieneQueries.q127_rank_ensemble(spark, sfDir))
    // stacked signal rank + blend rank + output sort — never four (the
    // round-7 per-signal chain)
    assert(n <= 3, s"expected <= 3 range shuffles, got $n")
  }
}
