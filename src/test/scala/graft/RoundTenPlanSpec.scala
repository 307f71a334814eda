package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan pins for the round-10 rewrites: q366's three-order sweep must
  * ride ONE packed-key posting exchange (not one chain per order), and
  * q214's literal-list screen must have NO hash shuffle at all (the
  * whole screen is an in-row pass; only the output sort exchanges).
  * Both regressions stay value-correct, so only the plan shape can
  * catch them. */
class RoundTenPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    collectAllPlans(executedPlan(df)).collect { case s: ShuffleExchangeExec => s }

  /** Attribute NAMES a hash exchange partitions on — exact names, not
    * toString substrings ("k#" also matched e.g. "rank#"; ADVICE r10). */
  private def hashKeyNames(s: ShuffleExchangeExec): Seq[String] =
    s.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.collect { case a: Attribute => a.name }
      case _ => Seq.empty
    }

  test("q366: the three shingle orders share ONE packed-key posting exchange") {
    val ex = shuffles(
      graft.queries.ClosureQueries.q366_shingle_sweep(spark, sfDir))
    val posting = ex.filter(s => hashKeyNames(s) == Seq("k"))
    assert(posting.size == 1,
      s"expected exactly 1 posting exchange on the packed key, got ${posting.size}")
    // the per-arm form's signature: an exchange keyed on the raw shingle
    assert(!ex.exists(s => hashKeyNames(s).contains("shingle")),
      "per-arm shingle-keyed exchanges are back — the sweep no longer shares one chain")
  }

  test("q214: the literal-list screen has NO hash shuffle — in-row pass + output sort only") {
    val ex = shuffles(
      graft.queries.TextOpsQueries.q214_blocklist_screen(spark, sfDir))
    val hash = ex.filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    assert(hash.isEmpty,
      s"expected no hash exchange (map-side screen), got ${hash.map(_.outputPartitioning)}")
  }
}
