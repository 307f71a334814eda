package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The range-join rewrite rule: identical results to the naive inequality
  * join, a no-nested-loop physical plan, and sound scope guards. */
class BinnedRangeJoinRuleSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
  }

  private val rnd = new scala.util.Random(23)
  // negative and positive timestamps: the bucket cover must hold for both
  private val lts = (1 to 120).map(i => (rnd.nextLong() % 1000L, i.toLong)).toSeq
  private val rts = (1 to 300).map(i => (rnd.nextLong() % 1200L, 1000L + i)).toSeq

  private def naive = {
    val l = lts.toDF("l_ts", "lid")
    val r = rts.toDF("r_ts", "rid")
    l.join(r, col("r_ts") >= col("l_ts") && col("r_ts") < col("l_ts") + lit(100L))
  }

  test("rewritten join returns exactly the naive join's rows (incl. negative ts)") {
    val want = naive.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    val got = withRule {
      naive.select("lid", "rid").as[(Long, Long)].collect().toSet
    }
    assert(got == want)
  }

  test("with the rule the plan is an equi-join; without it, a nested loop") {
    val planWithout = naive.queryExecution.executedPlan.toString
    assert(planWithout.contains("NestedLoop") || planWithout.contains("Cartesian"),
      s"sanity: the naive plan should be a nested loop:\n$planWithout")
    withRule {
      val planWith = naive.queryExecution.executedPlan.toString
      assert(!planWith.contains("NestedLoop") && !planWith.contains("Cartesian"),
        s"rewritten plan must not nested-loop:\n$planWith")
      assert(planWith.contains("__bin"), s"expected the bin equi-key:\n$planWith")
    }
  }

  test("scope guard: a join that already has an equality conjunct is untouched") {
    val l = Seq((1L, 10L, 1L)).toDF("k", "l_ts", "lid")
    val r = Seq((1L, 15L, 2L)).toDF("k", "r_ts", "rid")
    withRule {
      val joined = l.join(r, l("k") === r("k") &&
        col("r_ts") >= col("l_ts") && col("r_ts") < col("l_ts") + lit(100L))
      assert(!joined.queryExecution.executedPlan.toString.contains("__bin"),
        "equi-join present: the rule must not fire")
      assert(joined.select("lid", "rid").as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    }
  }

  test("scope guard: non-window upper bounds (no literal) are untouched") {
    val l = Seq((10L, 1L), (20L, 2L)).toDF("l_ts", "lid")
    val r = Seq((15L, 3L)).toDF("r_ts", "rid")
    withRule {
      // upper bound references a column, not a literal window — not binnable
      val joined = l.join(r,
        col("r_ts") >= col("l_ts") && col("r_ts") < col("l_ts") * 2)
      assert(!joined.queryExecution.executedPlan.toString.contains("__bin"))
      assert(joined.select("lid", "rid").as[(Long, Long)].collect().toSet == Set((1L, 3L)))
    }
  }

  test("BETWEEN (inclusive upper) also rewrites, with exact boundary semantics") {
    val l = Seq((100L, 1L)).toDF("l_ts", "lid")
    val r = Seq((99L, 10L), (100L, 11L), (200L, 12L), (201L, 13L)).toDF("r_ts", "rid")
    withRule {
      val joined = l.join(r, col("r_ts").between(col("l_ts"), col("l_ts") + lit(100L)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__bin") && !plan.contains("NestedLoop"),
        s"inclusive range must also rewrite:\n$plan")
      assert(joined.select("rid").as[Long].collect().toSet == Set(11L, 12L))
    }
    // inclusive result equality on random data
    val want = lts.toDF("l_ts", "lid").join(rts.toDF("r_ts", "rid"),
      col("r_ts").between(col("l_ts"), col("l_ts") + lit(100L)))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val got = withRule {
      lts.toDF("l_ts", "lid").join(rts.toDF("r_ts", "rid"),
        col("r_ts").between(col("l_ts"), col("l_ts") + lit(100L)))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
    }
    assert(got == want && want.nonEmpty)
  }

  test("boundary semantics survive the rewrite: [ts, ts+W) half-open") {
    val l = Seq((100L, 1L)).toDF("l_ts", "lid")
    val r = Seq((99L, 10L), (100L, 11L), (199L, 12L), (200L, 13L)).toDF("r_ts", "rid")
    withRule {
      val got = l.join(r, col("r_ts") >= col("l_ts") && col("r_ts") < col("l_ts") + lit(100L))
        .select("rid").as[Long].collect().toSet
      assert(got == Set(11L, 12L))
    }
  }
}
