package graft.plans


import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec

/** Contracts of the native AS-OF join (custom logical node + strategy +
  * physical merge walk): semantics against a brute-force reference on
  * random data with ties and no-match rows, self-join exprId hygiene, and
  * the physical shape (one exchange per side, AsOfJoinExec present). */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = executedPlan(df)
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = collectAllPlans(p)

  test("asofJoin == brute-force latest-at-or-before, incl. ts ties and no-match nulls") {
    val rnd = new scala.util.Random(11)
    val lefts = (1 to 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i.toLong))
    val rights = (1 to 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, (1000 + i).toLong, rnd.nextInt(100).toLong))
    val lDf = lefts.toDF("k", "ts", "lid").repartition(7)
    val rDf = rights.toDF("rk", "rts", "rid", "rv").repartition(3)

    val got = AsOfJoinStrategy.asofJoin(lDf, rDf, "k", "ts", "rk", "rts", "rid")
      .select("k", "ts", "lid", "rid", "rv")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet

    val want = lefts.map { case (k, ts, lid) =>
      val m = rights.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption // latest ts, then highest tie id
      (k, ts, lid, m.map(_._3), m.map(_._4))
    }.toSet
    assert(got == want)
  }

  test("self-join (both sides from one scan) resolves: fresh exprIds on the right") {
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("k", "ts", "id")
    // each row joined to the latest row (incl. itself) of its key
    val out = AsOfJoinStrategy.asofJoin(
      df, df.toDF("k2", "ts2", "id2"), "k", "ts", "k2", "ts2", "id2")
      .select("id", "id2").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("physical shape: AsOfJoinExec, one exchange per side, no window/aggregate") {
    val lDf = (1 to 50).map(i => (i.toLong % 5, i.toLong, i.toLong)).toDF("k", "ts", "lid")
    val rDf = (1 to 50).map(i => (i.toLong % 5, i.toLong, 100L + i)).toDF("rk", "rts", "rid")
    val plan = executed(
      AsOfJoinStrategy.asofJoin(lDf, rDf, "k", "ts", "rk", "rts", "rid"))
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[AsOfJoinExec]), s"expected AsOfJoinExec:\n$plan")
    val shuffles = all.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 2, s"expected exactly one exchange per side:\n$plan")
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"the native as-of join must not fall back to a window:\n$plan")
  }

  test("NULL key/ts rows: lefts emit unmatched, rights never match, walk stays correct") {
    val lDf = Seq(
      (Some(1L), Some(10L), 1L),
      (Some(1L), None, 2L),      // null ts → unmatched
      (None, Some(10L), 3L),     // null key → unmatched
      (Some(2L), Some(10L), 4L)
    ).toDF("k", "ts", "lid")
    val rDf = Seq(
      (Some(1L), Some(5L), 100L),
      (Some(1L), None, 101L),    // null ts right: skipped
      (None, Some(5L), 102L),    // null key right: skipped
      (Some(2L), Some(5L), 103L)
    ).toDF("rk", "rts", "rid")
    val out = AsOfJoinStrategy.asofJoin(lDf, rDf, "k", "ts", "rk", "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, Some(100L)), (2L, None), (3L, None), (4L, Some(103L))))
  }

  test("tolerance bounds the lookback: stale candidates stop matching (merge_asof semantics)") {
    val lDf = Seq((1L, 100L, 1L), (1L, 500L, 2L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 90L, 10L)).toDF("rk", "rts", "rid")
    val out = AsOfJoinStrategy.asofJoin(lDf, rDf, "k", "ts", "rk", "rts", "rid",
      toleranceMs = Some(50L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    // left@100: right@90 is 10ms old → matches; left@500: 410ms old → no match
    assert(out == Set((1L, Some(10L)), (2L, None)))
  }

  test("empty right side and empty left side degrade cleanly") {
    val lDf = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val empty = Seq.empty[(Long, Long, Long)].toDF("rk", "rts", "rid")
    val out = AsOfJoinStrategy.asofJoin(lDf, empty, "k", "ts", "rk", "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((1L, None)))
    val none = AsOfJoinStrategy.asofJoin(empty.toDF("k", "ts", "lid"), lDf.toDF("rk", "rts", "rid"),
      "k", "ts", "rk", "rts", "rid")
    assert(none.count() == 0)
  }
}
