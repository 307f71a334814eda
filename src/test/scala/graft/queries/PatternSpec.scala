package graft.queries

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Ann

/** Wave-6 pattern operators: independent-shape cross-checks and the
  * recall-sweep contract. */
class PatternSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q118 lag transitions == rank self-join brute force") {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val ranked = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
    val brute = ranked.as("a").join(ranked.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.rn") === col("a.rn") + 1)
      .groupBy(col("a.event_type").as("from_type"), col("b.event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val got = PatternQueries.q118_transition_matrix(spark, sfDir)
      .select("from_type", "to_type", "n_trans")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("q118 row-conditional probabilities: totals consistent, rows sum to n_from") {
    val rows = PatternQueries.q118_transition_matrix(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val nFrom = cells.head.getLong(3)
      assert(cells.map(_.getLong(2)).sum == nFrom)
      assert(cells.forall(_.getLong(3) == nFrom))
      // floor rounding: probabilities sum to at most 1000, within |cells| ulps
      val probSum = cells.map(_.getLong(4)).sum
      assert(probSum <= 1000 && probSum > 1000 - cells.length)
    }
  }

  test("q117 association stats replay their integer formulas") {
    PatternQueries.q117_basket_pairs(spark, sfDir).collect().foreach { r =>
      val (nAb, nA, nB, nBk) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getLong(6) == 10000L * nAb / nBk)
      assert(r.getLong(7) == 1000L * nAb / nA)
      assert(r.getLong(8) == 1000L * nAb * nBk / (nA * nB))
      assert(nAb <= math.min(nA, nB) && math.max(nA, nB) <= nBk)
    }
  }

  test("q119 recall is monotone in nprobe; probing every centroid is exact") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(pmod(col("vec_id"), lit(DataPrepQueries.AnnQueryMod)) === 0)
    val sweep = Ann.recallSweep(queries, emb, DataPrepQueries.AnnK,
      nCentroids = DataPrepQueries.IvfCentroids,
      probeDepths = Seq(1, 4, DataPrepQueries.IvfCentroids),
      trainRounds = DataPrepQueries.IvfTrainRounds).collect()
    val recalls = sweep.map(_.getLong(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as nprobe grows: ${recalls.toSeq}")
    // probing all centroids scans every inverted list == brute force
    // (identical dot/neighbor_id tie-break both sides)
    assert(recalls.last == 1000L, s"full probe must be exact: ${sweep.toSeq}")
  }

  test("q120 concordance windows are tight and centered") {
    val rows = PatternQueries.q120_concordance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ctx = r.getString(3).split(" ")
      assert(ctx.length <= 2 * PatternQueries.ConcordWidth + 1)
      // the probe term sits at its in-window offset
      val pos = r.getLong(2)
      val offset = (pos - math.max(1, pos - PatternQueries.ConcordWidth)).toInt
      assert(ctx(offset) == r.getString(1))
    }
  }

  test("q118 plans one user-partitioned window, never an empty partition spec") {
    val offending = collectAllPlans(
      executedPlan(PatternQueries.q118_transition_matrix(spark, sfDir)))
      .collect { case w: WindowExec => w }
      .filter(_.partitionSpec.isEmpty)
    assert(offending.isEmpty)
  }
}
