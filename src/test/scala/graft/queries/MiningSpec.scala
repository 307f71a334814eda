package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wave-5 mining operators: brute-force cross-checks (a second,
  * independently-shaped Spark computation must agree exactly) plus plan
  * pins for the scale-critical shapes. */
class MiningSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q116 co-occurrence == positions-self-join brute force") {
    import graft.functions.TextFunctions._
    val tk = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(wsTokens(normalizeText(col("text")))).as(Seq("pos", "w")))
    val brute = tk.as("a").join(tk.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") > col("a.pos") &&
          col("b.pos") <= col("a.pos") + MiningQueries.CoocWindow)
      .select(least(col("a.w"), col("b.w")).as("w1"),
        greatest(col("a.w"), col("b.w")).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_cooc"))
      .filter(col("n_cooc") >= MiningQueries.CoocMinPair)
    val got = MiningQueries.q116_cooc_windows(spark, sfDir)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "slice/zip_with unrolled window disagrees with the self-join brute force")
  }

  test("q111 lift: spot value replays the integer formula") {
    val row = MiningQueries.q111_collocations(spark, sfDir).limit(1).collect()(0)
    val (cxy, cx, cy, lift) = (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    val nTotal = graft.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.wsTokens(
        graft.functions.TextFunctions.normalizeText(col("text")))).as("w"))
      .count()
    assert(lift == 1000L * cxy * nTotal / (cx * cy))
  }

  test("q113 stages partition the corpus into contiguous token bands") {
    val df = MiningQueries.q113_curriculum(spark, sfDir).cache()
    try {
      // stage is monotone in the curriculum order (ease desc, doc_id)
      val byOrder = df.orderBy(col("ease_x10k").desc, col("doc_id"))
        .select("stage").collect().map(_.getLong(0))
      assert(byOrder.zip(byOrder.tail).forall { case (a, b) => a <= b },
        "stage must be non-decreasing along the curriculum order")
      assert(byOrder.distinct.sorted.toSeq == (0L until MiningQueries.Stages).toSeq)
      // stages are near-equal in tokens: each within one max-doc of budget
      val tot = df.agg(sum("n_tokens")).collect()(0).getLong(0)
      val maxDoc = df.agg(max("n_tokens")).collect()(0).getLong(0)
      val perStage = df.groupBy("stage").agg(sum("n_tokens").as("t"))
        .collect().map(_.getLong(1))
      val budget = tot / MiningQueries.Stages
      assert(perStage.forall(t => math.abs(t - budget) <= maxDoc + 1),
        s"stage budgets $perStage stray more than one doc from $budget")
    } finally df.unpersist()
  }

  test("q112 source overlap: diagonal-free, symmetric-canonical, Jaccard bounded") {
    val rows = MiningQueries.q112_source_overlap(spark, sfDir).collect()
    assert(rows.length == 190) // 20 choose 2 — every pair present, zeros included
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (common, ja) = (r.getLong(2), r.getLong(5))
      assert(ja >= 0 && ja <= 10000)
      if (common == 0) assert(ja == 0)
    }
  }

  test("q115 dim variance: ranks are a permutation; zero-variance iff constant dim") {
    val rows = MiningQueries.q115_dim_variance(spark, sfDir).collect()
    assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq)
    rows.foreach { r =>
      val (n, s1, s2, v) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(v == 1000L * (n * s2 - s1 * s1) / (n * n))
      assert(v >= 0, "population variance is non-negative (Cauchy-Schwarz)")
    }
  }

  // ------------------------------------------------------------- plan pins

  test("q113 curriculum plans without a single-partition corpus window") {
    val offending = collectAllPlans(
      executedPlan(MiningQueries.q113_curriculum(spark, sfDir)))
      .collect { case w: WindowExec => w }
      .filter(_.partitionSpec.isEmpty)
    assert(offending.isEmpty,
      "globalCumSum must not plan an empty-partition WindowExec over the corpus")
  }

  test("q111/q116 shuffle only on aggregation keys (token pass stays narrow)") {
    Seq(MiningQueries.q111_collocations(spark, sfDir),
      MiningQueries.q116_cooc_windows(spark, sfDir)).foreach { df =>
      val shuffles = collectAllPlans(executedPlan(df))
        .collect { case s: ShuffleExchangeExec => s.outputPartitioning.toString }
      // hash = aggregation keys, range = output sort, SinglePartition = the
      // 1-row scalar-total aggregate (legitimately tiny at any corpus size)
      assert(shuffles.forall(p =>
        p.contains("hashpartitioning") || p.contains("rangepartitioning") ||
          p.contains("SinglePartition")),
        s"unexpected shuffle kinds: $shuffles")
    }
  }
}
