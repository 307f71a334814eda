package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 wave-27 model-curve operators: the threshold-sweep artifacts
  * behind every classifier dashboard — the ROC curve itself (q183 gave
  * its area), average precision (the ranking-quality scalar retrieval
  * and filtering pipelines actually optimize), and the cumulative-gains
  * table (what a budgeted review queue reads: "the top decile holds X%
  * of the positives").
  *
  * Ground truth and scores are the board's own artifacts: q97's frozen
  * classifier vs q26's rule-based keep gate. All integer-exact; the
  * corpus-wide rankings ride the two-phase globalIndex/globalCumSum
  * machinery (q10/q138) — no single-task window ever sees the corpus.
  */
object CurveQueries {

  /** The scored-and-labeled frame (doc_id, score, keep) — q183's input,
    * shared across the curve family. */
  private def scoredKeep(spark: SparkSession, dir: String): DataFrame =
    TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
      .join(DataPrepQueries.q26_quality_filter(spark, dir)
        .select(col("doc_id"), col("keep").cast("long").as("keep")), "doc_id")

  /** X223 — ROC curve points: for every distinct score threshold t
    * (predict keep when score ≥ t), the confusion counts and
    * TPR/FPR ×10⁴ — the curve whose area q183 reports. Computed
    * entirely over score GROUPS (q183's discipline): one grouped
    * aggregate + a running sum over distinct scores DESC, bounded by
    * the score's integer range, never the corpus. */
  def q203_roc_curve(spark: SparkSession, dir: String): DataFrame = {
    val g = scoredKeep(spark, dir)
      .groupBy("score")
      .agg(sum("keep").as("pos_s"), (count(lit(1)) - sum("keep")).as("neg_s"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = g.agg(sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"))
    g.withColumn("cum_tp", sum("pos_s").over(w))
      .withColumn("cum_fp", sum("neg_s").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("tpr_x10k",
        expr("CASE WHEN n_pos = 0 THEN 0 ELSE (10000 * cum_tp) div n_pos END"))
      .withColumn("fpr_x10k",
        expr("CASE WHEN n_neg = 0 THEN 0 ELSE (10000 * cum_fp) div n_neg END"))
      .select(col("score").as("threshold"), col("cum_tp"), col("cum_fp"),
        col("tpr_x10k"), col("fpr_x10k"))
      .orderBy(col("threshold").desc)
  }

  /** X224 — average precision (AP): `(Σ_{k: rel_k} (10⁶·cum_tp@k) div k)
    * div n_pos` over the tie-broken ranking (score desc, doc_id) — the
    * ranking-quality scalar that, unlike AUC, concentrates on the head
    * of the list (what a top-k review queue or curation cut actually
    * consumes). The rank and the running positive count are the
    * TWO-PHASE globalIndex + a per-positive division — the corpus is
    * range-shuffled once, never windowed on one task. */
  def q204_average_precision(spark: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.Relational.globalIndex(
      scoredKeep(spark, dir).withColumn("neg_score", -col("score")),
      Seq(col("neg_score"), col("doc_id")), "rk")
    // cum_tp over the ranked corpus through the TWO-PHASE running sum —
    // the corpus is range-shuffled, never windowed on one task
    val cum = graft.ops.Relational.globalCumSum(
      ranked, Seq(col("rk")), col("keep"), "cum_tp")
    cum.filter(col("keep") === 1L)
      .withColumn("contrib", expr("(1000000 * cum_tp) div rk"))
      .agg(count(lit(1)).as("n_pos"), sum("contrib").as("sum_contrib"))
      .withColumn("ap_x1e6",
        expr("CASE WHEN n_pos = 0 THEN 0 ELSE sum_contrib div n_pos END"))
      .select("n_pos", "sum_contrib", "ap_x1e6")
  }

  /** Gains-table resolution. */
  val GainsBuckets = 10

  /** X225 — cumulative gains by score decile: the corpus ranked by
    * (score desc, doc_id) into [[GainsBuckets]] equal-count buckets
    * (q69's explicit-⌊B·(rk−1)/n⌋ rule on the two-phase index, exact at
    * any scale), each reporting its positives and the CUMULATIVE share
    * of all positives captured so far ×10⁴ — "review only the top
    * decile, catch X% of keepers": the budget planning table. */
  def q205_cumulative_gains(spark: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.Relational.globalIndex(
      scoredKeep(spark, dir).withColumn("neg_score", -col("score")),
      Seq(col("neg_score"), col("doc_id")), "rk")
    val n = ranked.agg(count(lit(1)).as("n_total"),
      sum("keep").as("n_pos_total"))
    val buckets = ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        expr(s"($GainsBuckets * (rk - 1)) div n_total") + 1L)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_pos"),
        max("n_pos_total").as("n_pos_total"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    buckets
      .withColumn("cum_pos", sum("n_pos").over(w))
      .withColumn("cum_gain_x10k",
        expr("CASE WHEN n_pos_total = 0 THEN 0 ELSE (10000 * cum_pos) div n_pos_total END"))
      .select(col("bucket").cast("long").as("bucket"), col("n_docs"),
        col("n_pos"), col("cum_pos"), col("cum_gain_x10k"))
      .orderBy("bucket")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_roc_curve" -> q203_roc_curve,
    "q204_average_precision" -> q204_average_precision,
    "q205_cumulative_gains" -> q205_cumulative_gains
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q203_roc_curve" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |g AS (SELECT sc.score, CAST(sum(kp.keep) AS BIGINT) AS pos_s,
         |             CAST(count(*) - sum(kp.keep) AS BIGINT) AS neg_s
         |      FROM sc JOIN kp USING (doc_id) GROUP BY sc.score),
         |t AS (SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
         |             CAST(sum(neg_s) AS BIGINT) AS n_neg FROM g),
         |c AS (SELECT score,
         |             CAST(sum(pos_s) OVER (ORDER BY score DESC
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS cum_tp,
         |             CAST(sum(neg_s) OVER (ORDER BY score DESC
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS cum_fp
         |      FROM g)
         |SELECT c.score AS threshold, c.cum_tp, c.cum_fp,
         |       CAST(CASE WHEN t.n_pos = 0 THEN 0
         |            ELSE (10000 * c.cum_tp) // t.n_pos END AS BIGINT) AS tpr_x10k,
         |       CAST(CASE WHEN t.n_neg = 0 THEN 0
         |            ELSE (10000 * c.cum_fp) // t.n_neg END AS BIGINT) AS fpr_x10k
         |FROM c CROSS JOIN t
         |ORDER BY threshold DESC""".stripMargin,
    "q204_average_precision" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |j AS (SELECT sc.doc_id, sc.score, kp.keep
         |      FROM sc JOIN kp USING (doc_id)),
         |rkd AS (SELECT doc_id, keep,
         |               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |                 AS BIGINT) AS rk
         |        FROM j),
         |c AS (SELECT rk, keep,
         |             CAST(sum(keep) OVER (ORDER BY rk
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS cum_tp
         |      FROM rkd),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n_pos,
         |             CAST(sum((1000000 * cum_tp) // rk) AS BIGINT) AS sum_contrib
         |      FROM c WHERE keep = 1)
         |SELECT n_pos, sum_contrib,
         |       CAST(CASE WHEN n_pos = 0 THEN 0
         |            ELSE sum_contrib // n_pos END AS BIGINT) AS ap_x1e6
         |FROM p""".stripMargin,
    "q205_cumulative_gains" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |j AS (SELECT sc.doc_id, sc.score, kp.keep
         |      FROM sc JOIN kp USING (doc_id)),
         |rkd AS (SELECT doc_id, keep,
         |               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |                 AS BIGINT) AS rk
         |        FROM j),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
         |             CAST(sum(keep) AS BIGINT) AS n_pos_total FROM rkd),
         |b AS (SELECT ($GainsBuckets * (rk - 1)) // t.n_total + 1 AS bucket,
         |             keep, t.n_pos_total
         |      FROM rkd CROSS JOIN t),
         |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(keep) AS BIGINT) AS n_pos,
         |             CAST(max(n_pos_total) AS BIGINT) AS n_pos_total
         |      FROM b GROUP BY bucket)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, n_pos,
         |       CAST(sum(n_pos) OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cum_pos,
         |       CAST(CASE WHEN n_pos_total = 0 THEN 0
         |            ELSE (10000 * sum(n_pos) OVER (ORDER BY bucket
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |                 // n_pos_total END AS BIGINT) AS cum_gain_x10k
         |FROM g ORDER BY bucket""".stripMargin
  )
}
