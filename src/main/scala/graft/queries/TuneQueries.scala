package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-29 decision-support operators: the best-F1 operating
  * point (turning q203's curve into the ONE threshold a production gate
  * ships with) and conversion-latency quartiles per signup cohort (the
  * "how fast do users convert, and is it changing" report on q151's
  * survival axis).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object TuneQueries {

  /** X230 — best-F1 operating point: sweep every distinct classifier
    * score as a keep-threshold (q203's grouped-score cumsum — the sweep
    * is score-range-bounded, never corpus-bounded), compute integer
    * P/R/F1 ×10⁴ at each, and return the argmax threshold (ties → the
    * HIGHER threshold: prefer precision when F1 ties). This is the
    * artifact a curation gate actually deploys — q183 says whether the
    * ranking is good, this says where to cut it. */
  def q209_best_threshold(spark: SparkSession, dir: String): DataFrame = {
    val g = TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
      .join(DataPrepQueries.q26_quality_filter(spark, dir)
        .select(col("doc_id"), col("keep").cast("long").as("keep")), "doc_id")
      .groupBy("score")
      .agg(sum("keep").as("pos_s"), (count(lit(1)) - sum("keep")).as("neg_s"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = g.agg(sum("pos_s").as("n_pos"))
    val swept = g.withColumn("cum_tp", sum("pos_s").over(w))
      .withColumn("cum_p", sum(col("pos_s") + col("neg_s")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("prec_x10k", expr("(10000 * cum_tp) div cum_p"))
      .withColumn("rec_x10k",
        expr("CASE WHEN n_pos = 0 THEN 0 ELSE (10000 * cum_tp) div n_pos END"))
      .withColumn("f1_x10k",
        expr("""CASE WHEN prec_x10k + rec_x10k = 0 THEN 0
               |ELSE (2 * prec_x10k * rec_x10k) div (prec_x10k + rec_x10k)
               |END""".stripMargin))
    swept.orderBy(col("f1_x10k").desc, col("score").desc).limit(1)
      .select(col("score").as("threshold"), col("cum_tp"), col("cum_p"),
        col("prec_x10k"), col("rec_x10k"), col("f1_x10k"))
  }

  import PipelineQueries.DayMs

  /** X231 — conversion-latency quartiles per signup cohort: users
    * cohorted by signup week; per cohort, the exact lower-median and
    * quartiles (ranks ⌈n·q/4⌉, the q67-companion order-statistic
    * convention) of signup→first-purchase latency in days, plus the
    * conversion share ×10⁴. The longitudinal twin of q151's hazard
    * curve: hazard says WHEN conversions happen overall, this says
    * whether each cohort is getting faster or slower.
    *
    * Scale: per-user firsts are one user-keyed aggregate; quartiles
    * ride a cohort-partitioned rank window (cohort-bounded rows). */
  def q210_latency_quartiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_ms").as("s_ts"))
      .withColumn("cohort_week", expr(s"s_ts div (7 * $DayMs)"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms").as("p_ts"))
      .join(signup, "user_id")
      .filter(col("p_ts") >= col("s_ts"))
      .groupBy("user_id", "cohort_week", "s_ts").agg(min("p_ts").as("p_ts"))
      .withColumn("latency_days", expr(s"(p_ts - s_ts) div $DayMs"))
    val sizes = signup.groupBy("cohort_week").agg(count(lit(1)).as("n_signup"))
    val ranked = conv.withColumn("rk", row_number().over(
        Window.partitionBy("cohort_week")
          .orderBy(col("latency_days"), col("user_id"))).cast("long"))
    val counts = conv.groupBy("cohort_week").agg(count(lit(1)).as("n_conv"))
    def atQuartile(q: Int) =
      ranked.join(counts, "cohort_week")
        .filter(col("rk") === expr(s"CAST((n_conv * $q + 3) div 4 AS BIGINT)"))
        .select(col("cohort_week"), col("latency_days").as(s"q$q" + "_days"))
    atQuartile(1)
      .join(atQuartile(2), "cohort_week")
      .join(atQuartile(3), "cohort_week")
      .join(counts, "cohort_week")
      .join(sizes, "cohort_week")
      .withColumn("conv_x10k", expr("(10000 * n_conv) div n_signup"))
      .select(col("cohort_week"), col("n_signup"), col("n_conv"), col("conv_x10k"),
        col("q1_days"), col("q2_days"), col("q3_days"))
      .orderBy("cohort_week")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q209_best_threshold" -> q209_best_threshold,
    "q210_latency_quartiles" -> q210_latency_quartiles
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q209_best_threshold" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |g AS (SELECT sc.score, CAST(sum(kp.keep) AS BIGINT) AS pos_s,
         |             CAST(count(*) - sum(kp.keep) AS BIGINT) AS neg_s
         |      FROM sc JOIN kp USING (doc_id) GROUP BY sc.score),
         |t AS (SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos FROM g),
         |c AS (SELECT score,
         |             CAST(sum(pos_s) OVER (ORDER BY score DESC
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS cum_tp,
         |             CAST(sum(pos_s + neg_s) OVER (ORDER BY score DESC
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS cum_p
         |      FROM g),
         |f AS (SELECT c.score, c.cum_tp, c.cum_p,
         |             (10000 * c.cum_tp) // c.cum_p AS prec_x10k,
         |             CASE WHEN t.n_pos = 0 THEN 0
         |                  ELSE (10000 * c.cum_tp) // t.n_pos END AS rec_x10k
         |      FROM c CROSS JOIN t),
         |f2 AS (SELECT *, CASE WHEN prec_x10k + rec_x10k = 0 THEN 0
         |                 ELSE (2 * prec_x10k * rec_x10k) // (prec_x10k + rec_x10k)
         |                 END AS f1_x10k
         |       FROM f)
         |SELECT score AS threshold, cum_tp, cum_p,
         |       CAST(prec_x10k AS BIGINT) AS prec_x10k,
         |       CAST(rec_x10k AS BIGINT) AS rec_x10k,
         |       CAST(f1_x10k AS BIGINT) AS f1_x10k
         |FROM f2 ORDER BY f1_x10k DESC, score DESC LIMIT 1""".stripMargin,
    "q210_latency_quartiles" ->
      s"""WITH su AS (
         |  SELECT user_id, CAST(min(epoch_ms(ts)) AS BIGINT) AS s_ts
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |sc AS (SELECT user_id, s_ts, s_ts // (7 * $DayMs) AS cohort_week FROM su),
         |cv AS (
         |  SELECT sc.user_id, sc.cohort_week,
         |         (min(epoch_ms(e.ts)) - sc.s_ts) // $DayMs AS latency_days
         |  FROM sc JOIN events e ON e.user_id = sc.user_id
         |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= sc.s_ts
         |  GROUP BY sc.user_id, sc.cohort_week, sc.s_ts),
         |sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_signup
         |       FROM sc GROUP BY cohort_week),
         |cn AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_conv
         |       FROM cv GROUP BY cohort_week),
         |rk AS (SELECT cohort_week, latency_days,
         |              CAST(row_number() OVER (PARTITION BY cohort_week
         |                   ORDER BY latency_days, user_id) AS BIGINT) AS rk
         |       FROM cv),
         |qq AS (SELECT rk.cohort_week,
         |              max(CASE WHEN rk.rk = (cn.n_conv * 1 + 3) // 4
         |                       THEN rk.latency_days END) AS q1_days,
         |              max(CASE WHEN rk.rk = (cn.n_conv * 2 + 3) // 4
         |                       THEN rk.latency_days END) AS q2_days,
         |              max(CASE WHEN rk.rk = (cn.n_conv * 3 + 3) // 4
         |                       THEN rk.latency_days END) AS q3_days
         |       FROM rk JOIN cn USING (cohort_week)
         |       GROUP BY rk.cohort_week)
         |SELECT qq.cohort_week, sz.n_signup, cn.n_conv,
         |       CAST((10000 * cn.n_conv) // sz.n_signup AS BIGINT) AS conv_x10k,
         |       CAST(qq.q1_days AS BIGINT) AS q1_days,
         |       CAST(qq.q2_days AS BIGINT) AS q2_days,
         |       CAST(qq.q3_days AS BIGINT) AS q3_days
         |FROM qq JOIN cn USING (cohort_week) JOIN sz USING (cohort_week)
         |ORDER BY cohort_week""".stripMargin
  )
}
