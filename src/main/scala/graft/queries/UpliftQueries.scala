package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-87:
  *
  *  - geometric retention fit (q373): the one-parameter shifted-
  *    geometric retention model fit by moment-matching at offset 1
  *    and BACKTESTED against the observed curve — model_t is the
  *    integer power fold r₁ᵗ (×10⁴ each step, the q169 recurrence
  *    class), the at-risk denominators are horizon-corrected (a user
  *    signing up near the end of the window can't be retained past
  *    it — the q328 censoring lesson applied to retention). Where the
  *    model under-shoots, retention has memory (loyalty); where it
  *    over-shoots, churn accelerates;
  *  - Qini uplift curve (q374): incremental-conversion evaluation of
  *    a targeting score under the q320 md5-parity arms — cumulative
  *    treated-vs-control conversion gap by score decile. THE readout
  *    for "who should get the treatment": a score with no uplift
  *    signal hugs zero even when its plain gains curve (q205) looks
  *    strong. Deciles via the exact integer rank formula; all
  *    cumulative frames are 10-row bounded.
  */
object UpliftQueries {

  private val DayMs = 86400000L

  /** Retention horizon (day offsets 0..T). */
  val RetentionT = 14L

  /** X405 — geometric retention backtest: per offset t, horizon-
    * corrected at-risk users, observed actives, actual ×10⁴, the
    * r₁ᵗ model ×10⁴ (integer power fold), and the signed delta. */
  def q373_retention_fit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr(s"ts_ms div $DayMs").as("day"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("s_day"))
    val span = ev.agg(max("day").as("d1"))
    // observed actives per offset (distinct user-offset)
    val act = ev.join(s, "user_id")
      .select(col("user_id"), (col("day") - col("s_day")).as("t"))
      .filter(col("t") >= 0 && col("t") <= RetentionT)
      .distinct()
      .groupBy("t").agg(count(lit(1)).as("n_active"))
    // at-risk per offset: users whose horizon reaches t (|days| hist)
    val hist = s.groupBy("s_day").agg(count(lit(1)).as("nc")).crossJoin(broadcast(span))
    val offsets = spark.range(RetentionT + 1).select(col("id").as("t"))
    val risk = offsets.join(hist, expr("s_day + t <= d1"), "left")
      .groupBy("t").agg(coalesce(sum("nc"), lit(0L)).as("n_at_risk"))
    val joined = risk.join(act, Seq("t"), "left").na.fill(0L, Seq("n_active"))
      .withColumn("actual_x10k", expr(
        "CASE WHEN n_at_risk = 0 THEN 0L ELSE (10000 * n_active) div n_at_risk END"))
    val r1 = joined.filter(col("t") === 1)
      .select(col("actual_x10k").as("a1"))
    joined.crossJoin(broadcast(r1))
      // sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — the
      // t = 0 base case must short-circuit before the fold
      .withColumn("model_x10k", expr(
        """CASE WHEN t = 0 THEN 10000L
          |ELSE aggregate(sequence(1, CAST(t AS INT)), 10000L,
          |  (acc, i) -> (acc * a1) div 10000) END""".stripMargin))
      .withColumn("delta_x10k", col("actual_x10k") - col("model_x10k"))
      .select("t", "n_at_risk", "n_active", "actual_x10k", "model_x10k", "delta_x10k")
      .orderBy("t")
  }

  /** X406 — Qini uplift curve: users scored by activity (event count),
    * md5-parity arms, conversion at the q320 threshold; per score
    * decile the cumulative arm censuses and the uplift ×10⁴
    * (convT·nC − convC·nT normalized by nT·nC). */
  def q374_qini_curve(spark: SparkSession, dir: String): DataFrame = {
    import PreflightQueries.ConvMinPurchases
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        sum((col("event_type") === "purchase").cast("long")).as("np"))
      .withColumn("conv", (col("np") >= ConvMinPurchases).cast("long"))
      .withColumn("arm",
        when(substring(md5(concat_ws(":", lit("ab8"), col("user_id"))), 1, 1) >= "8",
          lit("b")).otherwise(lit("a")))
    val idxd = graft.ops.Relational.globalIndex(users,
      Seq(col("score").desc, col("user_id")), "rk")
    val tot = users.agg(count(lit(1)).as("n_all"))
    val dec = idxd.crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rk - 1) * 10) div n_all"))
      .groupBy("decile")
      .agg(sum(when(col("arm") === "b", 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === "b", col("conv")).otherwise(0L)).as("ct"),
        sum(when(col("arm") === "a", 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === "a", col("conv")).otherwise(0L)).as("cc"))
    // 10-row cumulative frame
    val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    dec
      .withColumn("cum_nt", sum("nt").over(w))
      .withColumn("cum_ct", sum("ct").over(w))
      .withColumn("cum_nc", sum("nc").over(w))
      .withColumn("cum_cc", sum("cc").over(w))
      .withColumn("uplift_x10k", expr(
        """CASE WHEN cum_nt = 0 OR cum_nc = 0 THEN 0L
          |ELSE (10000 * (cum_ct * cum_nc - cum_cc * cum_nt)) div (cum_nt * cum_nc)
          |END""".stripMargin))
      .select("decile", "cum_nt", "cum_ct", "cum_nc", "cum_cc", "uplift_x10k")
      .orderBy("decile")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q373_retention_fit" -> q373_retention_fit,
    "q374_qini_curve" -> q374_qini_curve
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q373_retention_fit" ->
      s"""WITH RECURSIVE ev AS (SELECT user_id, event_type,
         |                             epoch_ms(ts) // $DayMs AS day FROM events),
         |s AS (SELECT user_id, min(day) AS s_day FROM ev
         |      WHERE event_type = 'signup' GROUP BY user_id),
         |span AS (SELECT max(day) AS d1 FROM ev),
         |act AS (SELECT t, CAST(count(*) AS BIGINT) AS n_active FROM (
         |          SELECT DISTINCT e.user_id, e.day - s.s_day AS t
         |          FROM ev e JOIN s USING (user_id)
         |          WHERE e.day - s.s_day BETWEEN 0 AND $RetentionT)
         |        GROUP BY t),
         |hist AS (SELECT s_day, CAST(count(*) AS BIGINT) AS nc FROM s GROUP BY s_day),
         |offs AS (SELECT CAST(unnest(generate_series(0, $RetentionT)) AS BIGINT) AS t),
         |risk AS (SELECT o.t, CAST(coalesce(sum(h.nc), 0) AS BIGINT) AS n_at_risk
         |         FROM offs o LEFT JOIN hist h CROSS JOIN span
         |           ON h.s_day + o.t <= span.d1
         |         GROUP BY o.t),
         |j AS (SELECT r.t, r.n_at_risk,
         |             CAST(coalesce(a.n_active, 0) AS BIGINT) AS n_active,
         |             CAST(CASE WHEN r.n_at_risk = 0 THEN 0
         |                  ELSE (10000 * coalesce(a.n_active, 0)) // r.n_at_risk END
         |               AS BIGINT) AS actual_x10k
         |      FROM risk r LEFT JOIN act a USING (t)),
         |a1 AS (SELECT actual_x10k AS a1 FROM j WHERE t = 1),
         |m AS (SELECT 0 AS t, CAST(10000 AS BIGINT) AS model_x10k
         |      UNION ALL
         |      SELECT m.t + 1, (m.model_x10k * a1.a1) // 10000
         |      FROM m CROSS JOIN a1 WHERE m.t < $RetentionT)
         |SELECT j.t, j.n_at_risk, j.n_active, j.actual_x10k,
         |       m.model_x10k,
         |       CAST(j.actual_x10k - m.model_x10k AS BIGINT) AS delta_x10k
         |FROM j JOIN m ON m.t = j.t
         |ORDER BY j.t""".stripMargin,
    "q374_qini_curve" -> {
      import PreflightQueries.ConvMinPurchases
      s"""WITH users AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS score,
         |         CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |              >= $ConvMinPurchases AS INT) AS BIGINT) AS conv,
         |         CASE WHEN substr(md5(concat('ab8', ':',
         |                CAST(user_id AS VARCHAR))), 1, 1) >= '8'
         |              THEN 'b' ELSE 'a' END AS arm
         |  FROM events GROUP BY user_id),
         |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, user_id) AS rk,
         |             count(*) OVER () AS n_all
         |      FROM users),
         |d AS (SELECT ((rk - 1) * 10) // n_all AS decile,
         |             CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         |             CAST(sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS ct,
         |             CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         |             CAST(sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS cc
         |      FROM r GROUP BY 1),
         |c AS (SELECT decile,
         |             CAST(sum(nt) OVER (ORDER BY decile) AS BIGINT) AS cum_nt,
         |             CAST(sum(ct) OVER (ORDER BY decile) AS BIGINT) AS cum_ct,
         |             CAST(sum(nc) OVER (ORDER BY decile) AS BIGINT) AS cum_nc,
         |             CAST(sum(cc) OVER (ORDER BY decile) AS BIGINT) AS cum_cc
         |      FROM d)
         |SELECT decile, cum_nt, cum_ct, cum_nc, cum_cc,
         |       CAST(CASE WHEN cum_nt = 0 OR cum_nc = 0 THEN 0
         |            ELSE (10000 * (cum_ct * cum_nc - cum_cc * cum_nt))
         |                 // (cum_nt * cum_nc) END AS BIGINT) AS uplift_x10k
         |FROM c ORDER BY decile""".stripMargin
    }
  )
}
