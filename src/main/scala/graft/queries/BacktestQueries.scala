package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-74:
  *
  *  - rolling-origin forecast backtest (q347): every forecasting knob
  *    (X245 Holt, X181 EWMA, X140 seasonal baseline) needs the
  *    evaluation harness before anyone trusts it — walk the timeline,
  *    issue a 1-step-ahead forecast at every origin from three
  *    deterministic baselines (naive/lag-1, seasonal-naive/lag-7,
  *    expanding mean), score |err| on the NEXT day only. All lag
  *    windows over the dense |days| day spine — bounded, leak-free by
  *    construction (every feature is strictly past);
  *  - exact Shapley conversion attribution (q348): the axiomatic
  *    credit split q217's Markov removal effect approximates — with
  *    |channels| = 4 pre-purchase touch channels the 2⁴ subset lattice
  *    is ENUMERABLE, so Shapley is exact integer arithmetic: v(S) =
  *    converted users whose touch-set ⊆ S, φ(i) = Σ_S s!(n−1−s)!·Δv
  *    over a 16×16 broadcast lattice, denominator n! = 24 deferred to
  *    one final division.
  */
object BacktestQueries {

  private val DayMs = 86400000L

  /** X378 — rolling-origin 1-step backtest of three deterministic
    * forecasters over the daily purchase-count series. Folds start at
    * d0+7 so the seasonal lag exists; the spine is dense (missing days
    * count 0) so lag-k is always day−k. */
  def q347_forecast_backtest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr(s"ts_ms div $DayMs").as("day"))
    val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = span.select(explode(expr("sequence(d0, d1)")).as("day"),
      col("d0"))
    val daily = spine.join(ev.groupBy("day").agg(count(lit(1)).as("c")),
        Seq("day"), "left")
      .na.fill(0L, Seq("c"))
    // |days|-bounded global frame — the dense spine makes lag-k = day-k
    val w = Window.orderBy("day")
    val wPast = w.rowsBetween(Window.unboundedPreceding, -1)
    val folds = daily
      .withColumn("naive", lag("c", 1).over(w))
      .withColumn("snaive", lag("c", 7).over(w))
      .withColumn("cum_past", sum("c").over(wPast))
      .withColumn("emean", expr(
        "CASE WHEN day = d0 THEN CAST(NULL AS BIGINT) ELSE cum_past div (day - d0) END"))
      .filter(col("day") >= col("d0") + 7)
    folds.select(expr(
        """stack(3,
          |  'naive', abs(naive - c),
          |  'seasonal_naive', abs(snaive - c),
          |  'expanding_mean', abs(emean - c)) AS (method, abs_err)""".stripMargin))
      .groupBy("method")
      .agg(count(lit(1)).as("n_folds"), sum("abs_err").as("sum_abs_err"))
      .withColumn("mae_x100", expr("(100 * sum_abs_err) div n_folds"))
      .orderBy("method")
  }

  /** Channel bits, alphabetical: click=1, error=2, signup=4, view=8.
    * Touches count only BEFORE the user's first purchase (the causal
    * window); never-purchasers contribute their full history at conv=0. */
  val ShapleyChannels: Seq[(String, Int)] =
    Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)

  /** X379 — exact Shapley attribution over the 2⁴ touch-set lattice.
    * φ_num is the n!-scaled exact integer (Σ s!(3−s)!·Δv, ≥ 0 because
    * v is monotone); phi_x1m = (10⁶·φ_num) div 24. The whole lattice
    * is ≤16×16 broadcast rows — corpus cost is ONE grouped pass. */
  def q348_shapley_attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts_ms")
    val fp = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "purchase", col("ts_ms"))).as("p_ts"))
    val pre = col("p_ts").isNull || col("ts_ms") < col("p_ts")
    val users = ev.join(fp, "user_id")
      .groupBy("user_id")
      .agg(ShapleyChannels.map { case (ch, bit) =>
          (max(when(col("event_type") === ch && pre, 1L).otherwise(0L)) * bit)
            .as(s"b_$ch")
        }.reduce(_ + _).as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    val masks = users.groupBy("mask").agg(sum("conv").as("n_conv"))
    // 16-row lattice: v(S) = converted users whose touch-set ⊆ S
    val v = spark.range(16).select(col("id").as("s"))
      .join(broadcast(masks),
        expr("(mask & s) = mask"), "left")
      .groupBy("s").agg(coalesce(sum("n_conv"), lit(0L)).as("v"))
    import spark.implicits._
    val chan = ShapleyChannels
      .map { case (ch, bit) => (ch, bit.toLong) }
      .toDF("channel", "bit")
    val withBit = chan.join(broadcast(v), expr("(s & bit) = 0"))
      .join(broadcast(v.select(col("s").as("s2"), col("v").as("v2"))),
        expr("s2 = (s | bit)"))
      .withColumn("pc", expr("(s & 1) + ((s div 2) & 1) + ((s div 4) & 1) + ((s div 8) & 1)"))
      .withColumn("w", expr("CASE pc WHEN 0 THEN 6L WHEN 1 THEN 2L WHEN 2 THEN 2L ELSE 6L END"))
    val touched = users.filter(col("conv") === 1)
      .crossJoin(broadcast(chan))
      .filter(expr("(mask & bit) != 0"))
      .groupBy("channel").agg(count(lit(1)).as("n_touched_conv"))
    withBit.groupBy("channel")
      .agg(sum(col("w") * (col("v2") - col("v"))).as("phi_num"))
      .withColumn("phi_x1m", expr("(1000000 * phi_num) div 24"))
      .join(broadcast(touched), Seq("channel"), "left")
      .na.fill(0L, Seq("n_touched_conv"))
      .select("channel", "phi_num", "phi_x1m", "n_touched_conv")
      .orderBy("channel")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q347_forecast_backtest" -> q347_forecast_backtest,
    "q348_shapley_attribution" -> q348_shapley_attribution
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q347_forecast_backtest" ->
      """WITH ev AS (SELECT epoch_ms(ts) // 86400000 AS day
        |            FROM events WHERE event_type = 'purchase'),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |spine AS (SELECT unnest(generate_series(d0, d1)) AS day, d0 FROM span),
        |daily AS (SELECT s.day, s.d0,
        |                 CAST(coalesce(c.c, 0) AS BIGINT) AS c
        |          FROM spine s LEFT JOIN (
        |            SELECT day, count(*) AS c FROM ev GROUP BY day) c USING (day)),
        |f AS (SELECT day, d0, c,
        |             lag(c, 1) OVER (ORDER BY day) AS naive,
        |             lag(c, 7) OVER (ORDER BY day) AS snaive,
        |             CASE WHEN day = d0 THEN NULL
        |                  ELSE sum(c) OVER (ORDER BY day
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                       // (day - d0) END AS emean
        |      FROM daily),
        |folds AS (SELECT * FROM f WHERE day >= d0 + 7),
        |errs AS (SELECT 'naive' AS method, abs(naive - c) AS abs_err FROM folds
        |         UNION ALL
        |         SELECT 'seasonal_naive', abs(snaive - c) FROM folds
        |         UNION ALL
        |         SELECT 'expanding_mean', abs(emean - c) FROM folds)
        |SELECT method, CAST(count(*) AS BIGINT) AS n_folds,
        |       CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
        |       CAST((100 * sum(abs_err)) // count(*) AS BIGINT) AS mae_x100
        |FROM errs GROUP BY method ORDER BY method""".stripMargin,
    "q348_shapley_attribution" ->
      """WITH fp AS (SELECT user_id,
        |                   min(CASE WHEN event_type = 'purchase'
        |                            THEN epoch_ms(ts) END) AS p_ts
        |            FROM events GROUP BY user_id),
        |users AS (SELECT e.user_id,
        |    CAST(  max(CASE WHEN event_type = 'click'
        |                AND (p_ts IS NULL OR epoch_ms(ts) < p_ts) THEN 1 ELSE 0 END)
        |       + 2*max(CASE WHEN event_type = 'error'
        |                AND (p_ts IS NULL OR epoch_ms(ts) < p_ts) THEN 1 ELSE 0 END)
        |       + 4*max(CASE WHEN event_type = 'signup'
        |                AND (p_ts IS NULL OR epoch_ms(ts) < p_ts) THEN 1 ELSE 0 END)
        |       + 8*max(CASE WHEN event_type = 'view'
        |                AND (p_ts IS NULL OR epoch_ms(ts) < p_ts) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS mask,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events e JOIN fp USING (user_id) GROUP BY e.user_id),
        |masks AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS n_conv
        |          FROM users GROUP BY mask),
        |lattice AS (SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT) AS s),
        |v AS (SELECT s, CAST(coalesce(sum(n_conv), 0) AS BIGINT) AS v
        |      FROM lattice LEFT JOIN masks ON (mask & s) = mask GROUP BY s),
        |chan AS (SELECT 'click' AS channel, CAST(1 AS BIGINT) AS bit
        |         UNION ALL SELECT 'error', 2 UNION ALL SELECT 'signup', 4
        |         UNION ALL SELECT 'view', 8),
        |terms AS (SELECT c.channel, v1.s, v1.v, v2.v AS v2,
        |                 (v1.s & 1) + ((v1.s // 2) & 1) + ((v1.s // 4) & 1)
        |                   + ((v1.s // 8) & 1) AS pc
        |          FROM chan c JOIN v v1 ON (v1.s & c.bit) = 0
        |          JOIN v v2 ON v2.s = (v1.s | c.bit)),
        |phi AS (SELECT channel,
        |               CAST(sum((CASE pc WHEN 0 THEN 6 WHEN 1 THEN 2
        |                         WHEN 2 THEN 2 ELSE 6 END) * (v2 - v))
        |                 AS BIGINT) AS phi_num
        |        FROM terms GROUP BY channel),
        |touched AS (SELECT c.channel, CAST(count(*) AS BIGINT) AS n_touched_conv
        |            FROM users u JOIN chan c ON (u.mask & c.bit) != 0
        |            WHERE u.conv = 1 GROUP BY c.channel)
        |SELECT p.channel, p.phi_num,
        |       CAST((1000000 * p.phi_num) // 24 AS BIGINT) AS phi_x1m,
        |       CAST(coalesce(t.n_touched_conv, 0) AS BIGINT) AS n_touched_conv
        |FROM phi p LEFT JOIN touched t USING (channel)
        |ORDER BY channel""".stripMargin
  )
}
