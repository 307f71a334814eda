package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-73:
  *
  *  - Kaplan–Meier survival curve (q345): the running-product estimator
  *    S(t) = Π (1 − d/n_risk) over the q328 right-censored life table —
  *    the curve the life table's per-day hazard only samples. The
  *    product is an exact-integer stepwise fold (S ×10⁶, integer div at
  *    each step — deterministic on both engines), run in-plan over ONE
  *    |days|-bounded sorted array (the q169 EWMA `aggregate`-fold
  *    idiom), never a driver loop;
  *  - offline policy replay (q346): counterfactual evaluation of a
  *    context→action policy on logged events (Li et al.'s replay
  *    method): the TRAIN half of the timeline picks each context's
  *    highest-mean-reward action, the EVAL half scores only the events
  *    where the logged action matches the policy's choice — the
  *    leak-safe offline A/B every recommendation change runs before
  *    shipping. Exact integers end-to-end: rewards in cents, means as
  *    integer division, the train/eval split at the integer midpoint
  *    day of the observed span.
  */
object ReplayQueries {

  private val DayMs = 86400000L

  /** KM survival scale: S ×10⁶ (six digits survive ~30 fold steps of
    * truncating division with n_risk in the thousands). */
  val SurvScale = 1000000L

  /** X376 — Kaplan–Meier survival over the signup→purchase span:
    * the q328 life table (n_risk via the |days|-bounded cumulative
    * frame) folded into S(t)×10⁶ with per-step integer division.
    * Censored exits shrink the risk set but never the product. */
  def q345_kaplan_meier(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts_ms")
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_ms").as("s_ts"))
    val per = ev.join(s, "user_id")
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase" && col("ts_ms") >= col("s_ts"),
          col("ts_ms"))).as("p_ts"),
        max("ts_ms").as("last_ts"), min("s_ts").as("s_ts"))
      .select(col("p_ts").isNotNull.cast("long").as("converted"),
        expr(s"(coalesce(p_ts, last_ts) - s_ts) div $DayMs").as("day_offset"))
    val days = per.groupBy("day_offset")
      .agg(sum("converted").as("d"), sum(lit(1L) - col("converted")).as("c"))
    val tot = per.agg(count(lit(1)).as("n_users"))
    // |distinct days|-bounded cumulative frame (q328's shape)
    val w = Window.orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lt = days.crossJoin(broadcast(tot))
      .withColumn("left_before",
        coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .select(col("day_offset"),
        (col("n_users") - col("left_before")).as("n_risk"),
        col("d"), col("c"))
    // ONE |days|-row array in one group — the bounded in-plan fold class
    lt.agg(sort_array(collect_list(struct(
        col("day_offset"), col("n_risk"), col("d"), col("c")))).as("rows"))
      .withColumn("km", expr(
        s"""aggregate(rows,
           |  CAST(array() AS ARRAY<STRUCT<day_offset: BIGINT, n_risk: BIGINT,
           |                               d: BIGINT, c: BIGINT, s_x1m: BIGINT>>),
           |  (acc, x) -> concat(acc, array(named_struct(
           |    'day_offset', x.day_offset, 'n_risk', x.n_risk,
           |    'd', x.d, 'c', x.c,
           |    's_x1m', (CASE WHEN size(acc) = 0 THEN ${SurvScale}L
           |                   ELSE element_at(acc, -1).s_x1m END
           |              * (x.n_risk - x.d)) div x.n_risk))))""".stripMargin))
      .select(explode(col("km")).as("r"))
      .select(col("r.day_offset").as("day_offset"), col("r.n_risk").as("n_risk"),
        col("r.d").as("n_convert"), col("r.c").as("n_censored"),
        col("r.s_x1m").as("survival_x1m"))
      .orderBy("day_offset")
  }

  /** X377 — offline policy replay: context = weekday (day mod 7),
    * action = logged event_type, reward = event value in cents.
    * TRAIN (days before the span midpoint) fits π(ctx) = argmax of the
    * mean reward ×100 (integer div; ties break to the lexicographically
    * first action); EVAL (midpoint onward) reports the replay estimate:
    * mean reward over the events whose logged action equals π(ctx),
    * next to the logging policy's own mean — matched events are an
    * unbiased sample of π's outcomes when logging is context-random. */
  def q346_policy_replay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsCents(spark, dir)
      .select(expr(s"ts_ms div $DayMs").as("day"),
        col("event_type").as("action"), col("value_c"))
      .withColumn("ctx", pmod(col("day"), lit(7L)))
    val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(expr("(d0 + d1 + 1) div 2").as("mid"))
    val tagged = ev.crossJoin(broadcast(span))
    val train = tagged.filter(col("day") < col("mid"))
    val eval0 = tagged.filter(col("day") >= col("mid"))
    val arm = train.groupBy("ctx", "action")
      .agg(count(lit(1)).as("n_train"), sum("value_c").as("sum_train"))
      .withColumn("score_x100", expr("(100 * sum_train) div n_train"))
    // |ctx|×|actions| rows — the rank window is bounded by construction
    val pi = arm.withColumn("rn", row_number().over(
        Window.partitionBy("ctx").orderBy(col("score_x100").desc, col("action").asc)))
      .filter(col("rn") === 1)
      .select(col("ctx"), col("action").as("policy_action"),
        col("score_x100").as("train_score_x100"))
    eval0.join(broadcast(pi), "ctx")
      .groupBy(col("ctx"), col("policy_action"), col("train_score_x100"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("action") === col("policy_action"), 1L).otherwise(0L)).as("n_matched"),
        sum("value_c").as("sum_all"),
        sum(when(col("action") === col("policy_action"), col("value_c"))
          .otherwise(0L)).as("sum_matched"))
      .select(col("ctx"), col("policy_action"), col("train_score_x100"),
        col("n_eval"), col("n_matched"),
        expr("CASE WHEN n_matched = 0 THEN 0L ELSE sum_matched div n_matched END")
          .as("replay_mean_c"),
        expr("sum_all div n_eval").as("logged_mean_c"),
        expr("(CASE WHEN n_matched = 0 THEN 0L ELSE sum_matched div n_matched END) " +
          "- sum_all div n_eval").as("uplift_c"))
      .orderBy("ctx")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q345_kaplan_meier" -> q345_kaplan_meier,
    "q346_policy_replay" -> q346_policy_replay
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q345_kaplan_meier" ->
      s"""WITH RECURSIVE s AS (SELECT user_id, min(epoch_ms(ts)) AS s_ts FROM events
         |           WHERE event_type = 'signup' GROUP BY user_id),
         |per AS (SELECT e.user_id,
         |               min(CASE WHEN e.event_type = 'purchase'
         |                         AND epoch_ms(e.ts) >= s.s_ts
         |                        THEN epoch_ms(e.ts) END) AS p_ts,
         |               max(epoch_ms(e.ts)) AS last_ts, min(s.s_ts) AS s_ts
         |        FROM events e JOIN s USING (user_id)
         |        GROUP BY e.user_id),
         |u AS (SELECT CAST(p_ts IS NOT NULL AS BIGINT) AS converted,
         |             CAST((coalesce(p_ts, last_ts) - s_ts) // $DayMs AS BIGINT) AS day_offset
         |      FROM per),
         |dd AS (SELECT day_offset, CAST(sum(converted) AS BIGINT) AS d,
         |              CAST(sum(1 - converted) AS BIGINT) AS c
         |       FROM u GROUP BY day_offset),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
         |lt AS (SELECT day_offset, d, c,
         |              CAST(n_users - coalesce(sum(d + c) OVER (
         |                ORDER BY day_offset
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |                AS n_risk,
         |              CAST(row_number() OVER (ORDER BY day_offset) AS BIGINT) AS rk
         |       FROM dd CROSS JOIN t),
         |r AS (SELECT day_offset, n_risk, d, c, rk,
         |             ($SurvScale * (n_risk - d)) // n_risk AS s
         |      FROM lt WHERE rk = 1
         |      UNION ALL
         |      SELECT n.day_offset, n.n_risk, n.d, n.c, n.rk,
         |             (r.s * (n.n_risk - n.d)) // n.n_risk
         |      FROM r JOIN lt n ON n.rk = r.rk + 1)
         |SELECT day_offset, n_risk, d AS n_convert, c AS n_censored,
         |       CAST(s AS BIGINT) AS survival_x1m
         |FROM r ORDER BY day_offset""".stripMargin,
    "q346_policy_replay" ->
      """WITH ev AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |                   event_type AS action,
        |                   CAST(round(value * 100) AS BIGINT) AS value_c,
        |                   CAST((epoch_ms(ts) // 86400000) % 7 AS BIGINT) AS ctx
        |            FROM events),
        |span AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
        |train AS (SELECT ev.* FROM ev CROSS JOIN span WHERE day < mid),
        |ev2 AS (SELECT ev.* FROM ev CROSS JOIN span WHERE day >= mid),
        |arm AS (SELECT ctx, action, CAST(count(*) AS BIGINT) AS n_train,
        |               CAST(sum(value_c) AS BIGINT) AS sum_train
        |        FROM train GROUP BY ctx, action),
        |pi AS (SELECT ctx, action AS policy_action,
        |              (100 * sum_train) // n_train AS train_score_x100
        |       FROM (SELECT *, row_number() OVER (PARTITION BY ctx
        |               ORDER BY (100 * sum_train) // n_train DESC, action ASC) AS rn
        |             FROM arm)
        |       WHERE rn = 1),
        |ag AS (SELECT e.ctx, p.policy_action, p.train_score_x100,
        |              CAST(count(*) AS BIGINT) AS n_eval,
        |              CAST(sum(CASE WHEN e.action = p.policy_action THEN 1 ELSE 0 END)
        |                AS BIGINT) AS n_matched,
        |              CAST(sum(e.value_c) AS BIGINT) AS sum_all,
        |              CAST(sum(CASE WHEN e.action = p.policy_action THEN e.value_c
        |                       ELSE 0 END) AS BIGINT) AS sum_matched
        |       FROM ev2 e JOIN pi p ON p.ctx = e.ctx
        |       GROUP BY e.ctx, p.policy_action, p.train_score_x100)
        |SELECT ctx, policy_action, train_score_x100, n_eval, n_matched,
        |       CAST(CASE WHEN n_matched = 0 THEN 0
        |            ELSE sum_matched // n_matched END AS BIGINT) AS replay_mean_c,
        |       CAST(sum_all // n_eval AS BIGINT) AS logged_mean_c,
        |       CAST((CASE WHEN n_matched = 0 THEN 0
        |             ELSE sum_matched // n_matched END)
        |            - sum_all // n_eval AS BIGINT) AS uplift_c
        |FROM ag ORDER BY ctx""".stripMargin
  )
}
