package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-92:
  *
  *  - cohort LTV accumulation (q382): cumulative purchase revenue per
  *    signup-week cohort by week-of-life — the revenue twin of q75's
  *    retention counts, and the curve every growth model is fit
  *    against. Exact cents end-to-end, cumulative frames bounded by
  *    the |offsets| grid per cohort;
  *  - pipeline stage-ordering advisor (q383): dedup-then-filter or
  *    filter-then-dedup — the two-stage ordering decision priced from
  *    the corpus's own MEASURED stage selectivities (exact-dup share,
  *    quality-fail share, their overlap) and frozen per-doc stage
  *    costs; q375 orders predicates inside one gate, this orders the
  *    GATES. Survivor count is order-invariant by construction — the
  *    pin that keeps the cost model honest.
  */
object LtvQueries {

  private val DayMs = 86400000L

  /** X416 — cohort LTV: per (signup-week cohort, week offset):
    * cohort size, revenue cents, cumulative revenue, cumulative
    * per-user cents. */
  def q382_cohort_ltv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsCents(spark, dir)
      .select(col("user_id"), col("event_type"), col("value_c"),
        expr(s"ts_ms div $DayMs").as("day"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("s_day"))
    val cohortSize = s.groupBy(expr("s_day div 7").as("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(s, "user_id")
      .filter(col("day") >= col("s_day"))
      .groupBy(expr("s_day div 7").as("cohort_week"),
        expr("(day - s_day) div 7").as("offset_week"))
      .agg(sum("value_c").as("rev_c"))
    // |offsets|-bounded cumulative frame per cohort
    val w = Window.partitionBy("cohort_week").orderBy("offset_week")
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.join(broadcast(cohortSize), "cohort_week")
      .withColumn("cum_rev_c", sum("rev_c").over(w))
      .withColumn("cum_per_user_c", expr("cum_rev_c div n_users"))
      .select("cohort_week", "offset_week", "n_users", "rev_c",
        "cum_rev_c", "cum_per_user_c")
      .orderBy("cohort_week", "offset_week")
  }

  /** Frozen per-doc stage costs: exact dedup = hash + shuffle;
    * quality gate = token metrics + top-token grouping. */
  val DedupCost = 2L
  val FilterCost = 3L

  /** X417 — stage-ordering advisor: measured dup/fail shares and their
    * overlap, then the two orders' modeled costs; survivors are
    * order-invariant. */
  def q383_stage_order(spark: SparkSession, dir: String): DataFrame = {
    import GuardQueries.{RuleMaxPunctX10k, RuleMaxTokLenX100, RuleMaxTokens,
      RuleMinTokLenX100, RuleMinTokens}
    val dup = graft.ops.Dedup.exact(Tables.documents(spark, dir))
      .select(col("doc_id"), col("is_dup").cast("long").as("is_dup"))
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    val fail = Tables.documents(spark, dir)
      .select(col("doc_id") +: metrics: _*)
      .select(col("doc_id"),
        ((col("n_tokens") < RuleMinTokens || col("n_tokens") > RuleMaxTokens) ||
          (col("mean_tok_len_x100") < RuleMinTokLenX100 ||
            col("mean_tok_len_x100") > RuleMaxTokLenX100) ||
          col("punct_per_10k") > RuleMaxPunctX10k).cast("long").as("is_fail"))
    val agg = dup.join(fail, "doc_id")
      .agg(count(lit(1)).as("n"), sum("is_dup").as("n_dup"),
        sum("is_fail").as("n_fail"),
        sum(col("is_dup") * col("is_fail")).as("n_both"))
    agg.select(col("n"), col("n_dup"), col("n_fail"), col("n_both"),
        explode(expr(
          s"""array(
             |  named_struct('stage_order', 'dedup_first',
             |    'cost_units', n * ${DedupCost}L + (n - n_dup) * ${FilterCost}L),
             |  named_struct('stage_order', 'filter_first',
             |    'cost_units', n * ${FilterCost}L + (n - n_fail) * ${DedupCost}L))"""
            .stripMargin)).as("p"))
      .select(col("p.stage_order").as("stage_order"),
        col("p.cost_units").as("cost_units"),
        col("n"), col("n_dup"), col("n_fail"), col("n_both"),
        (col("n") - (col("n_dup") + col("n_fail") - col("n_both"))).as("n_survivors"))
      .orderBy("stage_order")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q382_cohort_ltv" -> q382_cohort_ltv,
    "q383_stage_order" -> q383_stage_order
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{norm, toks}

  val oracles: Map[String, String] = Map(
    "q382_cohort_ltv" ->
      s"""WITH ev AS (SELECT user_id, event_type,
         |                   CAST(round(value * 100) AS BIGINT) AS value_c,
         |                   epoch_ms(ts) // $DayMs AS day
         |            FROM events),
         |s AS (SELECT user_id, min(day) AS s_day FROM ev
         |      WHERE event_type = 'signup' GROUP BY user_id),
         |cs AS (SELECT s_day // 7 AS cohort_week, CAST(count(*) AS BIGINT) AS n_users
         |       FROM s GROUP BY 1),
         |rev AS (SELECT s.s_day // 7 AS cohort_week,
         |               (e.day - s.s_day) // 7 AS offset_week,
         |               CAST(sum(e.value_c) AS BIGINT) AS rev_c
         |        FROM ev e JOIN s USING (user_id)
         |        WHERE e.event_type = 'purchase' AND e.day >= s.s_day
         |        GROUP BY 1, 2),
         |c AS (SELECT r.*, cs.n_users,
         |             CAST(sum(r.rev_c) OVER (PARTITION BY r.cohort_week
         |                    ORDER BY r.offset_week) AS BIGINT) AS cum_rev_c
         |      FROM rev r JOIN cs USING (cohort_week))
         |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
         |       CAST(offset_week AS BIGINT) AS offset_week,
         |       n_users, rev_c, cum_rev_c,
         |       CAST(cum_rev_c // n_users AS BIGINT) AS cum_per_user_c
         |FROM c ORDER BY cohort_week, offset_week""".stripMargin,
    "q383_stage_order" -> {
      import GuardQueries.{RuleMaxPunctX10k, RuleMaxTokLenX100, RuleMaxTokens,
        RuleMinTokLenX100, RuleMinTokens}
      s"""WITH fp AS (SELECT doc_id, md5($norm) AS f FROM documents),
         |dup AS (SELECT doc_id,
         |               CAST(row_number() OVER (PARTITION BY f ORDER BY doc_id) > 1
         |                 AS BIGINT) AS is_dup
         |        FROM fp),
         |m AS (SELECT doc_id,
         |             CAST(len($toks) AS BIGINT) AS n_tokens,
         |             CAST(CASE WHEN length(text) > 0 THEN floor(10000 *
         |                 (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
         |                 / length(text)) ELSE 0 END AS BIGINT) AS punct_per_10k,
         |             CAST(CASE WHEN len($toks) > 0 THEN floor(100 *
         |                 length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks))
         |                 ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |      FROM documents),
         |fl AS (SELECT doc_id,
         |              CAST((n_tokens < $RuleMinTokens OR n_tokens > $RuleMaxTokens)
         |                OR (mean_tok_len_x100 < $RuleMinTokLenX100
         |                    OR mean_tok_len_x100 > $RuleMaxTokLenX100)
         |                OR punct_per_10k > $RuleMaxPunctX10k AS BIGINT) AS is_fail
         |       FROM m),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(d.is_dup) AS BIGINT) AS n_dup,
         |               CAST(sum(f.is_fail) AS BIGINT) AS n_fail,
         |               CAST(sum(d.is_dup * f.is_fail) AS BIGINT) AS n_both
         |        FROM dup d JOIN fl f USING (doc_id))
         |SELECT stage_order, cost_units, n, n_dup, n_fail, n_both,
         |       CAST(n - (n_dup + n_fail - n_both) AS BIGINT) AS n_survivors
         |FROM (
         |  SELECT 'dedup_first' AS stage_order,
         |         CAST(n * $DedupCost + (n - n_dup) * $FilterCost AS BIGINT)
         |           AS cost_units, * FROM agg
         |  UNION ALL
         |  SELECT 'filter_first',
         |         CAST(n * $FilterCost + (n - n_fail) * $DedupCost AS BIGINT), *
         |  FROM agg)
         |ORDER BY stage_order""".stripMargin
    }
  )
}
