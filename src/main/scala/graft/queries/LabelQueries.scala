package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational

/** Round-5 wave-17a supervised-label / attribution operators: leak-safe
  * churn-label generation (the feature-store pass that turns a raw event
  * log into training targets WITHOUT lookahead leakage) and first/last-
  * touch conversion attribution (the marketing twin of the funnel — which
  * channel gets credit for a purchase).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object LabelQueries {

  /** Retention horizon (days): a user is "retained" at day d if active
    * again within (d, d+7]. */
  val ChurnHorizonDays = 7L

  /** X185 — leak-safe churn labels: per (user, active day), the training
    * target "active again within [[ChurnHorizonDays]]" — with the
    * RIGHT-CENSORING guard a leak-free label pass needs: days closer
    * than the horizon to the corpus edge CANNOT be labeled (their window
    * is unobserved) and are excluded, not defaulted to churned — the
    * silent bias most naive label jobs ship. Emitted as the per-day
    * label summary (labeled users, retained, rate ×10⁴) a training run
    * joins back by (user, day).
    *
    * Scale: distinct (user, day) (partial-aggregated) → ONE user-keyed
    * lead window (parallel across users) → day-keyed reduce; the corpus
    * edge rides as a 1-row broadcast. */
  def q172_churn_labels(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val maxDay = active.agg(max("day").as("corpus_max_day"))
    active
      .withColumn("next_day", lead("day", 1).over(w))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("corpus_max_day") - ChurnHorizonDays)
      .withColumn("retained",
        (col("next_day").isNotNull &&
          col("next_day") - col("day") <= ChurnHorizonDays).cast("long"))
      .groupBy("day")
      .agg(count(lit(1)).cast("long").as("n_labeled"),
        sum("retained").cast("long").as("n_retained"))
      .withColumn("retained_x10k", expr("(10000 * n_retained) div n_labeled"))
      .orderBy("day")
  }

  /** X186 — first/last-touch conversion attribution: each purchase
    * credits (a) the FIRST event of its gap-session (first-touch — what
    * acquired the session) and (b) the latest non-purchase event before
    * it in the session (last-touch — what closed; running
    * `last(..., ignoreNulls)` over the preceding frame, so consecutive
    * purchases skip each other and reach the true last touch). The
    * channel comparison table of both models side by side — the
    * attribution read behind every marketing-mix decision on an event
    * log, and the q39 funnel's assignment-of-credit complement.
    *
    * Scale: ONE user-keyed shuffle shared by the session labeling and
    * both window passes (same partitioning); the report is
    * |models|·|channels| rows. */
  def q173_attribution(spark: SparkSession, dir: String): DataFrame = {
    val sess = Relational.sessionize(Tables.events(spark, dir),
      Seq("user_id"), col("ts_ms"), col("event_id"), CdcQueries.SessionGapMs)
    val w = Window.partitionBy("user_id", "session_seq")
      .orderBy(col("ts_ms"), col("event_id"))
    val conv = sess
      .withColumn("first_touch", first("event_type").over(w))
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("event_type") === "purchase")
    conv.groupBy(col("first_touch").as("channel"))
      .agg(count(lit(1)).cast("long").as("n_conversions"))
      .withColumn("model", lit("first_touch"))
      .unionByName(
        conv.filter(col("last_touch").isNotNull)
          .groupBy(col("last_touch").as("channel"))
          .agg(count(lit(1)).cast("long").as("n_conversions"))
          .withColumn("model", lit("last_touch")))
      .select("model", "channel", "n_conversions")
      .orderBy("model", "channel")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_churn_labels" -> q172_churn_labels,
    "q173_attribution" -> q173_attribution
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q172_churn_labels" ->
      s"""WITH active AS (
         |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
         |led AS (SELECT user_id, day,
         |               lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
         |        FROM active),
         |labeled AS (
         |  SELECT day,
         |         CASE WHEN next_day IS NOT NULL
         |               AND next_day - day <= $ChurnHorizonDays THEN 1 ELSE 0 END AS retained
         |  FROM led
         |  WHERE day <= (SELECT max(day) FROM active) - $ChurnHorizonDays)
         |SELECT CAST(day AS BIGINT) AS day,
         |       CAST(count(*) AS BIGINT) AS n_labeled,
         |       CAST(sum(retained) AS BIGINT) AS n_retained,
         |       CAST((10000 * sum(retained)) // count(*) AS BIGINT) AS retained_x10k
         |FROM labeled GROUP BY 1 ORDER BY day""".stripMargin,
    "q173_attribution" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type
         |           FROM events),
         |lagged AS (SELECT *,
         |                  lag(ts_ms) OVER (PARTITION BY user_id
         |                                   ORDER BY ts_ms, event_id) AS prev_ts
         |           FROM e),
         |labeled AS (SELECT *,
         |                   CAST(sum(CASE WHEN prev_ts IS NULL
         |                                 OR ts_ms - prev_ts > ${CdcQueries.SessionGapMs}
         |                            THEN 1 ELSE 0 END)
         |                        OVER (PARTITION BY user_id
         |                              ORDER BY ts_ms, event_id
         |                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |                     AS session_seq
         |            FROM lagged),
         |touched AS (
         |  SELECT *,
         |         first_value(event_type) OVER
         |           (PARTITION BY user_id, session_seq
         |            ORDER BY ts_ms, event_id) AS first_touch,
         |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
         |                    IGNORE NULLS) OVER
         |           (PARTITION BY user_id, session_seq
         |            ORDER BY ts_ms, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
         |  FROM labeled),
         |conv AS (SELECT * FROM touched WHERE event_type = 'purchase')
         |SELECT model, channel, n_conversions FROM (
         |  SELECT 'first_touch' AS model, first_touch AS channel,
         |         CAST(count(*) AS BIGINT) AS n_conversions
         |  FROM conv GROUP BY 2
         |  UNION ALL
         |  SELECT 'last_touch' AS model, last_touch AS channel,
         |         CAST(count(*) AS BIGINT) AS n_conversions
         |  FROM conv WHERE last_touch IS NOT NULL GROUP BY 2)
         |ORDER BY model, channel""".stripMargin
  )
}
