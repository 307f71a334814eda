package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational

/** Round-5 wave-14b event-behavior operators: session-leader debounce
  * (collapse per-user event storms to one representative per gap
  * session), per-type volume trend slopes (integer least squares over
  * the daily counts — the drift alarm on traffic mix), and the
  * watermark-lateness audit (how far out-of-order events actually
  * arrive — THE input to choosing `withWatermark` horizons before a
  * streaming rollout).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key. */
object BehaviorQueries {

  /** Debounce gap: an event further than this from its predecessor opens
    * a new session (q29's gap). */
  val DebounceGapMs: Long = 30 * 60 * 1000L
  /** Lateness histogram bucket edges (ms): exact-order, <1 s, <1 min,
    * <1 h, >=1 h. */
  val LatenessEdges: Seq[Long] = Seq(0L, 1000L, 60000L, 3600000L)

  /** X163 — session-leader debounce: keep each gap-session's FIRST event
    * (ties → lowest event_id) and report per user the suppression this
    * buys — the event-storm collapse a notification/trigger pipeline
    * runs so one user action fires one downstream effect, and the exact
    * batch semantics of "first event per session" (the streaming twin is
    * q41's session windows). One user-keyed shuffle shared by the
    * session window and the aggregate. */
  def q154_session_leader(spark: SparkSession, dir: String): DataFrame = {
    val sess = Relational.sessionize(
      Tables.events(spark, dir), Seq("user_id"), col("ts_ms"), col("event_id"),
      DebounceGapMs)
    sess.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("session_seq").as("n_sessions"))
      .withColumn("n_suppressed", col("n_events") - col("n_sessions"))
      .withColumn("suppress_x10k", expr("(10000 * n_suppressed) div n_events"))
      .orderBy("user_id")
  }

  /** X167 — per-type volume trend slope: ordinary-least-squares slope of
    * the daily event counts, computed EXACTLY in integers — slope_x1k =
    * ⌊1000·(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)⌋ with x = day index, y =
    * daily count — the traffic-mix drift alarm (a type whose slope turns
    * negative is a breaking producer; a spike type is an incident). One
    * (type, day) cell pass, a |types|-row closed-form aggregate — the
    * whole regression is two partial-aggregated shuffles, no iteration,
    * no floats until nothing is left to round. */
  def q158_trend_slope(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .withColumn("day", expr("ts_ms div 86400000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val based = daily.groupBy("event_type")
      .agg(min("day").as("day0"))
    daily.join(based, "event_type")
      .withColumn("x", col("day") - col("day0"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_x1k", expr(
        "CASE WHEN n_days * sxx - sx * sx = 0 THEN 0L " +
          "ELSE (1000 * (n_days * sxy - sx * sy)) div (n_days * sxx - sx * sx) END"))
      .select("event_type", "n_days", "sy", "slope_x1k")
      .withColumnRenamed("sy", "n_events")
      .orderBy("event_type")
  }

  /** X169 — watermark-lateness audit: for each event, how far BEHIND the
    * per-user running-max event time it arrived (arrival order =
    * event_id, the log's generation order) — then the corpus-wide
    * lateness histogram. This is the empirical distribution
    * `withWatermark` horizons must cover: the bucket where the mass
    * stops IS the watermark, and the tail above it is the data a tighter
    * horizon would drop (X18/X27/X59's state bounds all price off this
    * number). One user-partitioned running-max window, a |buckets|-row
    * aggregate, 1-row broadcast total. */
  def q160_lateness_audit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = Tables.events(spark, dir)
      .withColumn("runmax", max("ts_ms").over(w))
      .withColumn("late_ms",
        greatest(coalesce(col("runmax") - col("ts_ms"), lit(0L)), lit(0L)))
      .withColumn("bucket", expr(
        s"""CAST(CASE WHEN late_ms = 0 THEN 0 WHEN late_ms < ${LatenessEdges(1)} THEN 1
           |WHEN late_ms < ${LatenessEdges(2)} THEN 2
           |WHEN late_ms < ${LatenessEdges(3)} THEN 3 ELSE 4 END AS BIGINT)""".stripMargin))
    val total = late.agg(count(lit(1)).as("n_total"))
    late.groupBy("bucket")
      .agg(count(lit(1)).as("n_events"), max("late_ms").as("max_late_ms"))
      .crossJoin(broadcast(total))
      .withColumn("share_x10k", expr("(10000 * n_events) div n_total"))
      .select("bucket", "n_events", "max_late_ms", "share_x10k")
      .orderBy("bucket")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_session_leader" -> q154_session_leader,
    "q158_trend_slope" -> q158_trend_slope,
    "q160_lateness_audit" -> q160_lateness_audit
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q154_session_leader" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
         |s AS (SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
         |                      OR ts_ms - lag(ts_ms) OVER w > $DebounceGapMs
         |                     THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
         |g AS (SELECT user_id,
         |             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |               AS session_seq
         |      FROM s)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(max(session_seq) AS BIGINT) AS n_sessions,
         |       CAST(count(*) - max(session_seq) AS BIGINT) AS n_suppressed,
         |       CAST((10000 * (count(*) - max(session_seq))) // count(*) AS BIGINT)
         |         AS suppress_x10k
         |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q158_trend_slope" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |                  CAST(count(*) AS BIGINT) AS y
        |           FROM events GROUP BY event_type, day),
        |b AS (SELECT event_type, min(day) AS day0 FROM d GROUP BY event_type),
        |x AS (SELECT d.event_type, d.day - b.day0 AS x, d.y
        |      FROM d JOIN b USING (event_type)),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS n_events,
        |             CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |      FROM x GROUP BY event_type)
        |SELECT event_type, n_days, n_events,
        |       CAST(CASE WHEN n_days * sxx - sx * sx = 0 THEN 0
        |            ELSE (1000 * (n_days * sxy - sx * n_events))
        |                 // (n_days * sxx - sx * sx) END AS BIGINT) AS slope_x1k
        |FROM a ORDER BY event_type""".stripMargin,
    "q160_lateness_audit" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
         |l AS (SELECT *,
         |             greatest(coalesce(max(ts_ms) OVER (PARTITION BY user_id ORDER BY event_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_ms, 0), 0)
         |               AS late_ms
         |      FROM e),
         |k AS (SELECT CAST(CASE WHEN late_ms = 0 THEN 0 WHEN late_ms < ${LatenessEdges(1)} THEN 1
         |                  WHEN late_ms < ${LatenessEdges(2)} THEN 2
         |                  WHEN late_ms < ${LatenessEdges(3)} THEN 3 ELSE 4 END AS BIGINT) AS bucket,
         |             late_ms
         |      FROM l),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM k)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(max(late_ms) AS BIGINT) AS max_late_ms,
         |       CAST((10000 * count(*)) // t.n_total AS BIGINT) AS share_x10k
         |FROM k CROSS JOIN t GROUP BY bucket, t.n_total ORDER BY bucket""".stripMargin
  )
}
