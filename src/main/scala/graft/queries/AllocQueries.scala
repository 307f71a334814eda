package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-70:
  *
  *  - Hamilton apportionment (q339): allocate an integer sampling budget
  *    across sources exactly proportionally — floor quotas + largest-
  *    remainder top-up, so Σ quota == budget EXACTLY (float-rounded
  *    weights drift by ±|sources| docs and integer-div-only floors
  *    under-spend; the largest-remainder method is the standard exact
  *    apportionment);
  *  - longest activity streak (q340): per user, the longest run of
  *    CONSECUTIVE active days (gaps-and-islands: day − row_number is
  *    constant within a run), reported as the streak histogram — the
  *    engagement-depth profile behind retention (q75) that calendar
  *    cohorts can't see.
  *
  * Shapes: apportionment is a |sources|-bounded rank frame; streaks are
  * one distinct (user, day) aggregate + user-partitioned windows —
  * nothing global, nothing corpus².
  */
object AllocQueries {

  /** Total docs the apportionment distributes. */
  val AllocBudget = 1000L

  /** X370 — Hamilton (largest-remainder) apportionment of
    * [[AllocBudget]] across sources by doc count: base = ⌊B·n_s/N⌋,
    * the B − Σbase leftover goes to the largest remainders (ties →
    * source asc). Exact: Σ quota == B, every intermediate integer. */
  def q339_hamilton_quota(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = per.agg(sum("n_docs").as("n_total"))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($AllocBudget * n_docs) div n_total"))
      .withColumn("rem", expr(s"($AllocBudget * n_docs) % n_total"))
    val left = based.agg((lit(AllocBudget) - sum("base")).as("leftover"))
    // |sources|-bounded rank frame
    based.crossJoin(broadcast(left))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source").asc)).cast("long"))
      .select(col("source"), col("n_docs"), col("base"), col("rem"),
        (col("rk") <= col("leftover")).cast("long").as("extra"))
      .withColumn("quota", col("base") + col("extra"))
      .orderBy("source")
  }

  private val DayMs = 86400000L

  /** X371 — longest consecutive-day activity streak per user, as the
    * streak histogram: distinct (user, epoch-day), island id = day −
    * row_number within the user (constant inside a consecutive run),
    * run lengths per island, max per user, count of users per streak
    * length. */
  def q340_activity_streaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_ms div $DayMs").as("day"))
      .distinct()
    val isl = days.withColumn("grp",
      col("day") - row_number().over(
        Window.partitionBy("user_id").orderBy("day")))
    val runs = isl.groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
    val best = runs.groupBy("user_id").agg(max("len").as("streak_days"))
    best.groupBy("streak_days").agg(count(lit(1)).as("n_users"))
      .orderBy("streak_days")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q339_hamilton_quota" -> q339_hamilton_quota,
    "q340_activity_streaks" -> q340_activity_streaks
  )

  val oracles: Map[String, String] = Map(
    "q339_hamilton_quota" ->
      s"""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |            FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per),
         |based AS (SELECT per.source, per.n_docs,
         |                 CAST(($AllocBudget * per.n_docs) // tot.n_total AS BIGINT) AS base,
         |                 CAST(($AllocBudget * per.n_docs) % tot.n_total AS BIGINT) AS rem
         |          FROM per CROSS JOIN tot),
         |lf AS (SELECT CAST($AllocBudget - sum(base) AS BIGINT) AS leftover FROM based),
         |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) AS rk
         |       FROM based)
         |SELECT rk.source, rk.n_docs, rk.base, rk.rem,
         |       CAST(CASE WHEN rk.rk <= lf.leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
         |       CAST(rk.base + CASE WHEN rk.rk <= lf.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
         |FROM rk CROSS JOIN lf
         |ORDER BY source""".stripMargin,
    "q340_activity_streaks" ->
      s"""WITH days AS (SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS day FROM events),
         |isl AS (SELECT user_id, day,
         |               day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
         |        FROM days),
         |runs AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
         |         FROM isl GROUP BY user_id, grp),
         |best AS (SELECT user_id, CAST(max(len) AS BIGINT) AS streak_days
         |         FROM runs GROUP BY user_id)
         |SELECT streak_days, CAST(count(*) AS BIGINT) AS n_users
         |FROM best GROUP BY streak_days
         |ORDER BY streak_days""".stripMargin
  )
}
