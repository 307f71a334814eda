package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-18a monitoring operators: integer CUSUM changepoint
  * detection (the sequential drift alarm — q169's EWMA follows a trend,
  * CUSUM accumulates evidence of a LEVEL SHIFT and resets at zero) and a
  * Benford leading-digit audit (the classic bookkeeping-fraud screen,
  * float-free).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object MonitorQueries {

  /** X189 — integer CUSUM changepoint alarm: per event type over daily
    * volumes in day order, `S_d = max(0, S_{d−1} + c_d − mean − slack)`
    * with slack = mean/10 (Page's one-sided CUSUM: small deviations
    * bleed off, a sustained level shift accumulates linearly), alarm at
    * `S_d > 2·mean`. Catches the slow-ramp regime change that q72's
    * per-window σ-test (memoryless) and q169's EWMA (which FOLLOWS the
    * shift) both under-report. Order-dependent recursion → the q169
    * machinery: per-group codegen'd `aggregate` fold over the
    * day-ordered array, RECURSIVE-CTE oracle; the per-type mean rides
    * the same |types|-row aggregate.
    *
    * Scale: one (type, day) cell pass over events; the fold runs on
    * |types| rows of ≤|days| entries. */
  def q174_cusum_drift(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    val stats = cells.groupBy("event_type")
      .agg(expr("sum(c) div count(*)").as("mean"))
      .withColumn("slack", expr("mean div 10"))
    cells.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("dc"))
      .join(broadcast(stats), Seq("event_type"))
      .withColumn("cs", expr(
        """aggregate(dc, CAST(array() AS ARRAY<BIGINT>),
          |  (acc, x) -> concat(acc, array(greatest(CAST(0 AS BIGINT),
          |    CASE WHEN size(acc) = 0 THEN x.c - mean - slack
          |         ELSE element_at(acc, -1) + x.c - mean - slack END))))""".stripMargin))
      .select(col("event_type"), col("mean"), posexplode(col("dc")).as(Seq("pos", "x")),
        col("cs"))
      .withColumn("cusum", element_at(col("cs"), col("pos") + 1))
      .withColumn("alarm", (col("cusum") > lit(2) * col("mean")).cast("int"))
      .select(col("event_type"), col("x.day").as("day"), col("x.c").as("c"),
        col("cusum"), col("alarm"))
      .orderBy("event_type", "day")
  }

  /** Benford expected leading-digit shares ×1000 (⌊1000·log₁₀(1+1/d)⌋,
    * digits 1–9 — carried as literals so no log crosses an engine). */
  val BenfordX1000 = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  /** X190 — Benford leading-digit audit over order totals: observed
    * leading-digit distribution of `o_totalprice` cents vs the Benford
    * expectation, with the per-digit absolute deviation ×1000 — the
    * bookkeeping/fraud screen (organic multiplicative amounts follow
    * Benford; fabricated or capped ones don't), and a data-quality read
    * next to q89's constraint report. Pure scalar digit extraction (the
    * leading digit of a positive integer is its first decimal char — no
    * float log), one ≤9-row aggregate, 1-row broadcast total. */
  def q175_benford_audit(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
    val total = digits.agg(count(lit(1)).as("n_total"))
    digits.groupBy("digit")
      .agg(count(lit(1)).cast("long").as("n"))
      .crossJoin(broadcast(total))
      .withColumn("share_x1000", expr("(1000 * n) div n_total"))
      .withColumn("benford_x1000",
        element_at(array(BenfordX1000.map(lit): _*), col("digit")))
      .withColumn("abs_dev_x1000", abs(col("share_x1000") - col("benford_x1000")))
      .select("digit", "n", "share_x1000", "benford_x1000", "abs_dev_x1000")
      .orderBy("digit")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q174_cusum_drift" -> q174_cusum_drift,
    "q175_benford_audit" -> q175_benford_audit
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q174_cusum_drift" ->
      """WITH RECURSIVE cells AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type,
        |              CAST(sum(c) // count(*) AS BIGINT) AS mean,
        |              CAST((sum(c) // count(*)) // 10 AS BIGINT) AS slack
        |       FROM cells GROUP BY event_type),
        |rk AS (SELECT cells.event_type, cells.day, cells.c, st.mean, st.slack,
        |              CAST(row_number() OVER (PARTITION BY cells.event_type
        |                   ORDER BY cells.day) AS BIGINT) AS rk
        |       FROM cells JOIN st ON st.event_type = cells.event_type),
        |r AS (
        |  SELECT event_type, rk, day, c, mean,
        |         greatest(CAST(0 AS BIGINT), c - mean - slack) AS cs, slack
        |  FROM rk WHERE rk = 1
        |  UNION ALL
        |  SELECT n.event_type, n.rk, n.day, n.c, n.mean,
        |         greatest(CAST(0 AS BIGINT), r.cs + n.c - n.mean - n.slack), n.slack
        |  FROM r JOIN rk n ON n.event_type = r.event_type AND n.rk = r.rk + 1)
        |SELECT event_type, CAST(day AS BIGINT) AS day, c,
        |       CAST(cs AS BIGINT) AS cusum,
        |       CAST(CASE WHEN cs > 2 * mean THEN 1 ELSE 0 END AS INT) AS alarm
        |FROM r ORDER BY event_type, day""".stripMargin,
    "q175_benford_audit" ->
      s"""WITH d AS (
         |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
         |           AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM orders
         |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d)
         |SELECT digit, CAST(count(*) AS BIGINT) AS n,
         |       CAST((1000 * count(*)) // n_total AS BIGINT) AS share_x1000,
         |       CAST(([${BenfordX1000.mkString(", ")}])[digit] AS BIGINT)
         |         AS benford_x1000,
         |       CAST(abs((1000 * count(*)) // n_total
         |              - ([${BenfordX1000.mkString(", ")}])[digit]) AS BIGINT)
         |         AS abs_dev_x1000
         |FROM d CROSS JOIN tot
         |GROUP BY digit, n_total ORDER BY digit""".stripMargin
  )
}
