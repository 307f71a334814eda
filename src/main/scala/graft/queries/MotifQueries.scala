package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-51 temporal-sequence analytics over the events stream —
  * the time-structure questions adjacent operators don't answer:
  *
  *  - temporal motif counts (q292): how often does the ordered chain
  *    a→b→c occur WITHIN a bounded time span per user — the
  *    time-respecting generalization of q118's adjacent-pair Markov
  *    transitions and q132's exact-path sessions (both miss gapped
  *    chains);
  *  - lagged cross-correlation (q293): does one daily series lead
  *    another, and by how many days — the CROSS-series twin of q186's
  *    autocorrelation;
  *  - binary-segmentation changepoint (q294): WHERE did the daily level
  *    shift — localization, where q174's CUSUM only alarms;
  *  - overdispersion audit (q295): variance-to-mean (Fano ×1000) of
  *    daily counts per type — is arrival "bursty vs Poisson", the
  *    model-choice gate for every rate-based monitor upstream.
  *
  * Scale shapes: q292's triple join is per-user and span-bounded (work
  * = Σ_user events·(events-in-Δ)², the standard temporal-motif bound —
  * never cross-user, never unbounded in time); q293/q294/q295 operate
  * at the DAY grain: one partial-aggregated shuffle over the fact
  * table, then calendar-bounded frames (≤ |days| rows) for the lag
  * join / prefix sums.
  */
object MotifQueries {

  /** X321 — temporal motif counts: ordered event-type chains a→b→c of
    * one user within [[MotifSpanMs]] total span, counted as raw
    * occurrences (not distinct users — the event-level motif census).
    * Ordering is the (ts_ms, event_id) lexicographic tuple, so
    * same-millisecond events chain deterministically. */
  val MotifSpanMs: Long = 72L * 3600 * 1000
  def q292_temporal_motifs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
    def before(x: String, y: String) =
      col(s"$x.ts_ms") < col(s"$y.ts_ms") ||
        (col(s"$x.ts_ms") === col(s"$y.ts_ms") &&
          col(s"$x.event_id") < col(s"$y.event_id"))
    e.as("a")
      .join(e.as("b"), col("a.user_id") === col("b.user_id") && before("a", "b") &&
        // redundant given the c-side span bound (c.ts ≥ b.ts), but prunes
        // the a×b intermediate to the span window instead of the full
        // user history — the term that matters at corpus scale
        col("b.ts_ms") - col("a.ts_ms") <= MotifSpanMs)
      .join(e.as("c"), col("b.user_id") === col("c.user_id") && before("b", "c") &&
        col("c.ts_ms") - col("a.ts_ms") <= MotifSpanMs)
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        col("c.event_type").as("tc"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ta").asc, col("tb").asc, col("tc").asc)
  }

  /** X322 — lagged cross-correlation: Σ x_t·y_{t+lag} between the daily
    * counts of two event types for lags 0..[[CcfMaxLag]], with the
    * per-overlapping-day mean ×1000 (raw dots shrink mechanically as
    * the overlap shortens; the mean makes lags comparable). The peak
    * row answers "purchases follow views by how many days". */
  val CcfX = "view"
  val CcfY = "purchase"
  val CcfMaxLag = 7
  def q293_lagged_crosscorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(
        sum(when(col("event_type") === CcfX, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === CcfY, 1L).otherwise(0L)).as("y"))
    val lags = spark.range(0, CcfMaxLag + 1).select(col("id").as("lag"))
    val a = daily.select(col("day").as("da"), col("x"))
    val b = daily.select(col("day").as("db"), col("y"))
    a.crossJoin(broadcast(lags))
      .join(b, col("db") === col("da") + col("lag"))
      .groupBy("lag")
      .agg(sum(col("x") * col("y")).as("dot"), count(lit(1)).as("n_days"))
      .withColumn("avg_xy_x1000",
        floor(lit(1000L) * col("dot") / col("n_days")).cast("long"))
      .orderBy("lag")
  }

  /** X323 — binary-segmentation changepoint: the split day s
    * maximizing the two-segment variance
    * reduction gain(s) = S₁²/n₁ + S₂²/n₂ − S²/n over daily totals.
    * All sums are exact BIGINTs ≪ 2⁵³, so the double gain is the same
    * IEEE value in both engines and the ×10⁶ floor is hash-stable. The
    * top-[[ChangeTopN]] rows localize the shift q174 only alarms on. */
  val ChangeTopN = 3
  def q294_changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    // |days|-bounded frame: the single-partition window runs over
    // calendar days, never corpus rows
    val w = Window.orderBy("day")
    val idx = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s1", sum("x").over(w))
      .crossJoin(broadcast(daily.agg(
        sum("x").as("s"), count(lit(1)).as("n"))))
    idx.filter(col("i") < col("n"))
      .withColumn("gain_x1m", floor(lit(1000000.0) *
        ((lit(1.0) * col("s1") * col("s1") / col("i")
          + lit(1.0) * (col("s") - col("s1")) * (col("s") - col("s1"))
            / (col("n") - col("i")))
          - lit(1.0) * col("s") * col("s") / col("n"))).cast("long"))
      .select(col("day"), col("x"), col("s1"), col("gain_x1m"))
      .orderBy(col("gain_x1m").desc, col("day").asc)
      .limit(ChangeTopN)
  }

  /** X324 — overdispersion (Fano factor ×1000) of daily counts per
    * event type over ACTIVE days: ⌊1000·(n·Σx² − S²)/(n·S)⌋ — 1000 ≈
    * Poisson, ≫1000 bursty, ≪1000 regular. Integer sums up to the one
    * exact-double division. */
  def q295_overdispersion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("x").as("s"),
        sum(col("x") * col("x")).as("ss"))
      .withColumn("fano_x1000", floor(lit(1000.0) *
        (col("n_days") * col("ss") - col("s") * col("s"))
        / (col("n_days") * col("s"))).cast("long"))
      .select("event_type", "n_days", "s", "fano_x1000")
      .orderBy("event_type")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q292_temporal_motifs" -> q292_temporal_motifs,
    "q293_lagged_crosscorr" -> q293_lagged_crosscorr,
    "q294_changepoint" -> q294_changepoint,
    "q295_overdispersion" -> q295_overdispersion
  )

  val oracles: Map[String, String] = Map(
    "q292_temporal_motifs" ->
      s"""WITH e AS (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
         |                  event_type
         |           FROM events)
         |SELECT a.event_type AS ta, b.event_type AS tb, c.event_type AS tc,
         |       count(*) AS n
         |FROM e a
         |JOIN e b ON a.user_id = b.user_id
         |        AND (a.ts_ms, a.event_id) < (b.ts_ms, b.event_id)
         |JOIN e c ON b.user_id = c.user_id
         |        AND (b.ts_ms, b.event_id) < (c.ts_ms, c.event_id)
         |        AND c.ts_ms - a.ts_ms <= $MotifSpanMs
         |GROUP BY ta, tb, tc
         |ORDER BY n DESC, ta ASC, tb ASC, tc ASC""".stripMargin,
    "q293_lagged_crosscorr" ->
      s"""WITH daily AS (
         |  SELECT CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
         |         CAST(sum(CASE WHEN event_type = '$CcfX' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         |         CAST(sum(CASE WHEN event_type = '$CcfY' THEN 1 ELSE 0 END) AS BIGINT) AS y
         |  FROM events GROUP BY day),
         |lags AS (SELECT CAST(unnest(generate_series(0, $CcfMaxLag)) AS BIGINT) AS lag)
         |SELECT l.lag, CAST(sum(a.x * b.y) AS BIGINT) AS dot, count(*) AS n_days,
         |       CAST(floor(1000 * sum(a.x * b.y) / count(*)) AS BIGINT) AS avg_xy_x1000
         |FROM lags l
         |JOIN daily a ON true
         |JOIN daily b ON b.day = a.day + l.lag
         |GROUP BY l.lag ORDER BY l.lag""".stripMargin,
    "q294_changepoint" ->
      s"""WITH daily AS (
         |  SELECT CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
         |         CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY day),
         |idx AS (
         |  SELECT day, x,
         |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         |         CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS s1,
         |         CAST(sum(x) OVER () AS BIGINT) AS s,
         |         CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM daily)
         |SELECT day, x, s1,
         |       CAST(floor(1000000.0 *
         |         ((1.0 * s1 * s1 / i
         |           + 1.0 * (s - s1) * (s - s1) / (n - i))
         |          - 1.0 * s * s / n)) AS BIGINT) AS gain_x1m
         |FROM idx WHERE i < n
         |ORDER BY gain_x1m DESC, day ASC LIMIT $ChangeTopN""".stripMargin,
    "q295_overdispersion" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, day),
        |st AS (
        |  SELECT event_type, count(*) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ss
        |  FROM daily GROUP BY event_type)
        |SELECT event_type, n_days, s,
        |       CAST(floor(1000.0 * (n_days * ss - s * s) / (n_days * s)) AS BIGINT)
        |         AS fano_x1000
        |FROM st ORDER BY event_type""".stripMargin
  )
}
