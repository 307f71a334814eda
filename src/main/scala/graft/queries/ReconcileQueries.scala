package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-19 reconciliation/time-window operators: view
  * reconciliation (what did the latest log suffix DO to the materialized
  * view — the reference's core artifact diffed across two replay
  * horizons) and rolling 7-day distinct users via mergeable HLL sketches
  * with an exact companion (the sliding-window face of q156's daily
  * sketch tile).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object ReconcileQueries {

  /** Days held out of the "old" replay horizon. */
  val ReconcileLagDays = 1L

  /** X194 — view reconciliation across replay horizons: build the
    * transactions-view (q09's EXACT aggregation code —
    * [[graft.streaming.EventsViewStream]] shared path) once over the log
    * WITHOUT its last [[ReconcileLagDays]] day(s) and once over the full
    * log, full-outer the two snapshots on the key and classify every
    * key: `new` (absent before), `status_changed`, `advanced_only`
    * (status stable, watermark moved — enrichment-only events), or
    * `unchanged`. The per-class census answers the CDC operator's daily
    * question — "what did yesterday's events do to the view" — as a
    * query (X62's `snapshotDiff` is the storage-side twin over persisted
    * snapshots; this derives both sides from the log).
    *
    * Scale: the two replays share the events scan (one filter apart);
    * each is the q09 single-shuffle aggregation; the diff joins two
    * |keys|-row frames co-partitioned on the key. Append-only log ⇒ no
    * `removed` class (purges are X62's department). */
  def q179_view_reconcile(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsView
    def view(ev: DataFrame): DataFrame =
      EventsView.present(EventsView.partials(EventsView.prepared(ev)))
        .select(col("user_id"), col("status"), col("last_processed_event_at"))
    val ev = Tables.eventsCents(spark, dir)
    val maxDay = ev.agg(max(expr("ts_ms div 86400000")).as("corpus_max_day"))
    val old = view(ev.crossJoin(broadcast(maxDay))
      .filter(expr(s"ts_ms div 86400000 <= corpus_max_day - $ReconcileLagDays"))
      .drop("corpus_max_day"))
    val neu = view(ev)
    neu.as("n").join(old.as("o"), Seq("user_id"), "left")
      .withColumn("op",
        when(col("o.status").isNull, "new")
          .when(col("n.status") =!= col("o.status"), "status_changed")
          .when(col("n.last_processed_event_at") =!= col("o.last_processed_event_at"),
            "advanced_only")
          .otherwise("unchanged"))
      .groupBy("op")
      .agg(count(lit(1)).cast("long").as("n_keys"))
      .orderBy("op")
  }

  /** Rolling window width (days). */
  val RollWindowDays = 7

  /** X195 — rolling 7-day distinct users: per day, the EXACT distinct
    * users active in the trailing [[RollWindowDays]] days next to the
    * mergeable-HLL estimate's 5% error-contract verdict. Exact rolling
    * distinct does NOT decompose (daily distincts don't add), so the
    * exact side fans each (user, day) out to the ≤7 windows it serves —
    * at corpus scale that explode is the scalable path precisely
    * because it shuffles (user, window) pairs, never re-scanning days —
    * while the sketch side unions 7 DAILY sketches per window (q61's
    * mergeability on a time axis: sketches add, sets don't; the daily
    * sketch table is the only state a production tile needs).
    *
    * Scale: distinct (user, day) partial-aggregates first (the big
    * reduction), both paths ride the bounded ×7 fan-out after it. */
  def q180_rolling_distinct(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day")).distinct()
    val spine = ud.select("day").distinct()
    val fan = ud.withColumn("wd",
        explode(expr(s"sequence(day, day + ${RollWindowDays - 1})")))
      .join(spine.withColumnRenamed("day", "wd"), Seq("wd"), "left_semi")
    val exact = fan.groupBy("wd")
      .agg(countDistinct("user_id").cast("long").as("exact_distinct_7d"))
    val daily = ud.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    val est = daily.withColumn("wd",
        explode(expr(s"sequence(day, day + ${RollWindowDays - 1})")))
      .join(spine.withColumnRenamed("day", "wd"), Seq("wd"), "left_semi")
      .groupBy("wd")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    exact.join(est, Seq("wd"))
      .withColumn("est_ok",
        (abs(col("est") - col("exact_distinct_7d")) * 20 <= col("exact_distinct_7d"))
          .cast("int"))
      .select(col("wd").as("day"), col("exact_distinct_7d"), col("est_ok"))
      .orderBy("day")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_view_reconcile" -> q179_view_reconcile,
    "q180_rolling_distinct" -> q180_rolling_distinct
  )

  // ---------------------------------------------------------------- oracles

  /** The q09 view chain (status + watermark only), CTE-prefixed with
    * `a`, over `events` rows matching `where`. */
  private def viewSql(a: String, where: String): String =
    s"""${a}e AS (
       |  SELECT DISTINCT ON (event_id) event_id, user_id, epoch_ms(ts) AS ts_ms,
       |         ${CdcQueries.statusCaseSql("event_type")} AS status
       |  FROM events $where),
       |${a}latest AS (
       |  SELECT user_id, status FROM (
       |    SELECT user_id, status, row_number() OVER
       |      (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn
       |    FROM ${a}e) WHERE rn = 1),
       |${a}v AS (
       |  SELECT g.user_id, l.status, g.lp AS last_processed_event_at
       |  FROM (SELECT user_id, max(ts_ms) AS lp FROM ${a}e GROUP BY user_id) g
       |  JOIN ${a}latest l ON l.user_id = g.user_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q179_view_reconcile" ->
      s"""WITH ${viewSql("n", "")},
         |${viewSql("o",
            s"WHERE epoch_ms(ts) // 86400000 <= (SELECT max(epoch_ms(ts) // 86400000) FROM events) - $ReconcileLagDays")}
         |SELECT op, CAST(count(*) AS BIGINT) AS n_keys FROM (
         |  SELECT CASE WHEN o.status IS NULL THEN 'new'
         |              WHEN n.status <> o.status THEN 'status_changed'
         |              WHEN n.last_processed_event_at <> o.last_processed_event_at
         |                THEN 'advanced_only'
         |              ELSE 'unchanged' END AS op
         |  FROM nv n LEFT JOIN ov o ON o.user_id = n.user_id)
         |GROUP BY op ORDER BY op""".stripMargin,
    "q180_rolling_distinct" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
         |spine AS (SELECT DISTINCT day FROM ud),
         |fan AS (
         |  SELECT f.user_id, f.wd FROM (
         |    SELECT user_id,
         |           unnest(generate_series(day, day + ${RollWindowDays - 1})) AS wd
         |    FROM ud) f
         |  JOIN spine s ON s.day = f.wd)
         |SELECT CAST(wd AS BIGINT) AS day,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct_7d,
         |       CAST(1 AS INT) AS est_ok
         |FROM fan GROUP BY wd ORDER BY day""".stripMargin
  )
}
