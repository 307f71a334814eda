package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational._

/** The batch-relational equivalent of the reference CDC pipeline
  * (SURVEY.md §2.1/§2.3), expressed over the driver `events` table
  * (`user_id` stands in for `transactionId`, `event_type` for `eventCode` —
  * FIXTURES.md §5). Every query has an exact DuckDB oracle in
  * [[CdcQueries.oracles]]; shared constants below keep the two in lockstep.
  */
object CdcQueries {

  /** event_type → view status, mirroring the reference's per-event status
    * vocabulary (`TransactionViewUpsertService.kt:308-659`). */
  val StatusMapping: Seq[(String, String)] = Seq(
    "signup" -> "ACTIVATED",
    "click" -> "AUTHORIZATION_REQUESTED",
    "purchase" -> "CLOSED",
    "view" -> "NOTIFICATION_REQUESTED",
    "error" -> "CLOSURE_ERROR"
  )
  val StatusDefault = "UNKNOWN"

  /** O3 filter values (reference: operationType IN (insert,update,replace)). */
  val OpFilter: Seq[String] = Seq("click", "purchase", "signup")

  /** O5 anti-filter threshold: props.k >= TtlMark plays the `ttl`-marked
    * migration-noise role (`EcommerceTransactionsLogEventsStream.kt:98-121`). */
  val TtlMark = 90L

  /** O2 resume point: 2024-01-15T00:00:00Z. */
  val ResumeMs = 1705276800000L

  /** O17 checkpoint cadence (reference saves every 5 events; scaled for the
    * testdata row counts). */
  val CadenceN = 500

  private[queries] def statusCaseSql(c: String): String =
    "CASE " + StatusMapping.map { case (k, v) => s"WHEN $c = '$k' THEN '$v'" }
      .mkString(" ") + s" ELSE '$StatusDefault' END"

  // ---------------------------------------------------------------- queries

  def q01_filter_project(spark: SparkSession, dir: String): DataFrame =
    filterIn(Tables.events(spark, dir), "event_type", OpFilter)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")

  /** Schema'd JSON decode (`from_json` with an explicit struct, one parse,
    * PERMISSIVE nulls on corrupt rows) — ~2× the generic-path
    * `get_json_object` on this shape, and the idiomatic schema-on-read
    * form. Contract: `props.k` is a JSON number (the testdata's shape);
    * a quoted "k" would need the string-typed schema + cast instead. */
  def q02_ttl_antifilter(spark: SparkSession, dir: String): DataFrame = {
    val propsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .filter(col("k").isNull || col("k") < TtlMark)
      .select(col("event_id"), col("k"))
      .orderBy("event_id")
  }

  /** O6 — typed decode with bad-record skip: 1/97 of records are corrupted
    * (leading brace stripped), the decode drops them and the stream
    * continues (`EcommerceTransactionsLogEventsStream.kt:122-135`). */
  def q03_decode_badrecord(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn(
        "raw",
        when(pmod(col("event_id"), lit(97)) === 0, expr("substring(props, 2)"))
          .otherwise(col("props")))
      .withColumn("k", get_json_object(col("raw"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .select(col("event_id"), col("k"))
      .orderBy("event_id")

  /** O7 — duplicate-delivery dedup: re-deliver every 10th event, keep one. */
  def q04_dedup_redelivery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("ts_ms"), col("event_type"))
    val redelivered = e.union(e.filter(pmod(col("event_id"), lit(10)) === 0))
    redelivered.dropDuplicates("event_id").orderBy("event_id")
  }

  def q05_resume_seek(spark: SparkSession, dir: String): DataFrame =
    resumeSeek(Tables.events(spark, dir), "ts_ms", ResumeMs)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
      .orderBy("event_id")

  def q06_status_mapping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        caseMap(col("event_type"), StatusMapping, StatusDefault).as("status"))
      .orderBy("event_id")

  def q07_argmax_status(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("status", caseMap(col("event_type"), StatusMapping, StatusDefault))
      .groupBy("user_id")
      .agg(
        argMaxPerKey(col("ts_ms"), col("event_id"), col("status"), "status"),
        max(col("ts_ms")).as("last_ts_ms"))
      .orderBy("user_id")

  def q08_last_non_null(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsCents(spark, dir)
      .groupBy("user_id")
      .agg(
        lastNonNullPerKey(
          when(col("event_type") === "purchase", col("value_c")),
          col("ts_ms"), col("event_id"), "last_purchase_c"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** Flagship — full view replay (O7 dedup → O8/O9 dispatch+mapping →
    * O10 arg-max status → O11 last-non-null enrichment → O12 upsert), the
    * batch twin of the reference's `transactions-view` maintenance
    * (`TransactionViewUpsertService.kt:60-124`).
    *
    * ONE data shuffle: the explicit repartition on the key satisfies the
    * dedup window (partitioned by a superset of the key), and the final
    * aggregation (partitioned by the key itself). A naive
    * `dropDuplicates("event_id")` would shuffle on event_id and then
    * reshuffle on user_id — correct, but 2× the network at 100 TB; an
    * event_id's user_id is fixed, so per-key dedup is equivalent. */
  def q09_transactions_view(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsView
    // batch = present(partials(prepared(...))): the SAME aggregation code
    // the streaming twin merges incrementally (EventsViewStream), so the
    // two paths cannot drift.
    EventsView.present(EventsView.partials(EventsView.prepared(
      Tables.eventsCents(spark, dir))))
      .orderBy("user_id")
  }

  def q10_checkpoint_cadence(spark: SparkSession, dir: String): DataFrame =
    checkpointCadence(
      Tables.events(spark, dir).select(col("event_id"), col("ts_ms")),
      Seq(col("ts_ms"), col("event_id")), CadenceN)
      .withColumn("checkpoint_seq", col("checkpoint_seq").cast("long"))
      .select(col("checkpoint_seq"), col("event_id"), col("ts_ms"))
      .orderBy("checkpoint_seq")

  /** As-of join: for every purchase, the latest click of the same user at
    * or before the purchase time (tag-union-scan form, one shuffle on the
    * key — no range-join blowup; ties resolve click-before-purchase,
    * then by event_id). */
  def q28_asof_click(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("is_purchase"), col("event_id"))
    e.withColumn("asof_click_id",
      asofLast(when(col("event_type") === "click", col("event_id")), w))
      .withColumn("asof_click_ts",
        asofLast(when(col("event_type") === "click", col("ts_ms")), w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms", "asof_click_id", "asof_click_ts")
      .orderBy("event_id")
  }

  /** Sessionization with a 30-minute inactivity gap (the session-window
    * machinery the reference lacks, SURVEY §2.2). */
  val SessionGapMs: Long = 30L * 60 * 1000
  def q29_sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir), Seq("user_id"), col("ts_ms"),
      col("event_id"), SessionGapMs)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("session_seq"))
      .orderBy("user_id", "ts_ms", "event_id")

  /** Tumbling-window per-user counts — the batch face of the watermarked
    * streaming aggregation ([[graft.streaming.WindowedCounts]]); the
    * streaming twin is proven convergent in WindowedCountsSpec. */
  def q32_windowed_counts(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.WindowedCounts.tumbling(Tables.eventsCents(spark, dir))
      .orderBy("user_id", "window_start_ms")

  /** Per-session aggregate via `session_window` — the streaming-native
    * sessionization ([[graft.streaming.Sessions]]); the same expression
    * runs batch (here, oracle-checked) and streaming (SessionsSpec proves
    * micro-batch convergence). Gap contract (spec-pinned): splits only on
    * diff > gap — the same rule as q29's per-event labeling. */
  def q41_session_stats(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Sessions.sessionStats(Tables.events(spark, dir))
      .orderBy("user_id", "session_start_ms")

  /** Ordered conversion funnel view→click→purchase per user
    * ([[graft.ops.Relational.funnel]]): one shuffle, chained running-min
    * windows, per-key reduce on the same partitioning. */
  def q39_funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir), Seq("user_id"), col("ts_ms"), col("event_id"),
      Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .withColumn("reached_stages",
        col("t_view").isNotNull.cast("int") +
          col("t_click").isNotNull.cast("int") +
          col("t_purchase").isNotNull.cast("int"))
      .withColumn("conv_ms",
        when(col("t_purchase").isNotNull, col("t_purchase") - col("t_view")))
      .select("user_id", "t_view", "t_click", "t_purchase", "reached_stages", "conv_ms")
      .orderBy("user_id")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> q01_filter_project,
    "q02_ttl_antifilter" -> q02_ttl_antifilter,
    "q03_decode_badrecord" -> q03_decode_badrecord,
    "q04_dedup_redelivery" -> q04_dedup_redelivery,
    "q05_resume_seek" -> q05_resume_seek,
    "q06_status_mapping" -> q06_status_mapping,
    "q07_argmax_status" -> q07_argmax_status,
    "q08_last_non_null" -> q08_last_non_null,
    "q09_transactions_view" -> q09_transactions_view,
    "q10_checkpoint_cadence" -> q10_checkpoint_cadence,
    "q28_asof_click" -> q28_asof_click,
    "q29_sessionize" -> q29_sessionize,
    "q32_windowed_counts" -> q32_windowed_counts,
    "q39_funnel" -> q39_funnel,
    "q41_session_stats" -> q41_session_stats
  )

  // ---------------------------------------------------------------- oracles

  private val inList = OpFilter.map(v => s"'$v'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "q01_filter_project" ->
      s"""SELECT event_id, user_id, event_type FROM events
         |WHERE event_type IN ($inList) ORDER BY event_id""".stripMargin,
    "q02_ttl_antifilter" ->
      s"""SELECT event_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |FROM events
         |WHERE CAST(json_extract_string(props, '$$.k') AS BIGINT) IS NULL
         |   OR CAST(json_extract_string(props, '$$.k') AS BIGINT) < $TtlMark
         |ORDER BY event_id""".stripMargin,
    "q03_decode_badrecord" ->
      s"""WITH raw AS (
         |  SELECT event_id,
         |         CASE WHEN event_id % 97 = 0 THEN substring(props, 2) ELSE props END AS raw
         |  FROM events),
         |parsed AS (
         |  -- CASE is lazily evaluated per row: json_extract_string must not
         |  -- run on malformed rows (DuckDB throws rather than NULLing on
         |  -- valid-prefix-plus-trailing-garbage inputs)
         |  SELECT event_id,
         |         CASE WHEN json_valid(raw)
         |              THEN CAST(json_extract_string(raw, '$$.k') AS BIGINT) END AS k
         |  FROM raw)
         |SELECT event_id, k FROM parsed
         |WHERE k IS NOT NULL
         |ORDER BY event_id""".stripMargin,
    "q04_dedup_redelivery" ->
      """SELECT DISTINCT event_id, epoch_ms(ts) AS ts_ms, event_type
        |FROM (SELECT * FROM events
        |      UNION ALL SELECT * FROM events WHERE event_id % 10 = 0)
        |ORDER BY event_id""".stripMargin,
    "q05_resume_seek" ->
      s"""SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
         |WHERE epoch_ms(ts) >= $ResumeMs ORDER BY event_id""".stripMargin,
    "q06_status_mapping" ->
      s"""SELECT event_id, event_type, ${statusCaseSql("event_type")} AS status
         |FROM events ORDER BY event_id""".stripMargin,
    "q07_argmax_status" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
         |         ${statusCaseSql("event_type")} AS status
         |  FROM events),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn
         |      FROM e)
         |SELECT r.user_id, r.status, m.last_ts_ms
         |FROM r JOIN (SELECT user_id, max(ts_ms) AS last_ts_ms FROM e GROUP BY user_id) m
         |  ON r.user_id = m.user_id
         |WHERE r.rn = 1 ORDER BY r.user_id""".stripMargin,
    "q08_last_non_null" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |         CASE WHEN event_type = 'purchase'
        |              THEN CAST(round(value * 100) AS BIGINT) END AS pv
        |  FROM events)
        |SELECT DISTINCT user_id,
        |  last_value(pv IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts_ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_purchase_c,
        |  count(*) OVER (PARTITION BY user_id) AS n_events
        |FROM e ORDER BY user_id""".stripMargin,
    "q09_transactions_view" ->
      s"""WITH e AS (
         |  SELECT DISTINCT ON (event_id) event_id, user_id, event_type, props,
         |         epoch_ms(ts) AS ts_ms,
         |         CAST(round(value * 100) AS BIGINT) AS value_c,
         |         ${statusCaseSql("event_type")} AS status,
         |         CASE WHEN event_type = 'error'
         |              THEN CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS err_k
         |  FROM events),
         |latest AS (
         |  SELECT user_id, status FROM (
         |    SELECT user_id, status, row_number() OVER
         |      (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn
         |    FROM e) WHERE rn = 1),
         |enrich AS (
         |  SELECT DISTINCT user_id,
         |    last_value(err_k IGNORE NULLS) OVER
         |      (PARTITION BY user_id ORDER BY ts_ms, event_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_error_code
         |  FROM e),
         |agg AS (
         |  SELECT user_id,
         |         max(ts_ms) AS last_processed_event_at,
         |         min(ts_ms) AS creation_date_ms,
         |         CAST(sum(CASE WHEN event_type = 'purchase' THEN value_c ELSE 0 END) AS BIGINT)
         |           AS fee_total_c,
         |         count(*) AS n_events
         |  FROM e GROUP BY user_id)
         |SELECT a.user_id, l.status, a.last_processed_event_at, a.creation_date_ms,
         |       a.fee_total_c, en.last_error_code, a.n_events
         |FROM agg a
         |JOIN latest l ON a.user_id = l.user_id
         |JOIN enrich en ON a.user_id = en.user_id
         |ORDER BY a.user_id""".stripMargin,
    "q10_checkpoint_cadence" ->
      s"""SELECT * FROM (
         |  SELECT row_number() OVER (ORDER BY epoch_ms(ts), event_id) AS checkpoint_seq,
         |         event_id, epoch_ms(ts) AS ts_ms
         |  FROM events)
         |WHERE checkpoint_seq % $CadenceN = 0 ORDER BY checkpoint_seq""".stripMargin,
    "q28_asof_click" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |s AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, is_purchase, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_ms END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, is_purchase, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_ts
        |  FROM e)
        |SELECT event_id, user_id, ts_ms, asof_click_id, asof_click_ts
        |FROM s WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q29_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
         |g AS (
         |  SELECT *,
         |    CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
         |           OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
         |              > $SessionGapMs
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM e)
         |SELECT user_id, event_id, ts_ms,
         |       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |FROM g ORDER BY user_id, ts_ms, event_id""".stripMargin,
    "q32_windowed_counts" ->
      """SELECT user_id,
        |       (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
        |       count(*) AS n_events,
        |       CAST(sum(CASE WHEN event_type = 'purchase'
        |                     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |         AS purchase_c
        |FROM events
        |GROUP BY user_id, (epoch_ms(ts) // 3600000) * 3600000
        |ORDER BY user_id, window_start_ms""".stripMargin,
    "q39_funnel" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_ms END) OVER win AS r_view
        |       FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND r_view IS NOT NULL THEN ts_ms END)
        |         OVER win AS r_click
        |       FROM w1 WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND r_click IS NOT NULL THEN ts_ms END)
        |         OVER win AS r_purchase
        |       FROM w2 WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id,
        |       min(r_view) AS t_view, min(r_click) AS t_click, min(r_purchase) AS t_purchase,
        |       (CAST(min(r_view) IS NOT NULL AS INT) + CAST(min(r_click) IS NOT NULL AS INT)
        |        + CAST(min(r_purchase) IS NOT NULL AS INT)) AS reached_stages,
        |       CASE WHEN min(r_purchase) IS NOT NULL THEN min(r_purchase) - min(r_view) END AS conv_ms
        |FROM w3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q41_session_stats" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
        |                       OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM g)
        |SELECT user_id, min(ts_ms) AS session_start_ms,
        |       max(ts_ms) + 1800000 AS session_end_ms,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, seq ORDER BY user_id, session_start_ms""".stripMargin
  )
}
