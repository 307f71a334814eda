package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.{Intervals, KMeans, Relational}

/** Round-3b analytics surface: temporal tables (SCD2, LOCF gap-fill),
  * n-gram language-model counts, deterministic k-means, Zipf head-coverage,
  * and a mergeable quantile sketch. Same oracle conventions as the sibling
  * modules: integer quantization, md5-free exact arithmetic, identical
  * aliases both sides, ORDER BY a unique key.
  */
object AnalyticsQueries {

  val DayMs = 86400000L
  val TriMinCount = 3
  val KmeansK = 8
  val KmeansIters = 2
  val ZipfTopK = 30
  val Percentiles = Seq(50, 90, 99)

  /** X53 — SCD Type-2 status intervals: each user's event-type history
    * collapsed to change intervals with validity ranges and version
    * numbers — the "what was the state WHEN" table the reference's
    * current-state view (§2.3 q09) cannot answer. One shuffle on user_id;
    * both windows and the run-collapse share it. */
  def q62_scd2_intervals(spark: SparkSession, dir: String): DataFrame =
    Intervals.scd2(Tables.events(spark, dir),
      key = "user_id", ts = "ts_ms", tie = "event_id", attr = "event_type")
      .select(col("user_id"), col("status"),
        col("valid_from").as("valid_from_ms"),
        col("valid_to").as("valid_to_ms"), col("version"))
      .orderBy("user_id", "version")

  /** X54 — LOCF daily gap-fill: per user, a dense daily series carrying
    * the last observed event type forward across silent days — the as-of
    * snapshot grid feature stores and retention dashboards sit on. Grid
    * fan-out is bounded by the calendar span; every window is per-key. */
  def q63_locf_daily(spark: SparkSession, dir: String): DataFrame =
    Intervals.locfDailyFill(Tables.events(spark, dir),
      key = "user_id", tsMs = "ts_ms", tie = "event_id",
      attr = "event_type", dayMs = DayMs)
      .orderBy("user_id", "day_ms")

  /** X55 — trigram language-model counts with Kneser–Ney continuation
    * counts: trigram frequencies (thresholded) joined with the distinct
    * left-context count of each trigram's suffix bigram — the two tables a
    * smoothed n-gram LM interpolates. Two partial-aggregated shuffles over
    * exploded n-grams + one equi-join on the bigram. */
  def q64_trigram_lm(spark: SparkSession, dir: String): DataFrame = {
    val tris = Tables.documents(spark, dir)
      .select(wsTokens(normalizeText(col("text"))).as("t"))
      .select(explode(ngramsAll(col("t"), 3)).as("tri"))
    val suffix = expr("substring(tri, instr(tri, ' ') + 1)")
    val triCounts = tris.groupBy("tri").agg(count(lit(1)).as("n_tri"))
      .filter(col("n_tri") >= TriMinCount)
    val cont = tris
      .select(substring_index(col("tri"), " ", 1).as("w1"), suffix.as("bigram"))
      .groupBy("bigram").agg(countDistinct("w1").as("n_continuations"))
    triCounts.withColumn("bigram", suffix)
      .join(cont, "bigram")
      .select(col("tri"), col("bigram"), col("n_tri"), col("n_continuations"))
      .orderBy("tri")
  }

  /** X56 — deterministic k-means (2 Lloyd rounds, k = 8, hash-spread seed):
    * the IVF-coarse-quantizer training loop, oracle-verified end-to-end.
    * Per round: one broadcast crossJoin (corpus never shuffles) + one
    * k·dim-cell centroid aggregate. */
  def q65_kmeans_assign(spark: SparkSession, dir: String): DataFrame =
    KMeans.lloydAssign(Tables.embeddings(spark, dir), KmeansK, KmeansIters)
      .select(col("id").as("vec_id"), col("cluster"))
      .orderBy("vec_id")

  /** X57 — Zipf head-coverage: the top-`ZipfTopK` corpus tokens with
    * cumulative coverage of total token mass — the "how much does the
    * head explain" report behind vocabulary-size and stopword decisions.
    * Top-k via TakeOrderedAndProject (no global sort), then rank/cumsum by
    * the two-phase global index/cumsum over the k surviving rows. */
  def q66_zipf_coverage(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum("n").as("total_n"))
    val top = vocab.orderBy(col("n").desc, col("token")).limit(ZipfTopK)
    val ranked = Relational.globalIndex(top, Seq(col("n").desc, col("token")), "rank")
    Relational.globalCumSum(ranked, Seq(col("rank")), col("n"), "cum_n")
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("n"), col("cum_n"),
        floor(lit(10000L) * col("cum_n") / col("total_n")).cast("long")
          .as("coverage_x10k"))
      .orderBy("rank")
  }

  /** X58 — mergeable quantile sketch: per event type, approximate p50/p90/
    * p99 of the money column via `percentile_approx` — like the HLL sketch
    * (X50), the partial aggregate is a mergeable sketch, so the shuffle
    * carries one sketch per (type, task) instead of every value; the exact
    * `percentile` (q48) needs the full value multiset per group.
    * The output pairs each sketch estimate's error-contract verdict
    * (`approx_within_1pct`) with the EXACT order statistic at rank
    * ceil(n·p/100) — the exact column replays in DuckDB hash-for-hash, and
    * the verdict column (oracle expects 1) turns the sketch's ≤1% error
    * contract into a driver-verified assertion. AnalyticsSpec additionally
    * pins the raw estimates and the split-merge equality. */
  def q67_quantile_sketch(spark: SparkSession, dir: String): DataFrame = {
    val pArr = array(Percentiles.map(p => lit(p / 100.0)): _*)
    val ev = Tables.eventsCents(spark, dir)
    val approx = ev
      .groupBy("event_type")
      .agg(percentile_approx(col("value_c"), pArr, lit(10000)).as("__qs"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"),
        posexplode(col("__qs")).as(Seq("__pos", "__approx")))
      .select(col("event_type"),
        element_at(array(Percentiles.map(p => lit(p.toLong)): _*),
          col("__pos") + 1).as("p_x100"),
        col("__approx"), col("n_events"))
      .withColumn("__rank", expr("(n_events * p_x100 + 99) div 100"))
    // exact order statistic: the value at ascending rank ceil(n*p/100) —
    // row_number tie order is engine-arbitrary but the VALUE at a given
    // rank is not, so this is cross-engine exact
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value_c")
    val ranked = ev.select(col("event_type"), col("value_c"))
      .withColumn("__rn", row_number().over(w).cast("long"))
    approx.join(ranked,
      approx("event_type") === ranked("event_type") &&
        ranked("__rn") === greatest(lit(1L), approx("__rank")))
      .select(approx("event_type"), col("p_x100"),
        col("value_c").as("exact_value_c"),
        (abs(col("__approx") - col("value_c")) * lit(100L) <= abs(col("value_c")))
          .cast("int").as("approx_within_1pct"),
        col("n_events"))
      .orderBy("event_type", "p_x100")
  }

  /** X60 — rolling event-time frame aggregate: per user, each active day's
    * trailing-7-day spend and activity, via a RANGE frame on the integer
    * day (rows-frames would silently skip calendar gaps). One shuffle on
    * (user, day) for the daily rollup; the frame window reuses the user
    * partitioning. State per task = one frame, never the whole key. */
  def q68_rolling_spend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.eventsCents(spark, dir)
      .withColumn("day", expr(s"ts_ms div ${DayMs}L"))
      .groupBy("user_id", "day")
      .agg(sum("value_c").as("day_value_c"), count(lit(1)).as("day_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    daily
      .select(col("user_id"), (col("day") * lit(DayMs)).as("day_ms"),
        col("day_value_c"), col("day_events"),
        sum("day_value_c").over(w).as("sum_7d_c"),
        count(lit(1)).over(w).as("days_7d"))
      .orderBy("user_id", "day_ms")
  }

  /** X61 — scale-safe decile assignment: documents ranked by (n_chars
    * desc, doc_id) through the two-phase global index, decile = explicit
    * `floor((rank-1)·10 / total)` (NOT `ntile`, whose remainder-spreading
    * is engine-specific) — the global-sort bucketing `ntile(10) OVER
    * (ORDER BY …)` would do on ONE task at any corpus size. */
  def q69_length_deciles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    val total = docs.agg(count(lit(1)).as("total_n"))
    Relational.globalIndex(docs, Seq(col("n_chars").desc, col("doc_id")), "rank")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_chars"), col("rank"),
        (floor((col("rank") - 1) * lit(10L) / col("total_n")) + 1).cast("long")
          .as("decile"))
      .orderBy("rank")
  }

  /** X66 — deterministic train/val/test assignment: md5(seed:id) digit
    * buckets → 80/10/10 split, stable under reruns, retries, engines and
    * corpus growth (a doc's split never depends on other docs — the
    * property random-number splits lack). Pure scalar + one tiny
    * aggregate; the per-split stats are the sanity report a training run
    * starts with. */
  val SplitSeed = "sp1"
  def q70_split_assign(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat_ws(":", lit(SplitSeed), col("doc_id").cast("string")))
    // first 2 hex digits → uniform [0, 256): <204 train (~80%), <230 val
    // (~10%), else test (~10%); integer thresholds keep it exact
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
          .as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_doc_id"))
      .orderBy("split")
  }

  /** X68 — correlated scalar subqueries through the SQL front door:
    * orders beating 1.5× their customer's average order value. Written as
    * the natural correlated form; Catalyst decorrelates both subqueries
    * into aggregate+join (no per-row re-execution, no cartesian — the
    * rewrite IS the scale story, plan-pinned in PlanSpec). Integer-exact:
    * `total·n > 1.5·sum` is compared as `2·total·n > 3·sum` in cents, so
    * no float average crosses an engine boundary. */
  def q71_above_avg_orders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o.o_orderkey,
        |       o.o_custkey,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_c
        |FROM orders_v o
        |WHERE 2 * CAST(round(o.o_totalprice * 100) AS BIGINT) *
        |        (SELECT count(*) FROM orders_v o2
        |         WHERE o2.o_custkey = o.o_custkey)
        |      > 3 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |             FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  /** X69 — anomaly detection over windowed activity: per 6h window, users whose
    * event count exceeds the window's mean + 2σ. The σ-test runs in EXACT
    * integer arithmetic — `c > mean + 2σ` ⟺ `cn − S > 0 ∧ (cn − S)² >
    * 4(n·S2 − S²)` on the window's integer (n, Σc, Σc²) — so no float
    * variance ever crosses an engine boundary, and the per-window stats
    * are an algebraic partial aggregate (the same mergeability that makes
    * it streamable over X18's windowed counts). One shuffle for the
    * per-(window, user) counts; window stats are a tiny broadcast side. */
  val AnomalyWindowMs = 21600000L // 6h: dense enough for outliers at every SF
  def q72_anomalous_windows(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .withColumn("window_ms", expr(s"ts_ms div ${AnomalyWindowMs}L * ${AnomalyWindowMs}L"))
      .groupBy("window_ms", "user_id").agg(count(lit(1)).as("c"))
    val stats = counts.groupBy("window_ms").agg(
      count(lit(1)).as("n"), sum("c").as("s"), sum(col("c") * col("c")).as("s2"))
    counts.join(broadcast(stats), "window_ms")
      .withColumn("__d", col("c") * col("n") - col("s"))
      .where(col("__d") > 0 &&
        col("__d") * col("__d") > lit(4L) * (col("n") * col("s2") - col("s") * col("s")))
      .select(col("window_ms"), col("user_id"), col("c").as("n_events"),
        col("n").as("n_active_users"))
      .orderBy("window_ms", "user_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_anomalous_windows" -> q72_anomalous_windows,
    "q71_above_avg_orders" -> q71_above_avg_orders,
    "q70_split_assign" -> q70_split_assign,
    "q62_scd2_intervals" -> q62_scd2_intervals,
    "q63_locf_daily" -> q63_locf_daily,
    "q64_trigram_lm" -> q64_trigram_lm,
    "q65_kmeans_assign" -> q65_kmeans_assign,
    "q66_zipf_coverage" -> q66_zipf_coverage,
    "q67_quantile_sketch" -> q67_quantile_sketch,
    "q68_rolling_spend" -> q68_rolling_spend,
    "q69_length_deciles" -> q69_length_deciles
  )

  // ---------------------------------------------------------------- oracles

  private[queries] val norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\\s+', ' ', 'g'))"
  private[queries] val normToks =
    s"CASE WHEN len(trim($norm)) = 0 THEN [] ELSE regexp_split_to_array(trim($norm), '\\s+') END"
  private[queries] val quantVec =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** One Lloyd round in DuckDB: assignment CTEs from centroids `cin`,
    * producing assignment `aout`. */
  private def lloydRound(i: Int, cin: String): String =
    s"""p$i AS (SELECT q.id, $cin.cluster, unnest(q.vq) AS a, unnest($cin.cvq) AS b
       |        FROM q, $cin),
       |d$i AS (SELECT id, cluster, CAST(sum((a-b)*(a-b)) AS BIGINT) AS d2
       |        FROM p$i GROUP BY id, cluster),
       |a$i AS (SELECT id, cluster FROM (
       |          SELECT id, cluster,
       |                 row_number() OVER (PARTITION BY id ORDER BY d2, cluster) AS rn
       |          FROM d$i) WHERE rn = 1)""".stripMargin

  /** The full q65 assignment chain (hash-spread seed, `KmeansIters`
    * assignment rounds with one centroid update between) ending in
    * `a2 (id, cluster)` over `q (id, vq)` — shared with the SemDeDup
    * oracle (q95), which dedups within exactly these clusters. */
  private[queries] def lloydAssignSql: String =
    s"""q AS (SELECT vec_id AS id, $quantVec AS vq FROM embeddings),
       |c0 AS (SELECT CAST(row_number() OVER
       |                (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS BIGINT) AS cluster,
       |              vq AS cvq
       |       FROM (SELECT id, vq FROM q
       |             ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $KmeansK)),
       |${lloydRound(1, "c0")},
       |e1 AS (SELECT a1.cluster,
       |              unnest(generate_series(1, len(q.vq))) AS pos, unnest(q.vq) AS v
       |       FROM q JOIN a1 ON q.id = a1.id),
       |m1 AS (SELECT cluster, pos,
       |              CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |       FROM e1 GROUP BY cluster, pos),
       |c1 AS (SELECT cluster, list(cv ORDER BY pos) AS cvq FROM m1 GROUP BY cluster),
       |${lloydRound(2, "c1")}""".stripMargin

  val oracles: Map[String, String] = Map(
    "q62_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type,
        |         lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, ts_ms, event_id, event_type FROM e
        |      WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS status, ts_ms AS valid_from_ms,
        |       CAST(coalesce(lead(ts_ms) OVER
        |         (PARTITION BY user_id ORDER BY ts_ms, event_id), -1) AS BIGINT)
        |         AS valid_to_ms,
        |       CAST(row_number() OVER
        |         (PARTITION BY user_id ORDER BY ts_ms, event_id) AS BIGINT) AS version
        |FROM c ORDER BY user_id, version""".stripMargin,
    "q63_locf_daily" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_ms(ts) // $DayMs AS day, epoch_ms(ts) AS ts_ms,
         |         event_id, event_type
         |  FROM events),
         |d AS (SELECT user_id, day, event_type AS day_last,
         |             count(*) OVER (PARTITION BY user_id, day) AS n,
         |             row_number() OVER (PARTITION BY user_id, day
         |                                ORDER BY ts_ms DESC, event_id DESC) AS rn
         |      FROM e),
         |dl AS (SELECT user_id, day, day_last, n FROM d WHERE rn = 1),
         |s AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY user_id),
         |g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM s),
         |j AS (SELECT g.user_id, g.day, dl.day_last, dl.n
         |      FROM g LEFT JOIN dl ON g.user_id = dl.user_id AND g.day = dl.day)
         |SELECT user_id, CAST(day * $DayMs AS BIGINT) AS day_ms,
         |       last_value(day_last IGNORE NULLS) OVER
         |         (PARTITION BY user_id ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS event_type_filled,
         |       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
         |       CAST(CASE WHEN day_last IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed
         |FROM j ORDER BY user_id, day_ms""".stripMargin,
    "q64_trigram_lm" ->
      s"""WITH d AS (SELECT $normToks AS t FROM documents),
         |tri AS (
         |  SELECT unnest(CASE WHEN len(t) - 2 <= 0 THEN []
         |         ELSE list_transform(generate_series(1, len(t) - 2),
         |                             i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END) AS tri
         |  FROM d),
         |tc AS (SELECT tri, count(*) AS n_tri FROM tri GROUP BY tri
         |       HAVING count(*) >= $TriMinCount),
         |ct AS (SELECT substr(tri, strpos(tri, ' ') + 1) AS bigram,
         |              count(DISTINCT split_part(tri, ' ', 1)) AS n_continuations
         |       FROM tri GROUP BY bigram)
         |SELECT tc.tri, ct.bigram, CAST(tc.n_tri AS BIGINT) AS n_tri,
         |       CAST(ct.n_continuations AS BIGINT) AS n_continuations
         |FROM tc JOIN ct ON substr(tc.tri, strpos(tc.tri, ' ') + 1) = ct.bigram
         |ORDER BY tc.tri""".stripMargin,
    "q65_kmeans_assign" ->
      s"""WITH $lloydAssignSql
         |SELECT id AS vec_id, cluster FROM a2 ORDER BY vec_id""".stripMargin,
    "q66_zipf_coverage" ->
      s"""WITH tok AS (SELECT unnest($normToks) AS token FROM documents),
         |v AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM v),
         |top AS (SELECT token, n,
         |               CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
         |        FROM v ORDER BY n DESC, token LIMIT $ZipfTopK)
         |SELECT rank, token, CAST(n AS BIGINT) AS n,
         |       CAST(sum(n) OVER (ORDER BY rank) AS BIGINT) AS cum_n,
         |       CAST(floor(10000 * CAST(sum(n) OVER (ORDER BY rank) AS BIGINT)
         |                  / total_n) AS BIGINT) AS coverage_x10k
         |FROM top, t ORDER BY rank""".stripMargin,
    // q67: the exact order-statistic column replays exactly; the sketch
    // column is its ≤1% error-contract verdict (oracle asserts 1)
    "q67_quantile_sketch" ->
      s"""WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_c
         |           FROM events),
         |n AS (SELECT event_type, count(*) AS n_events FROM e GROUP BY event_type),
         |p AS (SELECT CAST(unnest([${Percentiles.mkString(", ")}]) AS BIGINT) AS p_x100),
         |t AS (SELECT n.event_type, p.p_x100, n.n_events,
         |             greatest(1, (n.n_events * p.p_x100 + 99) // 100) AS rnk
         |      FROM n, p),
         |r AS (SELECT event_type, value_c,
         |             row_number() OVER (PARTITION BY event_type ORDER BY value_c) AS rn
         |      FROM e)
         |SELECT t.event_type, t.p_x100, r.value_c AS exact_value_c,
         |       CAST(1 AS INT) AS approx_within_1pct, t.n_events
         |FROM t JOIN r ON r.event_type = t.event_type AND r.rn = t.rnk
         |ORDER BY t.event_type, t.p_x100""".stripMargin,
    "q68_rolling_spend" ->
      s"""WITH d AS (
         |  SELECT user_id, epoch_ms(ts) // $DayMs AS day,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_value_c,
         |         count(*) AS day_events
         |  FROM events GROUP BY user_id, day)
         |SELECT user_id, CAST(day * $DayMs AS BIGINT) AS day_ms,
         |       day_value_c, day_events,
         |       CAST(sum(day_value_c) OVER
         |         (PARTITION BY user_id ORDER BY day
         |          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_7d_c,
         |       CAST(count(*) OVER
         |         (PARTITION BY user_id ORDER BY day
         |          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS days_7d
         |FROM d ORDER BY user_id, day_ms""".stripMargin,
    "q72_anomalous_windows" ->
      s"""WITH c AS (
         |  SELECT epoch_ms(ts) // $AnomalyWindowMs * $AnomalyWindowMs AS window_ms, user_id,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY window_ms, user_id),
         |st AS (
         |  SELECT window_ms, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS s2
         |  FROM c GROUP BY window_ms)
         |SELECT c.window_ms, c.user_id, c.c AS n_events, st.n AS n_active_users
         |FROM c JOIN st ON c.window_ms = st.window_ms
         |WHERE c.c * st.n - st.s > 0
         |  AND (c.c * st.n - st.s) * (c.c * st.n - st.s)
         |      > 4 * (st.n * st.s2 - st.s * st.s)
         |ORDER BY c.window_ms, c.user_id""".stripMargin,
    "q71_above_avg_orders" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_c
        |FROM orders o
        |WHERE 2 * CAST(round(o.o_totalprice * 100) AS BIGINT) *
        |        (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |      > 3 * (SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    "q70_split_assign" ->
      s"""WITH s AS (
         |  SELECT doc_id, n_chars,
         |         CAST(concat('0x', substr(md5(concat('$SplitSeed', ':',
         |           CAST(doc_id AS VARCHAR))), 1, 2)) AS BIGINT) AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 204 THEN 'train'
         |            WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(min(doc_id) AS BIGINT) AS min_doc_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q69_length_deciles" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total_n FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |             CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |      FROM documents)
        |SELECT doc_id, n_chars, rank,
        |       CAST(floor((rank - 1) * 10 / total_n) + 1 AS BIGINT) AS decile
        |FROM r, t ORDER BY rank""".stripMargin
  )
}
