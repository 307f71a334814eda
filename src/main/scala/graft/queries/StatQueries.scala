package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-21 time-series / statistics operators: autocorrelation
  * of the daily traffic signal (ACF), the Mann–Kendall trend test with
  * its Theil–Sen robust slope (the nonparametric complement to q158's
  * OLS), a chi-squared independence audit of the source×lang
  * contingency, and Spearman rank correlation between behavioral
  * metrics.
  *
  * All integer-exact: deviations are computed against the floored mean,
  * every ratio is a scaled BIGINT `div`, and each formula is
  * OVERFLOW-AUDITED for sf1-scale inputs (prescaled quantized forms,
  * stated in each scaladoc, so no intermediate exceeds BIGINT — the
  * quantization is part of the operator's contract and the oracle
  * replays it digit-for-digit). Oracle conventions as the sibling
  * modules: identical aliases, ORDER BY a unique key.
  */
object StatQueries {

  /** ACF lags reported. */
  val AcfMaxLag = 7

  /** X202 — integer autocorrelation function: per event type, the ACF
    * of daily volumes at lags 1..[[AcfMaxLag]] with deviations against
    * the floored per-type mean (`dev_d = c_d − (Σc div n)` — the
    * prescale that keeps `Σ dev·dev` within BIGINT at any sf):
    * `acf_x1e6 = (10⁶·Σ_d dev_d·dev_{d+l}) div Σ_d dev_d²`. The
    * memory-structure read on the q174/q169 traffic signal: a daily
    * cycle shows as a lag-7 peak (weekly), a slow drift as a
    * slowly-decaying ACF — which alarm family (CUSUM vs EWMA) fits is
    * exactly this shape question.
    *
    * Scale: one (type, day) cell pass; the lag self-join and both sums
    * run on |types|·|days| rows (calendar-bounded, never event-bounded). */
  def q186_acf_daily(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    val st = cells.groupBy("event_type")
      .agg(sum("c").as("s"), count(lit(1)).as("n"))
    val dev = cells.join(broadcast(st), "event_type")
      .withColumn("dev", col("c") - expr("s div n"))
      .select(col("event_type"), col("day"), col("dev"))
    val den = dev.groupBy("event_type")
      .agg(sum(col("dev") * col("dev")).as("den"))
    val lagged = dev
      .withColumn("lag", explode(expr(s"sequence(1, $AcfMaxLag)")))
      .withColumn("lday", col("day") + col("lag"))
      .join(dev.toDF("event_type", "lday", "ldev"), Seq("event_type", "lday"))
    lagged.groupBy("event_type", "lag")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("dev") * col("ldev")).as("num"))
      .join(broadcast(den), "event_type")
      .withColumn("acf_x1e6",
        expr("CASE WHEN den = 0 THEN 0 ELSE (1000000 * num) div den END"))
      .select(col("event_type"), col("lag").cast("long").as("lag"),
        col("n_pairs"), col("acf_x1e6"))
      .orderBy("event_type", "lag")
  }

  /** X203 — Mann–Kendall trend test + Theil–Sen slope: per event type
    * over daily volumes, `S = Σ_{i<j} sign(c_j − c_i)` (the
    * nonparametric monotone-trend statistic — no distributional
    * assumption, robust to the spikes that wreck q158's OLS) and the
    * Theil–Sen slope as the LOWER MEDIAN of all pairwise
    * `(1000·(c_j−c_i)) div (d_j−d_i)` — the estimator that shrugs off
    * 29% outliers. Pair space is |days|² per type — calendar-bounded
    * (≈11k pairs per 150-day type), never event-bounded, so the
    * quadratic is a constant at any corpus scale.
    *
    * Determinism: lower median via row_number ordered by (slope, d_i,
    * d_j); sign/div trunc identically in both engines. */
  def q187_mann_kendall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    val pairs = cells.toDF("event_type", "d1", "c1")
      .join(cells.toDF("event_type", "d2", "c2"), "event_type")
      .filter(col("d1") < col("d2"))
      .withColumn("sgn", signum(col("c2") - col("c1")).cast("long"))
      .withColumn("slope_x1000", expr("(1000 * (c2 - c1)) div (d2 - d1)"))
    val stats = pairs.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_pairs"), sum("sgn").as("s_stat"))
    val med = pairs
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("slope_x1000"), col("d1"), col("d2"))).cast("long"))
      .join(stats, "event_type")
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("slope_x1000").as("theil_slope_x1000"))
    val nDays = cells.groupBy("event_type").agg(count(lit(1)).cast("long").as("n_days"))
    nDays.join(stats, "event_type").join(med, "event_type")
      .select("event_type", "n_days", "n_pairs", "s_stat", "theil_slope_x1000")
      .orderBy("event_type")
  }

  /** X204 — chi-squared independence audit of source×lang: over the
    * dense contingency spine (every observed source × every observed
    * lang, zero-filled), the quantized χ² `Σ_cells ((1000·d) div
    * (R·C)) · d div N` with `d = N·O − R·C` — algebraically
    * χ²·1000 with two stated floors, each intermediate ≤ ~10⁴·N²
    * (BIGINT-safe at sf1 where the naive `1000·d²` is not). The "is my
    * language mix the same across sources" gate a mixture designer
    * (q56/q107) checks before weighting per-source; df rides along for
    * the lookup. */
  def q188_chi2_independence(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("source", "lang")
    val o = docs.groupBy("source", "lang").agg(count(lit(1)).cast("long").as("o"))
    val r = docs.groupBy("source").agg(count(lit(1)).cast("long").as("r"))
    val c = docs.groupBy("lang").agg(count(lit(1)).cast("long").as("c"))
    val n = docs.agg(count(lit(1)).cast("long").as("n"))
    val spine = r.crossJoin(c)
      .join(o, Seq("source", "lang"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("d", col("n") * col("o") - col("r") * col("c"))
      .withColumn("contrib_x1000",
        expr("(((1000 * d) div (r * c)) * d) div n"))
    spine.agg(
        max("n").as("n_docs"),
        countDistinct("source").cast("long").as("n_sources"),
        countDistinct("lang").cast("long").as("n_langs"),
        sum("contrib_x1000").as("chi2_x1000"))
      .withColumn("df", (col("n_sources") - 1L) * (col("n_langs") - 1L))
      .select("n_docs", "n_sources", "n_langs", "df", "chi2_x1000")
  }

  /** X205 — Spearman rank correlation between per-user order frequency
    * and monetary total (cents): ranks are the deterministic total
    * order (metric, user_id) assigned by the TWO-PHASE global index
    * (q10/q138 machinery — range-repartition + per-partition offsets;
    * no single-task window ever sees the user table), then
    * `ρ_x1e6 = 10⁶ − (6·Σd²) div (den div 10⁶)` with `den =
    * n(n²−1)` — the prescaled form that stays in BIGINT at sf1 (the
    * naive `10⁶·6·Σd²` does not); below den=10⁶ the exact small-n
    * form is used. The monotone-association read on q168's RFM axes:
    * do frequency and monetary rank users the same way? */
  def q189_spearman_rfm(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("f"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("m"))
    // ONE range shuffle for both independent metric ranks (round-9; the
    // q127/q168 stacking trick): each user contributes (sig=0, f) and
    // (sig=1, m); rank-within-signal = __gidx − sig·N, pivoted back on
    // the user key — replaces two chained globalIndex passes.
    val stacked = u.select(col("o_custkey"), explode(array(
        struct(lit(0L).as("sig"), col("f").as("v")),
        struct(lit(1L).as("sig"), col("m").as("v")))).as("sv"))
      .select(col("sv.sig").as("sig"), col("sv.v").as("v"), col("o_custkey"))
    val both = graft.ops.Relational.globalIndexWithTotal(stacked,
        Seq(col("sig"), col("v"), col("o_custkey")), "__gidx", Some("__tot"))
      .withColumn("__srank", col("__gidx") - col("sig") * expr("__tot div 2"))
      .groupBy("o_custkey")
      .agg(max(when(col("sig") === 0L, col("__srank"))).as("r1"),
        max(when(col("sig") === 1L, col("__srank"))).as("r2"))
      .withColumn("d", col("r1") - col("r2"))
    both.agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("d") * col("d")).as("sum_d2"))
      .withColumn("den", col("n_users") * (col("n_users") * col("n_users") - 1L))
      .withColumn("rho_x1e6", expr(
        """CASE WHEN den = 0 THEN 0
          |WHEN den < 1000000 THEN ((den - 6 * sum_d2) * 1000000) div den
          |ELSE 1000000 - (6 * sum_d2) div (den div 1000000)
          |END""".stripMargin))
      .select("n_users", "sum_d2", "rho_x1e6")
  }

  /** X211 — maximal burst window (Kadane): per event type, the
    * contiguous day span with the largest total deviation above the
    * floored mean (`dev_d = c_d − (Σc div n)`, q186's prescale) — the
    * "when was the surge, exactly" report that turns q174's CUSUM alarm
    * into a bounded incident window. The classic linear-scan recurrence
    * (restart when the running sum goes non-positive; strict improvement
    * ⇒ FIRST maximal window wins) is order-dependent, so it runs as the
    * q169/q174 codegen'd `aggregate` fold over the day-ordered array;
    * the oracle replays the identical recurrence as a recursive CTE.
    *
    * Scale: one (type, day) cell pass; the fold runs on |types| rows of
    * ≤|days| entries — calendar-bounded. */
  def q193_burst_window(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    val st = cells.groupBy("event_type").agg(sum("c").as("s"), count(lit(1)).as("n"))
    cells.join(broadcast(st), "event_type")
      .withColumn("dev", col("c") - expr("s div n"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("dev")))).as("dd"))
      .withColumn("k", expr(
        """aggregate(dd,
          |  named_struct('best', CAST(-4611686018427387904 AS BIGINT),
          |    'bs', CAST(0 AS BIGINT), 'be', CAST(0 AS BIGINT),
          |    'cur', CAST(0 AS BIGINT), 'cs', CAST(0 AS BIGINT)),
          |  (a, x) -> named_struct(
          |    'best', CASE WHEN (CASE WHEN a.cur > 0 THEN a.cur ELSE CAST(0 AS BIGINT) END) + x.dev > a.best
          |                 THEN (CASE WHEN a.cur > 0 THEN a.cur ELSE CAST(0 AS BIGINT) END) + x.dev
          |                 ELSE a.best END,
          |    'bs', CASE WHEN (CASE WHEN a.cur > 0 THEN a.cur ELSE CAST(0 AS BIGINT) END) + x.dev > a.best
          |               THEN (CASE WHEN a.cur > 0 THEN a.cs ELSE x.day END)
          |               ELSE a.bs END,
          |    'be', CASE WHEN (CASE WHEN a.cur > 0 THEN a.cur ELSE CAST(0 AS BIGINT) END) + x.dev > a.best
          |               THEN x.day ELSE a.be END,
          |    'cur', (CASE WHEN a.cur > 0 THEN a.cur ELSE CAST(0 AS BIGINT) END) + x.dev,
          |    'cs', CASE WHEN a.cur > 0 THEN a.cs ELSE x.day END))""".stripMargin))
      .select(col("event_type"), col("k.bs").as("burst_start_day"),
        col("k.be").as("burst_end_day"), col("k.best").as("burst_sum"))
      .orderBy("event_type")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_burst_window" -> q193_burst_window,
    "q186_acf_daily" -> q186_acf_daily,
    "q187_mann_kendall" -> q187_mann_kendall,
    "q188_chi2_independence" -> q188_chi2_independence,
    "q189_spearman_rfm" -> q189_spearman_rfm
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q193_burst_window" ->
      """WITH RECURSIVE cells AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
        |              CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY event_type),
        |rk AS (SELECT cells.event_type, cells.day,
        |              cells.c - (st.s // st.n) AS dev,
        |              CAST(row_number() OVER (PARTITION BY cells.event_type
        |                   ORDER BY cells.day) AS BIGINT) AS rk
        |       FROM cells JOIN st USING (event_type)),
        |r AS (
        |  SELECT event_type, rk, day, dev,
        |         dev AS cur, day AS cs,
        |         dev AS best, day AS bs, day AS be
        |  FROM rk WHERE rk = 1
        |  UNION ALL
        |  SELECT n.event_type, n.rk, n.day, n.dev,
        |         (CASE WHEN r.cur > 0 THEN r.cur ELSE 0 END) + n.dev AS cur,
        |         CASE WHEN r.cur > 0 THEN r.cs ELSE n.day END AS cs,
        |         CASE WHEN (CASE WHEN r.cur > 0 THEN r.cur ELSE 0 END) + n.dev > r.best
        |              THEN (CASE WHEN r.cur > 0 THEN r.cur ELSE 0 END) + n.dev
        |              ELSE r.best END AS best,
        |         CASE WHEN (CASE WHEN r.cur > 0 THEN r.cur ELSE 0 END) + n.dev > r.best
        |              THEN (CASE WHEN r.cur > 0 THEN r.cs ELSE n.day END)
        |              ELSE r.bs END AS bs,
        |         CASE WHEN (CASE WHEN r.cur > 0 THEN r.cur ELSE 0 END) + n.dev > r.best
        |              THEN n.day ELSE r.be END AS be
        |  FROM r JOIN rk n ON n.event_type = r.event_type AND n.rk = r.rk + 1),
        |last AS (SELECT event_type, max(rk) AS mrk FROM r GROUP BY event_type)
        |SELECT r.event_type, CAST(r.bs AS BIGINT) AS burst_start_day,
        |       CAST(r.be AS BIGINT) AS burst_end_day,
        |       CAST(r.best AS BIGINT) AS burst_sum
        |FROM r JOIN last ON last.event_type = r.event_type AND r.rk = last.mrk
        |ORDER BY r.event_type""".stripMargin,
    "q186_acf_daily" ->
      s"""WITH cells AS (
         |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
         |              CAST(count(*) AS BIGINT) AS n
         |       FROM cells GROUP BY event_type),
         |dev AS (SELECT cells.event_type, cells.day,
         |               cells.c - (st.s // st.n) AS dev
         |        FROM cells JOIN st USING (event_type)),
         |den AS (SELECT event_type, CAST(sum(dev * dev) AS BIGINT) AS den
         |        FROM dev GROUP BY event_type),
         |lg AS (SELECT a.event_type, l.lag,
         |              CAST(count(*) AS BIGINT) AS n_pairs,
         |              CAST(sum(a.dev * b.dev) AS BIGINT) AS num
         |       FROM dev a
         |       CROSS JOIN (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag) l
         |       JOIN dev b ON b.event_type = a.event_type
         |                 AND b.day = a.day + l.lag
         |       GROUP BY a.event_type, l.lag)
         |SELECT lg.event_type, CAST(lg.lag AS BIGINT) AS lag, lg.n_pairs,
         |       CAST(CASE WHEN den.den = 0 THEN 0
         |            ELSE (1000000 * lg.num) // den.den END AS BIGINT) AS acf_x1e6
         |FROM lg JOIN den USING (event_type)
         |ORDER BY event_type, lag""".stripMargin,
    "q187_mann_kendall" ->
      """WITH cells AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type, a.day AS d1, b.day AS d2, a.c AS c1, b.c AS c2,
        |             CAST(sign(b.c - a.c) AS BIGINT) AS sgn,
        |             (1000 * (b.c - a.c)) // (b.day - a.day) AS slope_x1000
        |      FROM cells a JOIN cells b ON b.event_type = a.event_type
        |                                AND a.day < b.day),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |              CAST(sum(sgn) AS BIGINT) AS s_stat
        |       FROM p GROUP BY event_type),
        |rk AS (SELECT event_type, slope_x1000,
        |              CAST(row_number() OVER (PARTITION BY event_type
        |                ORDER BY slope_x1000, d1, d2) AS BIGINT) AS rn
        |       FROM p),
        |md AS (SELECT rk.event_type,
        |              CAST(rk.slope_x1000 AS BIGINT) AS theil_slope_x1000
        |       FROM rk JOIN st USING (event_type)
        |       WHERE rk.rn = (st.n_pairs + 1) // 2),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |       FROM cells GROUP BY event_type)
        |SELECT nd.event_type, nd.n_days, st.n_pairs, st.s_stat, md.theil_slope_x1000
        |FROM nd JOIN st USING (event_type) JOIN md USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q188_chi2_independence" ->
      """WITH o AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |           FROM documents GROUP BY source, lang),
        |r AS (SELECT source, CAST(count(*) AS BIGINT) AS r FROM documents GROUP BY source),
        |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |sp AS (
        |  SELECT r.source, c.lang, r.r, c.c, n.n, coalesce(o.o, 0) AS o,
        |         n.n * coalesce(o.o, 0) - r.r * c.c AS d
        |  FROM r CROSS JOIN c CROSS JOIN n
        |  LEFT JOIN o ON o.source = r.source AND o.lang = c.lang)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)
        |            AS BIGINT) AS df,
        |       CAST(sum((((1000 * d) // (r * c)) * d) // n) AS BIGINT) AS chi2_x1000
        |FROM sp""".stripMargin,
    "q189_spearman_rfm" ->
      """WITH u AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS f,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY o_custkey),
        |rk AS (SELECT o_custkey,
        |              CAST(row_number() OVER (ORDER BY f, o_custkey) AS BIGINT) AS r1,
        |              CAST(row_number() OVER (ORDER BY m, o_custkey) AS BIGINT) AS r2
        |       FROM u),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |             CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        |      FROM rk),
        |x AS (SELECT n_users, sum_d2,
        |             n_users * (n_users * n_users - 1) AS den
        |      FROM t)
        |SELECT n_users, sum_d2,
        |       CAST(CASE WHEN den = 0 THEN 0
        |            WHEN den < 1000000 THEN ((den - 6 * sum_d2) * 1000000) // den
        |            ELSE 1000000 - (6 * sum_d2) // (den // 1000000)
        |            END AS BIGINT) AS rho_x1e6
        |FROM x""".stripMargin
  )
}
