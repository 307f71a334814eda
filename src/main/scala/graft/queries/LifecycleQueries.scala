package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-65 operate-the-pipeline-over-time operators:
  *
  *  - rendezvous rebalance preflight (q327): what fraction of keys MOVES
  *    when the shard count grows 8 → 9, modular hashing vs rendezvous
  *    (highest-random-weight) — the capacity-planning decision table: mod
  *    reshuffles ~N/(N+1) of the corpus, rendezvous exactly the 1/(N+1)
  *    that lands on the new shard (and nothing else — every move's
  *    destination IS the new shard, which the report proves);
  *  - right-censored life table (q328): the conversion risk set with
  *    per-user censoring at last activity — q151's hazard assumes every
  *    signup stays observable forever; this is the survival-analysis
  *    form (users leave the window, the risk set must shrink by their
  *    departure too, or late-day hazards are biased low);
  *  - Cramér's V association profile (q329): the q188 chi² machinery
  *    normalized to the [0,1] association scale and swept over the
  *    schema's categorical pairs — the data-profiling readout ("which
  *    metadata columns are entangled") that decides what can stratify
  *    a split and what cannot (X66's split is only sound on columns
  *    NOT associated with the target).
  *
  * Integer discipline as the siblings: hashes via the q51 md5-prefix
  * idiom, counts exact, the single V = sqrt(·) step is one shared SQL
  * string of IEEE correctly-rounded ops.
  */
object LifecycleQueries {

  /** Shard count before growth; the rebalance adds one. */
  val OldShards = 8

  /** X358 — rendezvous rebalance preflight. Per key (doc_id) and scheme:
    * old and new shard under (a) modular hashing `h mod N` → `h mod N+1`
    * and (b) rendezvous/HRW hashing `argmax_s md5(s:key)` over N and
    * N+1 candidates. Ties (astronomically rare 32-bit collisions)
    * break to the SMALLEST shard id via the packed `w·16 + (15−s)` max,
    * so the argmax is a plain integer `max` — deterministic in both
    * engines. Report per scheme: keys, moved, moved share ×10⁴, and
    * how many moves land on the NEW shard (rendezvous: all of them).
    *
    * Scale shape: the rendezvous arm is one explode to N+1 rows per key
    * (a constant fanout, map-side) and one per-key aggregate; no joins,
    * no windows — at 100 TB this is a single pass over the key column. */
  def q327_rendezvous_rebalance(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.documents(spark, dir).select("doc_id")
    val n1 = OldShards + 1
    // pack envelope (round-11 guard sweep): `w·16 + (15−s)` needs every
    // candidate shard id s < 16 — raising OldShards past 15 would
    // silently alias shards instead of failing. Build-time check: the
    // shard count is a constant, so the envelope is too.
    require(n1 <= 16,
      s"q327: $n1 shard candidates exceed the w*16+(15-s) pack envelope (max 16)")
    val mod = keys
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"))
      .select((col("h") % OldShards).as("s_old"), (col("h") % n1).as("s_new"))
    val rdv = keys
      .select(col("doc_id"), explode(array((0 until n1).map(lit): _*)).as("s"))
      .withColumn("w",
        conv(substring(md5(concat(col("s").cast("string"), lit(":"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("k", col("w") * 16L + (lit(15L) - col("s")))
      .groupBy("doc_id")
      .agg(max(when(col("s") < OldShards, col("k"))).as("k_old"),
        max("k").as("k_new"))
      .select((lit(15L) - pmod(col("k_old"), lit(16L))).as("s_old"),
        (lit(15L) - pmod(col("k_new"), lit(16L))).as("s_new"))
    def report(scheme: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_keys"),
          sum((col("s_old") =!= col("s_new")).cast("long")).as("n_moved"),
          sum((col("s_old") =!= col("s_new") && col("s_new") === OldShards)
            .cast("long")).as("n_to_new"))
        .select(lit(scheme).as("scheme"), col("n_keys"), col("n_moved"),
          expr("(10000 * n_moved) div n_keys").as("moved_x10k"), col("n_to_new"))
    report("mod", mod).unionByName(report("rendezvous", rdv))
      .orderBy("scheme")
  }

  private val DayMs = 86400000L

  /** X359 — right-censored life table of signup → purchase conversion:
    * per user, the event day is the first purchase at/after signup; a
    * user with no purchase is CENSORED at their last observed activity
    * day. Per observed day: events d(t), censorings c(t), risk set
    * n_risk(t) = N − Σ_{u<t}(d+c) (exact — censored users leave the
    * denominator, the bias q151's uncensored hazard carries), and the
    * discrete hazard ×10⁴. The Kaplan–Meier survival curve is the
    * running product of (1 − hazard) over exactly this table.
    *
    * Scale shape: two per-user aggregates over events, then a
    * |distinct days|-bounded spine with one cumulative frame — the
    * corpus is never windowed. */
  def q328_life_table(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts_ms")
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_ms").as("s_ts"))
    val per = ev.join(s, "user_id")
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase" && col("ts_ms") >= col("s_ts"),
          col("ts_ms"))).as("p_ts"),
        max("ts_ms").as("last_ts"), min("s_ts").as("s_ts"))
      .select(col("user_id"),
        col("p_ts").isNotNull.cast("long").as("converted"),
        expr(s"(coalesce(p_ts, last_ts) - s_ts) div $DayMs").as("day_offset"))
    val days = per.groupBy("day_offset")
      .agg(sum("converted").as("n_convert"),
        sum(lit(1L) - col("converted")).as("n_censored"))
    val tot = per.agg(count(lit(1)).as("n_users"))
    // |distinct days|-bounded cumulative frame
    val w = Window.orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, -1)
    days.crossJoin(broadcast(tot))
      .withColumn("left_before",
        coalesce(sum(col("n_convert") + col("n_censored")).over(w), lit(0L)))
      .select(col("day_offset"), (col("n_users") - col("left_before")).as("n_risk"),
        col("n_convert"), col("n_censored"))
      .withColumn("hazard_x10k", expr("(10000 * n_convert) div n_risk"))
      .orderBy("day_offset")
  }

  /** The V = sqrt step — one shared SQL string (floor of a single sqrt
    * chain; every op IEEE correctly-rounded, constants exact doubles). */
  private[queries] val vSql: String =
    "CASE WHEN kmin <= 1 OR chi2_x1000 <= 0 THEN 0 ELSE " +
      "CAST(floor(1e3 * sqrt(CAST(chi2_x1000 AS DOUBLE) / " +
      "(1e3 * CAST(n_rows AS DOUBLE) * (kmin - 1)))) AS BIGINT) END"

  /** One Cramér's V arm over a prepared (a, b) categorical frame —
    * the q188 exact-integer chi² spine, normalized. */
  private def cramersArm(pairName: String, df: DataFrame): DataFrame = {
    val o = df.groupBy("a", "b").agg(count(lit(1)).cast("long").as("o"))
    val r = df.groupBy("a").agg(count(lit(1)).cast("long").as("r"))
    val c = df.groupBy("b").agg(count(lit(1)).cast("long").as("c"))
    val n = df.agg(count(lit(1)).cast("long").as("n_rows"))
    r.crossJoin(c).join(o, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("d", col("n_rows") * col("o") - col("r") * col("c"))
      .withColumn("contrib_x1000", expr("(((1000 * d) div (r * c)) * d) div n_rows"))
      .agg(max("n_rows").as("n_rows"),
        countDistinct("a").cast("long").as("n_a"),
        countDistinct("b").cast("long").as("n_b"),
        sum("contrib_x1000").as("chi2_x1000"))
      .withColumn("kmin", least(col("n_a"), col("n_b")))
      .select(lit(pairName).as("pair"), col("n_rows"), col("n_a"), col("n_b"),
        col("chi2_x1000"), expr(vSql).as("cramers_v_x1000"))
  }

  /** X360 — Cramér's V association profile across the schema's
    * categorical pairs (documents source×lang, orders priority×status,
    * events type×epoch-weekday): chi² per the exact-integer q188 spine,
    * normalized to V = √(χ²/(n·(min(r,c)−1))) ∈ [0,1] so pairs of
    * different dimensions are comparable on one scale. */
  def q329_cramers_v_profile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source").as("a"), col("lang").as("b"))
    val ords = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("a"), col("o_orderstatus").as("b"))
    val evs = Tables.events(spark, dir)
      .select(col("event_type").as("a"),
        pmod(expr(s"ts_ms div $DayMs"), lit(7L)).cast("string").as("b"))
    cramersArm("documents:source_x_lang", docs)
      .unionByName(cramersArm("orders:priority_x_status", ords))
      .unionByName(cramersArm("events:type_x_weekday", evs))
      .orderBy("pair")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q327_rendezvous_rebalance" -> q327_rendezvous_rebalance,
    "q328_life_table" -> q328_life_table,
    "q329_cramers_v_profile" -> q329_cramers_v_profile
  )

  // ---------------------------------------------------------------- oracles

  /** One chi²+V arm in DuckDB; `from` must provide columns a, b. */
  private def armSql(tag: String, pairName: String, from: String): String =
    s"""d$tag AS (SELECT a, b FROM $from),
       |o$tag AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM d$tag GROUP BY a, b),
       |r$tag AS (SELECT a, CAST(count(*) AS BIGINT) AS r FROM d$tag GROUP BY a),
       |c$tag AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM d$tag GROUP BY b),
       |n$tag AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM d$tag),
       |sp$tag AS (
       |  SELECT r.r, c.c, n.n_rows, coalesce(o.o, 0) AS o,
       |         n.n_rows * coalesce(o.o, 0) - r.r * c.c AS d
       |  FROM r$tag r CROSS JOIN c$tag c CROSS JOIN n$tag n
       |  LEFT JOIN o$tag o ON o.a = r.a AND o.b = c.b),
       |v$tag AS (
       |  SELECT '$pairName' AS pair,
       |         CAST(max(n_rows) AS BIGINT) AS n_rows,
       |         (SELECT CAST(count(DISTINCT a) AS BIGINT) FROM d$tag) AS n_a,
       |         (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM d$tag) AS n_b,
       |         CAST(sum((((1000 * d) // (r * c)) * d) // n_rows) AS BIGINT) AS chi2_x1000
       |  FROM sp$tag)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q327_rendezvous_rebalance" -> {
      val n1 = OldShards + 1
      s"""WITH k AS (SELECT doc_id FROM documents),
         |m AS (SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % $OldShards AS BIGINT) AS s_old,
         |             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % $n1 AS BIGINT) AS s_new
         |      FROM k),
         |rw AS (SELECT doc_id, s,
         |              CAST(CAST(concat('0x', substr(md5(concat(CAST(s AS VARCHAR), ':', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) * 16 + (15 - s) AS BIGINT) AS kk
         |       FROM k, unnest(generate_series(0, ${n1 - 1})) AS t(s)),
         |rv AS (SELECT doc_id,
         |              max(CASE WHEN s < $OldShards THEN kk END) AS k_old,
         |              max(kk) AS k_new
         |       FROM rw GROUP BY doc_id),
         |r2 AS (SELECT CAST(15 - (k_old % 16) AS BIGINT) AS s_old,
         |              CAST(15 - (k_new % 16) AS BIGINT) AS s_new FROM rv),
         |rep AS (
         |  SELECT 'mod' AS scheme, CAST(count(*) AS BIGINT) AS n_keys,
         |         CAST(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
         |         CAST(sum(CASE WHEN s_old <> s_new AND s_new = $OldShards THEN 1 ELSE 0 END) AS BIGINT) AS n_to_new
         |  FROM m
         |  UNION ALL
         |  SELECT 'rendezvous', CAST(count(*) AS BIGINT),
         |         CAST(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT),
         |         CAST(sum(CASE WHEN s_old <> s_new AND s_new = $OldShards THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM r2)
         |SELECT scheme, n_keys, n_moved,
         |       CAST((10000 * n_moved) // n_keys AS BIGINT) AS moved_x10k, n_to_new
         |FROM rep ORDER BY scheme""".stripMargin
    },
    "q328_life_table" ->
      s"""WITH s AS (SELECT user_id, min(epoch_ms(ts)) AS s_ts FROM events
         |           WHERE event_type = 'signup' GROUP BY user_id),
         |per AS (SELECT e.user_id,
         |               min(CASE WHEN e.event_type = 'purchase'
         |                         AND epoch_ms(e.ts) >= s.s_ts
         |                        THEN epoch_ms(e.ts) END) AS p_ts,
         |               max(epoch_ms(e.ts)) AS last_ts, min(s.s_ts) AS s_ts
         |        FROM events e JOIN s USING (user_id)
         |        GROUP BY e.user_id),
         |u AS (SELECT CAST(p_ts IS NOT NULL AS BIGINT) AS converted,
         |             CAST((coalesce(p_ts, last_ts) - s_ts) // $DayMs AS BIGINT) AS day_offset
         |      FROM per),
         |dd AS (SELECT day_offset, CAST(sum(converted) AS BIGINT) AS n_convert,
         |              CAST(sum(1 - converted) AS BIGINT) AS n_censored
         |       FROM u GROUP BY day_offset),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
         |cm AS (SELECT *, CAST(coalesce(sum(n_convert + n_censored) OVER (
         |                ORDER BY day_offset
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |              AS left_before
         |       FROM dd CROSS JOIN t)
         |SELECT day_offset, CAST(n_users - left_before AS BIGINT) AS n_risk,
         |       n_convert, n_censored,
         |       CAST((10000 * n_convert) // (n_users - left_before) AS BIGINT) AS hazard_x10k
         |FROM cm ORDER BY day_offset""".stripMargin,
    "q329_cramers_v_profile" -> {
      val arm1 = armSql("1", "documents:source_x_lang",
        "(SELECT source AS a, lang AS b FROM documents)")
      val arm2 = armSql("2", "orders:priority_x_status",
        "(SELECT o_orderpriority AS a, o_orderstatus AS b FROM orders)")
      val arm3 = armSql("3", "events:type_x_weekday",
        s"(SELECT event_type AS a, CAST((epoch_ms(ts) // $DayMs) % 7 AS VARCHAR) AS b FROM events)")
      s"""WITH $arm1,
         |$arm2,
         |$arm3,
         |allv AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3),
         |fin AS (SELECT *, least(n_a, n_b) AS kmin FROM allv)
         |SELECT pair, n_rows, n_a, n_b, chi2_x1000,
         |       $vSql AS cramers_v_x1000
         |FROM fin ORDER BY pair""".stripMargin
    }
  )
}
