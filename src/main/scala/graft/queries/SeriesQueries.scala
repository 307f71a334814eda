package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-16b series/design operators: integer EWMA smoothing (the
  * order-dependent RECURSIVE aggregate — a different beast from every
  * associative aggregate on the board, oracle'd by a recursive CTE),
  * Neyman allocation for stratified sampling design, and the multiset set
  * operators (INTERSECT ALL / EXCEPT ALL — the bag-semantics half q83's
  * distinct set ops leave open).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object SeriesQueries {

  /** X181 — integer EWMA traffic baseline: per event type over its daily
    * volumes in day order, `s₁ = c₁; s_d = (3·s_{d−1} + c_d) div 4`
    * (α = 1/4, integer-floored — every intermediate exact), plus the
    * surge flag `2·c_d > 3·s_{d−1}` (today ≥ ~1.5× baseline). The
    * recursion is inherently order-dependent — not expressible as an
    * associative aggregate — so the engine computes it as a per-group
    * in-memory fold over the day-ordered array (`aggregate` higher-order
    * function, codegen'd; array length = active days per type, a few
    * hundred rows at any corpus scale) and the oracle replays it as a
    * RECURSIVE CTE. The q134 seasonal-median baseline is level-based;
    * this is the trend-following one.
    *
    * Scale: one (type, day) cell aggregate (partial, map-side) — the
    * only pass over the events; the fold runs over |types| rows of
    * ≤|days| entries. Nothing quadratic, no window over events.
    */
  def q169_ewma_baseline(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    cells.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("dc"))
      .withColumn("ew", expr(
        """aggregate(dc, CAST(array() AS ARRAY<BIGINT>),
          |  (acc, x) -> concat(acc, array(
          |    CASE WHEN size(acc) = 0 THEN x.c
          |         ELSE (3 * element_at(acc, -1) + x.c) div 4 END)))""".stripMargin))
      .select(col("event_type"), col("ew"),
        posexplode(col("dc")).as(Seq("pos", "x")))
      .withColumn("ewma", element_at(col("ew"), col("pos") + 1))
      .withColumn("surge",
        when(col("pos") === 0, 0)
          .otherwise((lit(2) * col("x.c") > lit(3) * element_at(col("ew"), col("pos")))
            .cast("int")).cast("int"))
      .select(col("event_type"), col("x.day").as("day"), col("x.c").as("c"),
        col("ewma"), col("surge"))
      .orderBy("event_type", "day")
  }

  /** Sample budget the Neyman allocation distributes. */
  val NeymanBudget = 10000L

  /** X182 — Neyman allocation (stratified sampling design): to estimate
    * mean doc length under a fixed label budget, the variance-optimal
    * per-stratum allocation is n_h ∝ N_h·S_h (size × std dev). Exact
    * integer pipeline: population variance `⌊(n·Σx²−(Σx)²)/n²⌋` (the
    * q69/q115 identity), S_h = ⌊√var⌋ (IEEE sqrt is correctly rounded —
    * engine-exact on integers, the q107 floor(sqrt) precedent), weight =
    * N_h·S_h, share ×10⁴ and the allocated count for [[NeymanBudget]].
    * The design read BEFORE q25's stratified take: q25 executes a
    * per-stratum quota; this computes what the quota SHOULD be.
    *
    * Scale: one conditional-aggregate pass over documents → |sources|
    * rows; the weight total rides as a 1-row broadcast. */
  def q170_neyman_allocation(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("sx"),
        sum(col("n_chars") * col("n_chars")).cast("long").as("sx2"))
      .withColumn("var_nchars",
        expr("(n_docs * sx2 - sx * sx) div (n_docs * n_docs)"))
      .withColumn("sd_nchars", floor(sqrt(col("var_nchars"))).cast("long"))
      .withColumn("weight", col("n_docs") * col("sd_nchars"))
    val total = stats.agg(sum("weight").as("w_total"))
    stats.crossJoin(broadcast(total))
      .withColumn("alloc_share_x10k", expr("(10000 * weight) div w_total"))
      .withColumn("n_alloc", expr(s"($NeymanBudget * weight) div w_total"))
      .select("source", "n_docs", "var_nchars", "sd_nchars",
        "alloc_share_x10k", "n_alloc")
      .orderBy("source")
  }

  /** X183 — multiset set operators (INTERSECT ALL / EXCEPT ALL): bag
    * comparison of per-user event-type occurrences between the even-day
    * and odd-day halves of the log — `INTERSECT ALL` keeps each row
    * min(m_A, m_B) times, `EXCEPT ALL` max(0, m_A−m_B) times, the
    * multiplicity semantics q83's DISTINCT set ops discard (a user with
    * 5 clicks in A and 2 in B intersects twice — distinct INTERSECT says
    * once). Catalyst rewrites both into count-aggregate + replicate
    * plans (hash-partitionable on the row key, no sort); per event type
    * the surviving multiplicities are re-aggregated for the report.
    *
    * Scale: two conditional halves of ONE scan feed the rewrites; state
    * is (user, type)-keyed counts — partial-aggregated, never row
    * replication at shuffle time. */
  def q171_multiset_ops(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts_ms div 86400000").as("day"))
    val a = ev.filter(expr("day % 2 = 0")).select("user_id", "event_type")
    val b = ev.filter(expr("day % 2 = 1")).select("user_id", "event_type")
    val iall = a.intersectAll(b).groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_intersect_all"))
    val eall = a.exceptAll(b).groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_except_all"))
    ev.select("event_type").distinct()
      .join(iall, Seq("event_type"), "left")
      .join(eall, Seq("event_type"), "left")
      .select(col("event_type"),
        coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
        coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
      .orderBy("event_type")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q169_ewma_baseline" -> q169_ewma_baseline,
    "q170_neyman_allocation" -> q170_neyman_allocation,
    "q171_multiset_ops" -> q171_multiset_ops
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q169_ewma_baseline" ->
      """WITH RECURSIVE cells AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |                     ORDER BY day) AS BIGINT) AS rk
        |       FROM cells),
        |r AS (
        |  SELECT event_type, rk, day, c, c AS ewma, CAST(NULL AS BIGINT) AS prev
        |  FROM rk WHERE rk = 1
        |  UNION ALL
        |  SELECT n.event_type, n.rk, n.day, n.c, (3 * r.ewma + n.c) // 4, r.ewma
        |  FROM r JOIN rk n ON n.event_type = r.event_type AND n.rk = r.rk + 1)
        |SELECT event_type, CAST(day AS BIGINT) AS day, c,
        |       CAST(ewma AS BIGINT) AS ewma,
        |       CAST(CASE WHEN prev IS NULL THEN 0
        |                 WHEN 2 * c > 3 * prev THEN 1 ELSE 0 END AS INT) AS surge
        |FROM r ORDER BY event_type, day""".stripMargin,
    "q170_neyman_allocation" ->
      s"""WITH s AS (
         |  SELECT source,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_chars) AS BIGINT) AS sx,
         |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sx2
         |  FROM documents GROUP BY source),
         |v AS (
         |  SELECT source, n_docs,
         |         CAST((n_docs * sx2 - sx * sx) // (n_docs * n_docs) AS BIGINT)
         |           AS var_nchars
         |  FROM s),
         |w AS (
         |  SELECT source, n_docs, var_nchars,
         |         CAST(floor(sqrt(var_nchars)) AS BIGINT) AS sd_nchars,
         |         n_docs * CAST(floor(sqrt(var_nchars)) AS BIGINT) AS weight
         |  FROM v)
         |SELECT source, n_docs, var_nchars, sd_nchars,
         |       CAST((10000 * weight) // (SELECT sum(weight) FROM w) AS BIGINT)
         |         AS alloc_share_x10k,
         |       CAST(($NeymanBudget * weight) // (SELECT sum(weight) FROM w) AS BIGINT)
         |         AS n_alloc
         |FROM w ORDER BY source""".stripMargin,
    "q171_multiset_ops" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS day
        |            FROM events),
        |a AS (SELECT user_id, event_type FROM ev WHERE day % 2 = 0),
        |b AS (SELECT user_id, event_type FROM ev WHERE day % 2 = 1),
        |i AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_intersect_all
        |      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |      GROUP BY event_type),
        |x AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_except_all
        |      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |      GROUP BY event_type)
        |SELECT t.event_type,
        |       CAST(coalesce(i.n_intersect_all, 0) AS BIGINT) AS n_intersect_all,
        |       CAST(coalesce(x.n_except_all, 0) AS BIGINT) AS n_except_all
        |FROM (SELECT DISTINCT event_type FROM ev) t
        |LEFT JOIN i ON i.event_type = t.event_type
        |LEFT JOIN x ON x.event_type = t.event_type
        |ORDER BY t.event_type""".stripMargin
  )
}
