package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational

/** Round-5 wave-16a business-analytics operators: the TPC-H Q2-style
  * argmin join-back (cheapest provider per item under a dim filter) and
  * RFM behavioral segmentation (recency/frequency/monetary quintiles).
  *
  * Oracle conventions as the sibling modules: money in integer cents,
  * exact integers end-to-end, identical aliases both sides, ORDER BY a
  * unique key.
  */
object RetailQueries {

  /** Q2-shape part filter (bounded probe set, as TPC-H Q2's size+type). */
  val MinCostSize = 15

  /** X179 — min-cost supplier per part (TPC-H Q2 shape on the available
    * tables): for each part of size [[MinCostSize]], the supplier selling
    * it at the lowest observed unit cost (⌊100·extprice_cents/qty⌋ —
    * cents per hundredth-unit, exact), ties → lowest suppkey, enriched
    * with the supplier's nation. The classic correlated-min pattern
    * `WHERE cost = (SELECT min(cost) ... WHERE partkey = p.partkey)`,
    * built directly as its decorrelated plan: per-part min aggregate +
    * equi-join back on (partkey, cost) — exactly what Catalyst's
    * decorrelation produces from the subquery form (q71 pins that class;
    * this is the join-back at fact scale).
    *
    * Scale: the part filter broadcasts and prunes the fact FIRST; the
    * min aggregate and the join-back share the partkey shuffle; supplier
    * and nation dims broadcast. Tie-break inside a min(struct) partial
    * aggregate — no window over the fact.
    */
  def q167_min_cost_supplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(Tables.part(spark, dir)
      .filter(col("p_size") === MinCostSize)
      .select(col("p_partkey"), col("p_name")))
    val cost = Tables.lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("l_suppkey"),
        expr("(100 * CAST(round(l_extendedprice * 100) AS BIGINT)) div " +
          "CAST(round(l_quantity * 100) AS BIGINT)").as("unit_cost"))
    val best = cost
      .groupBy("p_partkey", "p_name")
      .agg(min(struct(col("unit_cost"), col("l_suppkey"))).as("b"))
      .select(col("p_partkey"), col("p_name"),
        col("b.unit_cost").as("min_unit_cost"), col("b.l_suppkey").as("suppkey"))
    best
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("min_unit_cost"),
        col("s_name"), col("n_name"))
      .orderBy("p_partkey")
  }

  /** RFM quintile count. */
  val RfmQ = 5L

  /** X180 — RFM segmentation: per user, Recency (days since their last
    * event, against the corpus's last day), Frequency (events) and
    * Monetary (Σ cents); each ranked into quintiles by the q69 explicit
    * formula `⌊Q·(rank−1)/n⌋` (ntile's remainder spread is
    * engine-specific), recency ranked DESC (most recent → highest
    * quintile), and the user's segment is the 3-digit code 100·R+10·F+M.
    * Emits the segment-level rollup (users, total monetary) — the
    * marketing/behavioral cohort table, and the canonical multi-metric
    * ranking composition.
    *
    * Scale: one user-keyed aggregate over events, then three two-phase
    * [[Relational.globalIndex]] ranks over the USER table (≪ events) —
    * no single-task window anywhere; the final rollup is ≤ Q³ rows.
    */
  def q168_rfm_segments(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.eventsCents(spark, dir)
      .groupBy("user_id")
      .agg(max(expr("ts_ms div 86400000")).as("last_day"),
        count(lit(1)).cast("long").as("freq"),
        sum("value_c").cast("long").as("monetary_c"))
    val maxDay = perUser.agg(max("last_day").as("corpus_last_day"))
    val base = perUser.crossJoin(broadcast(maxDay))
      .withColumn("recency_days", (col("corpus_last_day") - col("last_day")).cast("long"))
      .select("user_id", "recency_days", "freq", "monetary_c")
    // ONE range shuffle for all three independent quintile ranks
    // (round-9; the q127 stacking trick): each user contributes one row
    // per signal — (0, −recency), (1, freq), (2, monetary) — and a
    // single globalIndex over (sig, v, user_id) gives rank-within-signal
    // as __gidx − sig·N. The former form chained THREE globalIndex
    // passes (three range-sample jobs, three cache materializations,
    // three offset broadcasts) — measured 3.4 s → ~1.3 s at sf0.1.
    // −recency makes the stacked ASC order equal recency DESC; a
    // user_id-keyed pivot reunites the quintiles (monetary rides along
    // as the sig=2 value).
    val stacked = base.select(col("user_id"), explode(array(
        struct(lit(0L).as("sig"), (-col("recency_days")).as("v")),
        struct(lit(1L).as("sig"), col("freq").as("v")),
        struct(lit(2L).as("sig"), col("monetary_c").as("v")))).as("sv"))
      .select(col("sv.sig").as("sig"), col("sv.v").as("v"), col("user_id"))
    // N rides out of the index's own offsets table (globalIndexWithTotal,
    // round-9): no separate count aggregate + broadcast just to normalize
    val idx = Relational.globalIndexWithTotal(stacked,
        Seq(col("sig"), col("v"), col("user_id")), "__gidx", Some("__tot"))
      .withColumn("n_users_total", expr("__tot div 3"))
      .withColumn("__srank", col("__gidx") - col("sig") * col("n_users_total"))
      .withColumn("q", expr(s"($RfmQ * (__srank - 1)) div n_users_total"))
    idx.groupBy("user_id")
      .agg(max(when(col("sig") === 0L, col("q"))).as("rq"),
        max(when(col("sig") === 1L, col("q"))).as("fq"),
        max(when(col("sig") === 2L, col("q"))).as("mq"),
        max(when(col("sig") === 2L, col("v"))).as("monetary_c"))
      .withColumn("segment", expr("100 * rq + 10 * fq + mq"))
      .groupBy("segment")
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum("monetary_c").cast("long").as("monetary_c_total"))
      .orderBy("segment")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_min_cost_supplier" -> q167_min_cost_supplier,
    "q168_rfm_segments" -> q168_rfm_segments
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q167_min_cost_supplier" ->
      s"""WITH cost AS (
         |  SELECT p.p_partkey, p.p_name, l.l_suppkey,
         |         (100 * CAST(round(l.l_extendedprice * 100) AS BIGINT))
         |           // CAST(round(l.l_quantity * 100) AS BIGINT) AS unit_cost
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  WHERE p.p_size = $MinCostSize),
         |best AS (
         |  SELECT p_partkey, p_name, min(unit_cost) AS min_unit_cost
         |  FROM cost GROUP BY p_partkey, p_name),
         |pick AS (
         |  SELECT c.p_partkey, min(c.l_suppkey) AS suppkey
         |  FROM cost c JOIN best b
         |    ON b.p_partkey = c.p_partkey AND c.unit_cost = b.min_unit_cost
         |  GROUP BY c.p_partkey)
         |SELECT b.p_partkey, b.p_name,
         |       CAST(b.min_unit_cost AS BIGINT) AS min_unit_cost,
         |       s.s_name, n.n_name
         |FROM best b
         |JOIN pick k ON k.p_partkey = b.p_partkey
         |JOIN supplier s ON s.s_suppkey = k.suppkey
         |JOIN nation n ON n.n_nationkey = s.s_nationkey
         |ORDER BY b.p_partkey""".stripMargin,
    "q168_rfm_segments" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |         max(epoch_ms(ts) // 86400000) AS last_day,
         |         CAST(count(*) AS BIGINT) AS freq,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_c
         |  FROM events GROUP BY user_id),
         |base AS (
         |  SELECT user_id,
         |         CAST((SELECT max(last_day) FROM pu) - last_day AS BIGINT) AS recency_days,
         |         freq, monetary_c
         |  FROM pu),
         |ranked AS (
         |  SELECT *,
         |         CAST(row_number() OVER (ORDER BY recency_days DESC, user_id) AS BIGINT) AS rk_r,
         |         CAST(row_number() OVER (ORDER BY freq, user_id) AS BIGINT) AS rk_f,
         |         CAST(row_number() OVER (ORDER BY monetary_c, user_id) AS BIGINT) AS rk_m,
         |         CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM base)
         |SELECT CAST(100 * (($RfmQ * (rk_r - 1)) // n)
         |          + 10 * (($RfmQ * (rk_f - 1)) // n)
         |          + (($RfmQ * (rk_m - 1)) // n) AS BIGINT) AS segment,
         |       CAST(count(*) AS BIGINT) AS n_users,
         |       CAST(sum(monetary_c) AS BIGINT) AS monetary_c_total
         |FROM ranked GROUP BY 1 ORDER BY segment""".stripMargin
  )
}
