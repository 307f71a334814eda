package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-89 (batch half):
  *
  *  - revenue-bridge decomposition (q377): the FP&A waterfall —
  *    ΔR between the two halves of the shipping window split EXACTLY
  *    into volume effect (Δqty at old unit price), price effect (new
  *    qty at Δ unit price) and the integer-division residual, per
  *    brand. The residual column is what makes the bridge HONEST:
  *    volume + price + resid ≡ ΔR to the cent by construction, no
  *    "rounding" footnote. Unit prices are integer-cents averages, so
  *    the whole bridge is oracle-replayable.
  */
object BridgeQueries {

  private val DayMs = 86400000L

  /** X410 — revenue bridge per brand across the shipdate midpoint:
    * qty/revenue per half, volume/price effects at cents precision,
    * and the exactly-reconciling residual. */
  def q377_revenue_bridge(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr(s"CAST(unix_millis(CAST(l_shipdate AS TIMESTAMP)) div $DayMs AS BIGINT)")
          .as("day"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("rev_c"))
    val span = l.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val brand = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    // conditional aggregation, not a per-half self-join: ONE hash
    // shuffle of the fact table produces both halves' censuses, and
    // brands present in only one half fall out with zeros naturally
    val wide = l.crossJoin(broadcast(span))
      .withColumn("half", when(col("day") < col("mid"), 1L).otherwise(2L))
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(when(col("half") === 1, col("qty")).otherwise(0L)).as("qty1"),
        sum(when(col("half") === 1, col("rev_c")).otherwise(0L)).as("rev1_c"),
        sum(when(col("half") === 2, col("qty")).otherwise(0L)).as("qty2"),
        sum(when(col("half") === 2, col("rev_c")).otherwise(0L)).as("rev2_c"))
    wide
      .withColumn("p1_c", expr("CASE WHEN qty1 = 0 THEN 0L ELSE rev1_c div qty1 END"))
      .withColumn("p2_c", expr("CASE WHEN qty2 = 0 THEN 0L ELSE rev2_c div qty2 END"))
      .withColumn("volume_c", expr("(qty2 - qty1) * p1_c"))
      .withColumn("price_c", expr("qty2 * (p2_c - p1_c)"))
      .withColumn("resid_c",
        expr("(rev2_c - rev1_c) - (qty2 - qty1) * p1_c - qty2 * (p2_c - p1_c)"))
      .select("p_brand", "qty1", "rev1_c", "qty2", "rev2_c",
        "volume_c", "price_c", "resid_c")
      .orderBy("p_brand")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q377_revenue_bridge" -> q377_revenue_bridge
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q377_revenue_bridge" ->
      s"""WITH l AS (SELECT l_partkey,
         |                  epoch_ms(l_shipdate) // $DayMs AS day,
         |                  CAST(round(l_quantity) AS BIGINT) AS qty,
         |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS rev_c
         |           FROM lineitem),
         |span AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM l),
         |h AS (SELECT p.p_brand,
         |             CASE WHEN l.day < s.mid THEN 1 ELSE 2 END AS half,
         |             CAST(sum(l.qty) AS BIGINT) AS qty,
         |             CAST(sum(l.rev_c) AS BIGINT) AS rev
         |      FROM l CROSS JOIN span s JOIN part p ON p.p_partkey = l.l_partkey
         |      GROUP BY 1, 2),
         |a AS (SELECT p_brand, qty AS qty1, rev AS rev1_c FROM h WHERE half = 1),
         |b AS (SELECT p_brand, qty AS qty2, rev AS rev2_c FROM h WHERE half = 2),
         |j AS (SELECT coalesce(a.p_brand, b.p_brand) AS p_brand,
         |             coalesce(a.qty1, 0) AS qty1, coalesce(a.rev1_c, 0) AS rev1_c,
         |             coalesce(b.qty2, 0) AS qty2, coalesce(b.rev2_c, 0) AS rev2_c
         |      FROM a FULL OUTER JOIN b USING (p_brand)),
         |p AS (SELECT *,
         |             CASE WHEN qty1 = 0 THEN 0 ELSE rev1_c // qty1 END AS p1_c,
         |             CASE WHEN qty2 = 0 THEN 0 ELSE rev2_c // qty2 END AS p2_c
         |      FROM j)
         |SELECT p_brand, qty1, rev1_c, qty2, rev2_c,
         |       CAST((qty2 - qty1) * p1_c AS BIGINT) AS volume_c,
         |       CAST(qty2 * (p2_c - p1_c) AS BIGINT) AS price_c,
         |       CAST((rev2_c - rev1_c) - (qty2 - qty1) * p1_c
         |            - qty2 * (p2_c - p1_c) AS BIGINT) AS resid_c
         |FROM p ORDER BY p_brand""".stripMargin
  )
}
