package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-90:
  *
  *  - pairwise mean-difference audit (q378): which source pairs have
  *    genuinely different mean document lengths — the two-sample z
  *    test on every pair, decided WITHOUT square roots by comparing
  *    z² against the frozen critical value as one exact cross-
  *    multiplied integer inequality (diff²·nₐ·n_b·(nₐ+n_b−2) ≥
  *    z²crit·SS_pooled·(nₐ+n_b), z²crit = 3.8416 as the ×10⁴ literal).
  *    The group-mean complement of q296's classifier McNemar; the
  *    \|sources\|² grid rides a \|sources\|-row stats table;
  *  - temporal-integrity audit (q379): the cross-table data contract
  *    "a line ships only after its order is placed" — violation
  *    census per order priority with worst-lag days and the share
  *    ×10⁴. The temporal twin of q257's referential FK audit: breaks
  *    here mean clock skew or key recycling upstream, and every
  *    time-windowed join downstream silently inherits them.
  */
object ContrastQueries {

  /** z²·10⁴ at the two-sided 5% level (1.96² = 3.8416). */
  val ZCrit2X10k = 38416L

  /** X411 — pairwise source mean-length differences with the exact-
    * integer z² significance flag; diff ×100 via integer division. */
  def q378_pairwise_means(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sx"),
        sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sx2"))
    val a = stats.select(col("source").as("source_a"), col("n").as("na"),
      col("sx").as("sxa"), col("sx2").as("sx2a"))
    val b = stats.select(col("source").as("source_b"), col("n").as("nb"),
      col("sx").as("sxb"), col("sx2").as("sx2b"))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("diff_x100", expr("(100 * sxa) div na - (100 * sxb) div nb"))
      // pooled SS ×(na·nb): everything stays an exact integer product —
      // SSa = sx2a − sxa²/na cross-multiplied by na (likewise b by nb)
      .withColumn("ssa_x_na", expr("na * sx2a - CAST(sxa AS DECIMAL(38,0)) * sxa"))
      .withColumn("ssb_x_nb", expr("nb * sx2b - CAST(sxb AS DECIMAL(38,0)) * sxb"))
      .withColumn("significant", expr(
        s"""CAST((CAST(sxa AS DECIMAL(38,0)) * nb - CAST(sxb AS DECIMAL(38,0)) * na)
           |     * (CAST(sxa AS DECIMAL(38,0)) * nb - CAST(sxb AS DECIMAL(38,0)) * na)
           |     * (na + nb - 2) * 10000
           |     >= $ZCrit2X10k * (ssa_x_na * nb + ssb_x_nb * na) * (na + nb)
           |  AS INT)""".stripMargin))
      .select("source_a", "source_b", "na", "nb", "diff_x100", "significant")
      .orderBy("source_a", "source_b")
  }

  private val DayMs = 86400000L

  /** X412 — temporal-integrity audit: lineitems shipping BEFORE their
    * order date, per order priority: lines, violations, share ×10⁴,
    * worst negative lag in days. */
  def q379_temporal_integrity(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_orderpriority"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days", expr(s"(ship_ms - order_ms) div $DayMs"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("lag_days") < 0, 1L).otherwise(0L)).as("n_violations"),
        min("lag_days").as("min_lag_days"),
        expr("CASE WHEN sum(CASE WHEN lag_days >= 0 THEN 1 ELSE 0 END) = 0 THEN 0L " +
          "ELSE sum(CASE WHEN lag_days >= 0 THEN lag_days ELSE 0 END) " +
          "div sum(CASE WHEN lag_days >= 0 THEN 1 ELSE 0 END) END").as("mean_ok_lag_days"))
      .withColumn("violation_x10k", expr("(10000 * n_violations) div n_lines"))
      .select("o_orderpriority", "n_lines", "n_violations", "violation_x10k",
        "min_lag_days", "mean_ok_lag_days")
      .orderBy("o_orderpriority")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q378_pairwise_means" -> q378_pairwise_means,
    "q379_temporal_integrity" -> q379_temporal_integrity
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q378_pairwise_means" ->
      s"""WITH stats AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(n_chars) AS BIGINT) AS sx,
         |         sum(CAST(n_chars AS HUGEINT) * n_chars) AS sx2
         |  FROM documents GROUP BY source)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       a.n AS na, b.n AS nb,
         |       CAST((100 * a.sx) // a.n - (100 * b.sx) // b.n AS BIGINT)
         |         AS diff_x100,
         |       CAST((CAST(a.sx AS HUGEINT) * b.n - CAST(b.sx AS HUGEINT) * a.n)
         |            * (CAST(a.sx AS HUGEINT) * b.n - CAST(b.sx AS HUGEINT) * a.n)
         |            * (a.n + b.n - 2) * 10000
         |            >= $ZCrit2X10k
         |               * ((a.n * a.sx2 - CAST(a.sx AS HUGEINT) * a.sx) * b.n
         |                  + (b.n * b.sx2 - CAST(b.sx AS HUGEINT) * b.sx) * a.n)
         |               * (a.n + b.n) AS INT) AS significant
         |FROM stats a JOIN stats b ON a.source < b.source
         |ORDER BY source_a, source_b""".stripMargin,
    "q379_temporal_integrity" ->
      s"""WITH j AS (
         |  SELECT o.o_orderpriority,
         |         (epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate)) // $DayMs
         |           AS lag_days
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
         |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_violations,
         |       CAST((10000 * sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END))
         |            // count(*) AS BIGINT) AS violation_x10k,
         |       CAST(min(lag_days) AS BIGINT) AS min_lag_days,
         |       CAST(CASE WHEN sum(CASE WHEN lag_days >= 0 THEN 1 ELSE 0 END) = 0
         |            THEN 0
         |            ELSE sum(CASE WHEN lag_days >= 0 THEN lag_days ELSE 0 END)
         |                 // sum(CASE WHEN lag_days >= 0 THEN 1 ELSE 0 END) END
         |         AS BIGINT) AS mean_ok_lag_days
         |FROM j GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin
  )
}
