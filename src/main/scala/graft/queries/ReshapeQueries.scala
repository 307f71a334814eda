package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-18b reshaping/hierarchy operators: UNPIVOT (wide → long,
  * the inverse of q58's pivot — together they close the reshaping
  * surface) and a ratio-to-parent hierarchy share report (nation share
  * of region, region share of global — the drill-down decomposition
  * every BI layer asks of an engine).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object ReshapeQueries {

  import PipelineQueries.{DayMs, EventTypes}

  /** X191 — UNPIVOT (wide → long): q58's pivoted daily matrix melted
    * back to (day, metric, n) rows through the native `Dataset.unpivot`
    * (Spark's UNPIVOT/MELT — a map-side Expand, zero shuffles beyond
    * q58's own aggregate). Zero-filled cells survive the round trip, so
    * the output is the DENSE long table (every day × every type) — the
    * form a plotting/training loop consumes after a wide export. The
    * oracle builds the dense long table directly (days × types spine,
    * zero-coalesced) — pivot∘unpivot ≡ dense-long is exactly the
    * round-trip contract under test.
    *
    * Scale: unpivot is a row-local Expand (×|types| fan-out of
    * |days| rows); no shuffle is added to q58's plan. */
  def q176_unpivot_long(spark: SparkSession, dir: String): DataFrame = {
    val wide = PipelineQueries.q58_daily_pivot(spark, dir)
    wide.unpivot(
        Array(col("day_ms")),
        EventTypes.map(t => col(s"n_$t")).toArray,
        "metric", "n")
      .select(col("day_ms"), col("metric"), col("n").cast("long").as("n"))
      .orderBy("day_ms", "metric")
  }

  /** X192 — ratio-to-parent hierarchy shares: order revenue (integer
    * cents) rolled up region → nation with each nation's share of its
    * region ×10⁴ and each region's share of the corpus ×10⁴ — the
    * two-level drill-down decomposition (percent-of-parent), computed
    * without window functions: level totals are tiny aggregates joined
    * back (|regions| rows broadcast, 1-row global), so the fact table is
    * touched exactly once.
    *
    * Scale: fact ⋈ broadcast customer/nation/region dims (star shape,
    * q44 discipline) → one (region, nation) partial-aggregated shuffle;
    * everything after is ≤ |nations| rows. */
  def q177_hierarchy_shares(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum("cents").cast("long").as("rev_c"))
    val regionTot = rev.groupBy("r_name").agg(sum("rev_c").cast("long").as("region_c"))
    val globalTot = rev.agg(sum("rev_c").cast("long").as("global_c"))
    rev.join(broadcast(regionTot), Seq("r_name"))
      .crossJoin(broadcast(globalTot))
      .withColumn("nation_share_x10k", expr("(10000 * rev_c) div region_c"))
      .withColumn("region_share_x10k", expr("(10000 * region_c) div global_c"))
      .select("r_name", "n_name", "rev_c", "nation_share_x10k", "region_share_x10k")
      .orderBy("r_name", "n_name")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_unpivot_long" -> q176_unpivot_long,
    "q177_hierarchy_shares" -> q177_hierarchy_shares
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q176_unpivot_long" ->
      s"""WITH cells AS (
         |  SELECT (epoch_ms(ts) // $DayMs) * $DayMs AS day_ms, event_type,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day_ms FROM cells),
         |ty AS (SELECT unnest([${EventTypes.map(t => s"'$t'").mkString(", ")}])
         |         AS event_type)
         |SELECT d.day_ms, concat('n_', t.event_type) AS metric,
         |       CAST(coalesce(c.n, 0) AS BIGINT) AS n
         |FROM days d
         |CROSS JOIN ty t
         |LEFT JOIN cells c ON c.day_ms = d.day_ms AND c.event_type = t.event_type
         |ORDER BY d.day_ms, metric""".stripMargin,
    "q177_hierarchy_shares" ->
      """WITH rev AS (
        |  SELECT r.r_name, n.n_name,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS rev_c
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  GROUP BY r.r_name, n.n_name),
        |rt AS (SELECT r_name, CAST(sum(rev_c) AS BIGINT) AS region_c
        |       FROM rev GROUP BY r_name),
        |gt AS (SELECT CAST(sum(rev_c) AS BIGINT) AS global_c FROM rev)
        |SELECT rev.r_name, rev.n_name, rev.rev_c,
        |       CAST((10000 * rev.rev_c) // rt.region_c AS BIGINT)
        |         AS nation_share_x10k,
        |       CAST((10000 * rt.region_c) // gt.global_c AS BIGINT)
        |         AS region_share_x10k
        |FROM rev
        |JOIN rt ON rt.r_name = rev.r_name
        |CROSS JOIN gt
        |ORDER BY rev.r_name, rev.n_name""".stripMargin
  )
}
