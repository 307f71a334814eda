package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-99:
  *
  *  - variance-time dispersion curve (q395): the index of dispersion
  *    of event counts at window sizes 1/2/4/8 days, per event type —
  *    a Poisson process holds IoD ≈ 1 at every scale; IoD GROWING
  *    with the window is burst clustering beyond that scale (the
  *    variance-time self-similarity read; q244's Fano factor is one
  *    point of this curve, q186's ACF its lag-domain cousin). Exact
  *    integers: IoD ×1000 = 1000·(n·Σc² − (Σc)²) / ((n−1)·Σc) over
  *    the per-window counts; windows bucket by integer day division,
  *    so every scale is one grouped pass.
  */
object DispersionQueries {

  /** Window sizes (days). */
  val DispersionWindows: Seq[Long] = Seq(1L, 2L, 4L, 8L)

  /** X429 — per (event type, window size): window count, total events,
    * IoD ×1000. */
  def q395_dispersion_curve(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ms div 86400000").as("day"))
    val arms = DispersionWindows.map { w =>
      days.groupBy(col("event_type"), expr(s"day div $w").as("win"))
        .agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_windows"), sum("c").as("n_events"),
          sum(expr("c * c")).as("sc2"))
        .select(col("event_type"), lit(w).as("w_days"), col("n_windows"),
          col("n_events"),
          // cross-products in DECIMAL: n_events² overflows BIGINT past
          // ~3e9 events per type (the KsDrift lesson)
          expr("""CASE WHEN n_windows < 2 OR n_events = 0 THEN 0L
                 |ELSE CAST((1000 * (CAST(n_windows AS DECIMAL(38,0)) * sc2
                 |                   - CAST(n_events AS DECIMAL(38,0)) * n_events))
                 |     div ((n_windows - 1) * n_events) AS BIGINT) END""".stripMargin)
            .as("iod_x1000"))
    }
    arms.reduce(_.unionByName(_)).orderBy("event_type", "w_days")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q395_dispersion_curve" -> q395_dispersion_curve
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q395_dispersion_curve" -> {
      val arms = DispersionWindows.map { w =>
        s"""SELECT event_type, CAST($w AS BIGINT) AS w_days,
           |       CAST(count(*) AS BIGINT) AS n_windows,
           |       CAST(sum(c) AS BIGINT) AS n_events,
           |       CAST(CASE WHEN count(*) < 2 OR sum(c) = 0 THEN 0
           |            ELSE (1000 * (CAST(count(*) AS HUGEINT) * sum(c * c)
           |                          - CAST(sum(c) AS HUGEINT) * sum(c)))
           |                 // ((count(*) - 1) * sum(c)) END AS BIGINT) AS iod_x1000
           |FROM (SELECT event_type, (epoch_ms(ts) // 86400000) // $w AS win,
           |             CAST(count(*) AS BIGINT) AS c
           |      FROM events GROUP BY 1, 2)
           |GROUP BY event_type""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM ($arms)
         |ORDER BY event_type, w_days""".stripMargin
    }
  )
}
