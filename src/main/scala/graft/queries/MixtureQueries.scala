package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-71 mixture-design refinements:
  *
  *  - fertility-corrected temperature mixture (q341): q107 budgets in
  *    WHITESPACE tokens, but the model consumes BPE SYMBOLS — a
  *    high-fertility source (over-segmented language, q105's metric)
  *    silently eats more of the real budget than its nominal share.
  *    Re-run the T=0.5 temperature allocation on effective symbol
  *    counts from the pinned segmentation core and report the shift
  *    against the uncorrected weights;
  *  - length-distribution earth-mover drift (q342): Wasserstein-1
  *    between each source's doc-length CDF and the corpus CDF — the
  *    AREA between the curves (the q236 KS statistic is only the max
  *    gap; W1 prices the whole shape difference in character units).
  *    Exact integers end-to-end via cross-multiplied cumulative counts
  *    over the union length grid.
  *
  * Shapes: one corpus token/length pass each; everything after is
  * |sources|- or |grid|-bounded (grid = distinct doc lengths).
  */
object MixtureQueries {

  /** Symbol budget the corrected mixture allocates (same constant class
    * as q107's MixBudget — a nominal training-run size). */
  val SymBudget = 1000000L

  /** X372 — fertility-corrected temperature mixture: per source,
    * whitespace tokens AND effective BPE symbols (Σ count·|seg| via the
    * pinned segmentation core), T=0.5 weights on both (floor-sqrt, the
    * q107 convention), and the allocation shift ×10⁴ the correction
    * produces. A source whose language over-segments gains nominal
    * share so its EFFECTIVE share stays proportional. */
  def q341_fertility_mixture(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("source"), explode(wsTokens(normalizeText(col("text")))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
    val segLen = TrainPrepQueries.bpeSegmentationsPinned(spark, dir)
      .select(col("word"), size(col("seg")).cast("long").as("n_sym"))
    val per = words.join(segLen, "word")
      .groupBy("source")
      .agg(sum("cnt").as("n_tokens"),
        sum(col("cnt") * col("n_sym")).as("n_symbols"))
      .withColumn("w_tok", floor(sqrt(col("n_tokens"))).cast("long"))
      .withColumn("w_sym", floor(sqrt(col("n_symbols"))).cast("long"))
    val tot = per.agg(sum("w_tok").as("wt_total"), sum("w_sym").as("ws_total"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("n_symbols"),
        expr(s"($SymBudget * w_tok) div wt_total").as("alloc_uncorrected"),
        expr(s"($SymBudget * w_sym) div ws_total").as("alloc_corrected"))
      .withColumn("shift_x10k", expr(
        "CASE WHEN alloc_uncorrected = 0 THEN 0L " +
          "ELSE (10000 * (alloc_corrected - alloc_uncorrected)) div alloc_uncorrected END"))
      .orderBy("source")
  }

  /** X373 — length-distribution W1 drift: per source,
    * W1(source, corpus) = Σ_grid |F_s(v) − F_G(v)|·Δv over the union
    * grid of distinct `n_chars` values, computed as exact integers
    * (cross-multiplied cumulative counts; one division at the end,
    * ×100 character units). The |sources|×|grid| spine is bounded —
    * lengths, not documents. */
  def q342_length_emd(spark: SparkSession, dir: String): DataFrame = {
    val lens = Tables.documents(spark, dir).select(col("source"), col("n_chars"))
    val gridW = Window.orderBy("n_chars")
    // |grid| rows: distinct lengths with the step to the next one
    val grid = lens.select("n_chars").distinct()
      .withColumn("delta", coalesce(lead("n_chars", 1).over(gridW) - col("n_chars"), lit(0L)))
    val srcTot = lens.groupBy("source").agg(count(lit(1)).as("t_s"))
    val gTot = lens.agg(count(lit(1)).as("t_g"))
    val perSrc = lens.groupBy("source", "n_chars").agg(count(lit(1)).as("c_s"))
    val perG = lens.groupBy("n_chars").agg(count(lit(1)).as("c_g"))
    val spine = srcTot.select("source", "t_s")
      .crossJoin(broadcast(grid))
      .join(perSrc, Seq("source", "n_chars"), "left")
      .withColumn("c_s", coalesce(col("c_s"), lit(0L)))
      .join(broadcast(perG), Seq("n_chars"), "left")
      .withColumn("c_g", coalesce(col("c_g"), lit(0L)))
      .crossJoin(broadcast(gTot))
    val w = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("cum_s", sum("c_s").over(w))
      .withColumn("cum_g", sum("c_g").over(w))
      .withColumn("contrib",
        abs(col("cum_s") * col("t_g") - col("cum_g") * col("t_s")) * col("delta"))
      .groupBy("source")
      .agg(max("t_s").as("n_docs"), sum("contrib").as("num"),
        max(col("t_s") * col("t_g")).as("den"))
      .select(col("source"), col("n_docs"),
        expr("(100 * num) div den").as("w1_chars_x100"))
      .orderBy("source")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q341_fertility_mixture" -> q341_fertility_mixture,
    "q342_length_emd" -> q342_length_emd
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks
  import TrainPrepQueries.{BpeRounds, bpeChainSqlN}

  val oracles: Map[String, String] = Map(
    "q341_fertility_mixture" ->
      s"""WITH ${bpeChainSqlN(BpeRounds)},
         |sl AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym
         |       FROM sg$BpeRounds GROUP BY word),
         |wd AS (SELECT source, unnest($normToks) AS word FROM documents),
         |wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
         |       FROM wd GROUP BY source, word),
         |per AS (SELECT wc.source,
         |               CAST(sum(wc.cnt) AS BIGINT) AS n_tokens,
         |               CAST(sum(wc.cnt * sl.n_sym) AS BIGINT) AS n_symbols
         |        FROM wc JOIN sl USING (word) GROUP BY wc.source),
         |pw AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w_tok,
         |              CAST(floor(sqrt(n_symbols)) AS BIGINT) AS w_sym FROM per),
         |tot AS (SELECT CAST(sum(w_tok) AS BIGINT) AS wt_total,
         |               CAST(sum(w_sym) AS BIGINT) AS ws_total FROM pw)
         |SELECT pw.source, pw.n_tokens, pw.n_symbols,
         |       CAST(($SymBudget * pw.w_tok) // tot.wt_total AS BIGINT) AS alloc_uncorrected,
         |       CAST(($SymBudget * pw.w_sym) // tot.ws_total AS BIGINT) AS alloc_corrected,
         |       CAST(CASE WHEN ($SymBudget * pw.w_tok) // tot.wt_total = 0 THEN 0
         |            ELSE (10000 * (($SymBudget * pw.w_sym) // tot.ws_total
         |                          - ($SymBudget * pw.w_tok) // tot.wt_total))
         |                 // (($SymBudget * pw.w_tok) // tot.wt_total) END AS BIGINT)
         |         AS shift_x10k
         |FROM pw CROSS JOIN tot
         |ORDER BY source""".stripMargin,
    "q342_length_emd" ->
      s"""WITH lens AS (SELECT source, n_chars FROM documents),
         |grid AS (SELECT n_chars,
         |                CAST(coalesce(lead(n_chars) OVER (ORDER BY n_chars) - n_chars, 0)
         |                  AS BIGINT) AS delta
         |         FROM (SELECT DISTINCT n_chars FROM lens)),
         |st AS (SELECT source, CAST(count(*) AS BIGINT) AS t_s FROM lens GROUP BY source),
         |gt AS (SELECT CAST(count(*) AS BIGINT) AS t_g FROM lens),
         |ps AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c_s
         |       FROM lens GROUP BY source, n_chars),
         |pg AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c_g
         |       FROM lens GROUP BY n_chars),
         |sp AS (SELECT st.source, st.t_s, grid.n_chars, grid.delta,
         |              coalesce(ps.c_s, 0) AS c_s, coalesce(pg.c_g, 0) AS c_g, gt.t_g
         |       FROM st CROSS JOIN grid
         |       LEFT JOIN ps ON ps.source = st.source AND ps.n_chars = grid.n_chars
         |       LEFT JOIN pg ON pg.n_chars = grid.n_chars
         |       CROSS JOIN gt),
         |cm AS (SELECT *,
         |              CAST(sum(c_s) OVER (PARTITION BY source ORDER BY n_chars
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s,
         |              CAST(sum(c_g) OVER (PARTITION BY source ORDER BY n_chars
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
         |       FROM sp)
         |SELECT source, CAST(max(t_s) AS BIGINT) AS n_docs,
         |       CAST((100 * sum(abs(cum_s * t_g - cum_g * t_s) * delta))
         |            // max(t_s * t_g) AS BIGINT) AS w1_chars_x100
         |FROM cm GROUP BY source
         |ORDER BY source""".stripMargin
  )
}
