package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-7 wave-40 moment/resampling operators: distribution shape
  * (skewness/kurtosis from exact raw moments), hash-seeded Poisson
  * bootstrap (error bars on a corpus mean in ONE pass — no second
  * scan, no RNG state), and popularity-weighted negative sampling
  * (cumulative-range inversion of the popularity distribution, the
  * weighted twin of q88's uniform hash ring).
  *
  * Determinism notes: raw moment SUMS are exact BIGINTs; the shape
  * ratios route through +,−,×,÷,sqrt only — every one an IEEE
  * correctly-rounded operation, so both engines produce bit-identical
  * doubles (pow/exp/log, which are NOT correctly rounded, never
  * appear). Everything else is integer floor arithmetic.
  */
object MomentQueries {

  /** X278 — distribution shape profile: per event type, skewness ×1k
    * and excess kurtosis ×1k of the engagement value (euro-granular to
    * keep Σx⁴ exact in BIGINT through sf10), from one pass of raw
    * moments — the shape read that decides whether q72's mean+2σ
    * anomaly windows are even meaningful (heavy right tail ⇒ they
    * fire on every burst) and whether q87's winsorization clips
    * signal or noise.
    *
    * Scale: one grouped aggregate (5 partial-combining sums), a
    * |types|-row shape computation. */
  def q252_shape_profile(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.eventsCents(spark, dir)
      .select(col("event_type"), expr("value_c div 100").as("x"))
    x.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("x") * col("x") * col("x")).as("sx3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("sx4"))
      .withColumn("skew_x1k", expr(
        """CASE WHEN n * sx2 - sx * sx = 0 THEN 0L ELSE CAST(floor(1000.0 *
          |  ((CAST(sx3 AS DOUBLE) / n) - 3.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)
          |   + 2.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
          |  / (((CAST(sx2 AS DOUBLE) / n) - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
          |     * sqrt((CAST(sx2 AS DOUBLE) / n) - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
          |) AS BIGINT) END""".stripMargin))
      .withColumn("kurt_x1k", expr(
        """CASE WHEN n * sx2 - sx * sx = 0 THEN 0L ELSE CAST(floor(1000.0 *
          |  (((CAST(sx4 AS DOUBLE) / n) - 4.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx3 AS DOUBLE) / n)
          |    + 6.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)
          |    - 3.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
          |   / (((CAST(sx2 AS DOUBLE) / n) - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
          |      * ((CAST(sx2 AS DOUBLE) / n) - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
          |   - 3.0)
          |) AS BIGINT) END""".stripMargin))
      .select("event_type", "n", "sx", "sx2", "skew_x1k", "kurt_x1k")
      .orderBy("event_type")
  }

  /** Bootstrap replicates. */
  val BootR = 20
  /** Poisson(1) CDF quantized to 1e4: P(X≤k) thresholds for k=0..4. */
  val BootSeed = "boot7"

  /** X279 — hash-seeded Poisson bootstrap: per source, the bootstrap
    * variance of the mean doc length from [[BootR]] replicates in ONE
    * pass — each (doc, replicate) weight is Poisson(1)-quantized from
    * md5(seed:r:doc_id) (the standard Poisson-bootstrap trick that
    * needs no sampling-without-replacement state), so the error bar is
    * fully deterministic and oracle-replayable. The answer every
    * corpus datasheet mean should ship with and almost never does.
    *
    * Scale: one explode ×R (the documented one-pass bootstrap cost),
    * two grouped integer aggregates. */
  def q253_bootstrap_mean(spark: SparkSession, dir: String): DataFrame = {
    val w = expr(
      s"""CASE WHEN __h < 3679 THEN 0L WHEN __h < 7358 THEN 1L
         |WHEN __h < 9197 THEN 2L WHEN __h < 9810 THEN 3L
         |WHEN __h < 9963 THEN 4L ELSE 5L END""".stripMargin)
    val rep = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(sequence(lit(1), lit(BootR))).as("r"))
      .withColumn("__h",
        conv(substring(md5(concat_ws(":", lit(BootSeed), col("r"),
          col("doc_id"))), 1, 4), 16, 10).cast("long") % 10000L)
      .withColumn("w", w)
    val means = rep.groupBy("source", "r")
      .agg(sum(col("w") * col("n_chars")).as("swx"), sum("w").as("sw"))
      .withColumn("m_x1k",
        expr("CASE WHEN sw = 0 THEN 0L ELSE (1000 * swx) div sw END"))
    val base = Tables.documents(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("(1000 * sum(n_chars)) div count(1)").as("mean_x1k"))
    means.groupBy("source")
      .agg(count(lit(1)).as("n_reps"), sum("m_x1k").as("sm"),
        sum(col("m_x1k") * col("m_x1k")).as("sm2"))
      .withColumn("boot_var",
        expr("(n_reps * sm2 - sm * sm) div (n_reps * (n_reps - 1))"))
      .join(base, "source")
      .select("source", "n_docs", "mean_x1k", "n_reps", "boot_var")
      .orderBy("source")
  }

  /** Weighted-sampling draw count and hash seed. */
  val WNegSamples = 5000L
  val WNegSeed = "wneg7"

  /** X280 — popularity-weighted negative sampling: items weighted by
    * engagement count, the weight axis laid out as cumulative ranges
    * [lo, hi), and [[WNegSamples]] deterministic hash points inverted
    * into items through a BINNED range join (ranges explode to the
    * bins they span; points equijoin their bin — no point×items
    * nested loop, the q60 discipline on a static axis). Output is the
    * calibration table: sampled share vs weight share per item — the
    * popularity-proportional twin of q88's uniform ring, which is how
    * contrastive training actually draws negatives.
    *
    * Scale: the item axis is vocabulary-bounded; points are a
    * constant-sized generated table; the bin join shuffles
    * O(points + ranges·binsSpanned). */
  def q254_weighted_negatives(spark: SparkSession, dir: String): DataFrame = {
    val pop = Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .groupBy("item").agg(count(lit(1)).as("weight"))
    // vocabulary-bounded cumulative ranges (|items| rows)
    val wSpec = Window.partitionBy(pmod(col("item"), lit(1))).orderBy("item")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranges = pop.withColumn("hi", sum("weight").over(wSpec))
      .withColumn("lo", col("hi") - col("weight"))
    val tot = ranges.agg(max("hi").as("w_total"))
    val binned = ranges.crossJoin(broadcast(tot))
      .withColumn("bs", greatest(lit(1L), expr("w_total div 256")))
      .select(col("item"), col("weight"), col("lo"), col("hi"),
        explode(sequence(expr("lo div bs"), expr("(hi - 1) div bs"))).as("bin"))
    val points = tot.select(
        explode(sequence(lit(1L), lit(WNegSamples))).as("s"), col("w_total"))
      .withColumn("pt",
        conv(substring(md5(concat_ws(":", lit(WNegSeed), col("s"))), 1, 15),
          16, 10).cast("long") % col("w_total"))
      .withColumn("bin", expr("pt div greatest(1L, w_total div 256)"))
    val hits = points.join(binned, Seq("bin"))
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .groupBy("item").agg(count(lit(1)).as("n_sampled"))
    ranges.join(hits, Seq("item"), "left")
      .na.fill(0L, Seq("n_sampled"))
      .crossJoin(broadcast(tot))
      .select(col("item"), col("weight"),
        expr("(10000 * weight) div w_total").as("weight_x10k"),
        col("n_sampled"),
        expr(s"(10000 * n_sampled) div $WNegSamples").as("sampled_x10k"))
      .orderBy("item")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q252_shape_profile" -> q252_shape_profile,
    "q253_bootstrap_mean" -> q253_bootstrap_mean,
    "q254_weighted_negatives" -> q254_weighted_negatives
  )

  // ---------------------------------------------------------------- oracles

  private val mom = "CAST(sx AS DOUBLE) / n"
  private val m2 = s"((CAST(sx2 AS DOUBLE) / n) - ($mom) * ($mom))"

  val oracles: Map[String, String] = Map(
    "q252_shape_profile" ->
      s"""WITH x AS (SELECT event_type,
         |                  CAST(round(value * 100) AS BIGINT) // 100 AS x
         |           FROM events),
         |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(x) AS BIGINT) AS sx,
         |               CAST(sum(x * x) AS BIGINT) AS sx2,
         |               CAST(sum(x * x * x) AS BIGINT) AS sx3,
         |               CAST(sum(x * x * x * x) AS BIGINT) AS sx4
         |        FROM x GROUP BY event_type)
         |SELECT event_type, n, sx, sx2,
         |       CASE WHEN n * sx2 - sx * sx = 0 THEN 0
         |       ELSE CAST(floor(1000.0 *
         |         ((CAST(sx3 AS DOUBLE) / n) - 3.0 * ($mom) * (CAST(sx2 AS DOUBLE) / n)
         |          + 2.0 * ($mom) * ($mom) * ($mom))
         |         / ($m2 * sqrt($m2))
         |       ) AS BIGINT) END AS skew_x1k,
         |       CASE WHEN n * sx2 - sx * sx = 0 THEN 0
         |       ELSE CAST(floor(1000.0 *
         |         (((CAST(sx4 AS DOUBLE) / n) - 4.0 * ($mom) * (CAST(sx3 AS DOUBLE) / n)
         |           + 6.0 * ($mom) * ($mom) * (CAST(sx2 AS DOUBLE) / n)
         |           - 3.0 * ($mom) * ($mom) * ($mom) * ($mom))
         |          / ($m2 * $m2)
         |          - 3.0)
         |       ) AS BIGINT) END AS kurt_x1k
         |FROM agg ORDER BY event_type""".stripMargin,
    "q253_bootstrap_mean" ->
      s"""WITH rep AS (
         |  SELECT d.doc_id, d.source, d.n_chars, r.r,
         |         CAST(concat('0x', substr(md5(concat('$BootSeed', ':',
         |           CAST(r.r AS VARCHAR), ':', CAST(d.doc_id AS VARCHAR))), 1, 4))
         |           AS BIGINT) % 10000 AS h
         |  FROM documents d, (SELECT unnest(generate_series(1, $BootR)) AS r) r),
         |wt AS (SELECT source, r,
         |              CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
         |                   WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3
         |                   WHEN h < 9963 THEN 4 ELSE 5 END AS w, n_chars
         |       FROM rep),
         |mn AS (SELECT source, r, CAST(sum(w * n_chars) AS BIGINT) AS swx,
         |              CAST(sum(w) AS BIGINT) AS sw
         |       FROM wt GROUP BY source, r),
         |mx AS (SELECT source, r,
         |              CASE WHEN sw = 0 THEN 0 ELSE (1000 * swx) // sw END AS m_x1k
         |       FROM mn),
         |bt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
         |              CAST(sum(m_x1k) AS BIGINT) AS sm,
         |              CAST(sum(m_x1k * m_x1k) AS BIGINT) AS sm2
         |       FROM mx GROUP BY source),
         |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |                CAST((1000 * sum(n_chars)) // count(*) AS BIGINT) AS mean_x1k
         |         FROM documents GROUP BY source)
         |SELECT bt.source, base.n_docs, base.mean_x1k, bt.n_reps,
         |       CAST((bt.n_reps * bt.sm2 - bt.sm * bt.sm)
         |         // (bt.n_reps * (bt.n_reps - 1)) AS BIGINT) AS boot_var
         |FROM bt JOIN base USING (source) ORDER BY bt.source""".stripMargin,
    "q254_weighted_negatives" ->
      s"""WITH pop AS (SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |                    CAST(count(*) AS BIGINT) AS weight
         |             FROM events
         |             WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |             GROUP BY item),
         |rg AS (SELECT item, weight,
         |              CAST(sum(weight) OVER (ORDER BY item
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
         |       FROM pop),
         |rg2 AS (SELECT item, weight, hi, hi - weight AS lo FROM rg),
         |tot AS (SELECT CAST(max(hi) AS BIGINT) AS w_total FROM rg2),
         |pts AS (SELECT s,
         |               CAST(concat('0x', substr(md5(concat('$WNegSeed', ':',
         |                 CAST(s AS VARCHAR))), 1, 15)) AS BIGINT) % tot.w_total AS pt
         |        FROM (SELECT unnest(generate_series(1, $WNegSamples)) AS s), tot),
         |hits AS (SELECT rg2.item, CAST(count(*) AS BIGINT) AS n_sampled
         |         FROM pts JOIN rg2 ON pts.pt >= rg2.lo AND pts.pt < rg2.hi
         |         GROUP BY rg2.item)
         |SELECT rg2.item, rg2.weight,
         |       CAST((10000 * rg2.weight) // tot.w_total AS BIGINT) AS weight_x10k,
         |       CAST(coalesce(hits.n_sampled, 0) AS BIGINT) AS n_sampled,
         |       CAST((10000 * coalesce(hits.n_sampled, 0)) // $WNegSamples AS BIGINT)
         |         AS sampled_x10k
         |FROM rg2 LEFT JOIN hits USING (item), tot
         |ORDER BY rg2.item""".stripMargin
  )
}
