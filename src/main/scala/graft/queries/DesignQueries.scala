package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-69 decision-design operators:
  *
  *  - ER operating curve (q337): the record-linkage family measured
  *    END-TO-END — blocking (q222 core) + Fellegi–Sunter scoring (q245)
  *    evaluated against exact-duplicate ground truth (shared
  *    fingerprint) at every score threshold: precision / recall / F1
  *    ×10⁴ per τ. q245 reports the score DISTRIBUTION; this says which
  *    τ to SHIP, and its recall ceiling exposes what the blocking pass
  *    itself misses (truth pairs no block proposes);
  *  - experiment sizing table (q338): minimum detectable effect (MDE,
  *    normal approximation, α=.05 two-sided / 80% power) at a grid of
  *    per-arm sizes, seeded by the corpus's own conversion rate — the
  *    "how long must this A/B run" table next to q320's readout.
  *
  * Both bounded: the curve is a ≤|distinct scores| frame over the
  * blocked candidate set; the sizing table is |grid| rows off one
  * per-user aggregate. The single sqrt chain follows the q325 shared-
  * SQL-string IEEE discipline.
  */
object DesignQueries {

  /** X368 — ER operating curve. Truth = the exact df-capped Jaccard
    * near-dup pairs at the q16 threshold (the corpus's strongest
    * content-level duplicate signal — the testdata has zero exact-
    * fingerprint twins, so shingle-level truth is what an ER pass must
    * recover). Candidates+scores = the pinned q222/q245 machinery —
    * cheap METADATA comparisons (first/last token, lang, source). Per
    * distinct score τ (descending): predicted = pairs with score ≥ τ,
    * tp = predicted ∩ truth, P/R/F1 ×10⁴. Truth pairs missed by
    * blocking bound recall from above — measured, not assumed. */
  def q337_er_operating_curve(spark: SparkSession, dir: String): DataFrame = {
    import DataPrepQueries.{JaccardMaxDf, JaccardMinX10k, ShingleN}
    val truth = graft.ops.Dedup.jaccardPairsPinned(spark, dir,
        n = ShingleN, minJaccardX10k = JaccardMinX10k, maxDf = JaccardMaxDf)
      .select("id_a", "id_b")
    val truthN = truth.agg(count(lit(1)).as("n_truth"))
    val scored = ShapeQueries.linkageScored(spark, dir)
      .join(truth.withColumn("is_dup", lit(1L)), Seq("id_a", "id_b"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
    val perScore = scored.groupBy("score")
      .agg(count(lit(1)).as("n"), sum("is_dup").as("n_tp"))
    // ≤|distinct scores| frame (the comparison vector has ≤ 2⁴ values)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("n_pred", sum("n").over(w))
      .withColumn("tp", sum("n_tp").over(w))
      .crossJoin(broadcast(truthN))
      .select(col("score").as("tau"), col("n_pred"), col("tp").as("n_tp"),
        col("n_truth"),
        expr("(10000 * tp) div n_pred").as("precision_x10k"),
        expr("CASE WHEN n_truth = 0 THEN 0 ELSE (10000 * tp) div n_truth END")
          .as("recall_x10k"),
        expr("CASE WHEN n_pred + n_truth = 0 THEN 0 " +
          "ELSE (20000 * tp) div (n_pred + n_truth) END").as("f1_x10k"))
      .orderBy(col("tau").desc)
  }

  /** Per-arm size grid for the MDE table. */
  val PowerGrid = Seq(250L, 500L, 1000L, 2000L, 4000L)

  /** z_{α/2} + z_{power} for α=.05 two-sided, 80% power — written as one
    * literal so both engines parse the identical double. */
  val PowerZSum = "2.8016e0"

  /** The MDE sqrt chain — one shared SQL string (IEEE correctly-rounded
    * ops; p̂ from exact integer counts). */
  private[queries] val mdeSql: String =
    s"CAST(floor(1e4 * $PowerZSum * sqrt(2e0 * (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))" +
      " * (1e0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)) / CAST(n_arm AS DOUBLE))) AS BIGINT)"

  /** X369 — experiment sizing table: MDE ×10⁴ (absolute rate points) at
    * each per-arm n in [[PowerGrid]], seeded by the corpus conversion
    * rate (share of event users with ≥1 purchase). The planning twin of
    * q320's post-hoc readout: a proposed uplift below the row's MDE
    * cannot be detected at that arm size. */
  def q338_experiment_sizing(spark: SparkSession, dir: String): DataFrame = {
    // q320's conversion convention (≥ the per-user median purchase
    // count) — "has any purchase" saturates to p̂ = 1 on this corpus
    val base = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("long")).as("np"))
      .select((col("np") >= PreflightQueries.ConvMinPurchases).cast("long").as("conv"))
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
    val grid = PowerGrid.map(n =>
      base.withColumn("n_arm", lit(n))).reduce(_ unionByName _)
    grid.select(col("n_arm"), col("n_users"), col("n_conv"),
        expr("(10000 * n_conv) div n_users").as("p_x10k"),
        expr(mdeSql).as("mde_x10k"))
      .orderBy("n_arm")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q337_er_operating_curve" -> q337_er_operating_curve,
    "q338_experiment_sizing" -> q338_experiment_sizing
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.norm

  val oracles: Map[String, String] = Map(
    "q337_er_operating_curve" ->
      s"""WITH ${ShapeQueries.linkageScoredSql},
         |${DataPrepQueries.shingleCte},
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle
         |        HAVING count(*) <= ${DataPrepQueries.JaccardMaxDf}) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |truth AS (
         |  SELECT i.id_a, i.id_b FROM inter i
         |  JOIN sizes sa ON sa.id = i.id_a
         |  JOIN sizes sb ON sb.id = i.id_b
         |  WHERE floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common))
         |        >= ${DataPrepQueries.JaccardMinX10k}),
         |tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |lab AS (SELECT sc.score,
         |               CASE WHEN EXISTS (SELECT 1 FROM truth t
         |                                 WHERE t.id_a = sc.id_a AND t.id_b = sc.id_b)
         |                    THEN 1 ELSE 0 END AS is_dup
         |        FROM sc),
         |per AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(is_dup) AS BIGINT) AS n_tp
         |        FROM lab GROUP BY score),
         |cm AS (SELECT *,
         |              CAST(sum(n) OVER (ORDER BY score DESC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pred,
         |              CAST(sum(n_tp) OVER (ORDER BY score DESC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp
         |       FROM per)
         |SELECT cm.score AS tau, cm.n_pred, cm.tp AS n_tp, tn.n_truth,
         |       CAST((10000 * cm.tp) // cm.n_pred AS BIGINT) AS precision_x10k,
         |       CAST(CASE WHEN tn.n_truth = 0 THEN 0
         |            ELSE (10000 * cm.tp) // tn.n_truth END AS BIGINT) AS recall_x10k,
         |       CAST(CASE WHEN cm.n_pred + tn.n_truth = 0 THEN 0
         |            ELSE (20000 * cm.tp) // (cm.n_pred + tn.n_truth) END AS BIGINT) AS f1_x10k
         |FROM cm CROSS JOIN tn
         |ORDER BY tau DESC""".stripMargin,
    "q338_experiment_sizing" -> {
      val armRows = PowerGrid.map(n => s"($n)").mkString(", ")
      s"""WITH u AS (SELECT user_id,
         |                  CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |                            >= ${PreflightQueries.ConvMinPurchases}
         |                       THEN 1 ELSE 0 END AS conv
         |           FROM events GROUP BY user_id),
         |base AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |                CAST(sum(conv) AS BIGINT) AS n_conv FROM u),
         |grid(n_arm) AS (VALUES $armRows)
         |SELECT CAST(n_arm AS BIGINT) AS n_arm, n_users, n_conv,
         |       CAST((10000 * n_conv) // n_users AS BIGINT) AS p_x10k,
         |       $mdeSql AS mde_x10k
         |FROM grid CROSS JOIN base
         |ORDER BY n_arm""".stripMargin
    }
  )
}
