package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-97 — experiment hygiene (the two checks every A/B
  * dashboard runs BEFORE reading the uplift):
  *
  *  - sample-ratio mismatch (q392): are the arms the size the 50/50
  *    assignment promises? χ²(1)×1000 = 1000·(nₐ−n_b)²/(nₐ+n_b)
  *    against the frozen 3.841 critical value — an SRM fail means the
  *    assignment or logging is broken and EVERY downstream readout
  *    (q320/q374/q376) is void;
  *  - A/A placebo probe (q393): the full uplift machinery run on a
  *    second, independent hash split WITHIN the control arm — the
  *    measured placebo. If the A/A uplift clears the same z²
  *    threshold the real A/B uses, the pipeline manufactures effects
  *    from nothing and no positive result can be trusted.
  */
object HygieneAbQueries {

  /** χ²(1) upper 5% ×1000. */
  val Chi2Crit1X1000 = 3841L

  /** X426 — sample-ratio mismatch on the q320 md5-parity arms.
    * The 50/50 design expectation makes the chi² numerator the
    * squared arm difference. */
  def q392_srm_check(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("ne"))
      .withColumn("arm",
        when(substring(md5(concat_ws(":", lit("ab8"), col("user_id"))), 1, 1) >= "8",
          lit("b")).otherwise(lit("a")))
    users.agg(
        sum(when(col("arm") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "b", 1L).otherwise(0L)).as("n_b"))
      .withColumn("chi2_x1000", expr(
        "(1000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)"))
      .withColumn("srm_fail", (col("chi2_x1000") > Chi2Crit1X1000).cast("int"))
      .select("n_a", "n_b", "chi2_x1000", "srm_fail")
  }

  /** X427 — A/A placebo: control-arm users re-split by an independent
    * hash (seed `aa9`), the q320 conversion uplift computed between
    * the halves, with the same z²-style significance gate the real
    * A/B uses (two-proportion chi², exact-integer numerator). */
  def q393_aa_placebo(spark: SparkSession, dir: String): DataFrame = {
    import PreflightQueries.ConvMinPurchases
    val control = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("long")).as("np"))
      .withColumn("conv", (col("np") >= ConvMinPurchases).cast("long"))
      .filter(substring(md5(concat_ws(":", lit("ab8"), col("user_id"))), 1, 1) < "8")
      .withColumn("half",
        when(substring(md5(concat_ws(":", lit("aa9"), col("user_id"))), 1, 1) >= "8",
          lit("a2")).otherwise(lit("a1")))
    control.agg(
        sum(when(col("half") === "a1", 1L).otherwise(0L)).as("n1"),
        sum(when(col("half") === "a1", col("conv")).otherwise(0L)).as("c1"),
        sum(when(col("half") === "a2", 1L).otherwise(0L)).as("n2"),
        sum(when(col("half") === "a2", col("conv")).otherwise(0L)).as("c2"))
      .withColumn("aa_uplift_x10k",
        expr("(10000 * c2) div n2 - (10000 * c1) div n1"))
      // two-proportion chi² ×1000, exact-integer numerator:
      // n·(c1·n2 − c2·n1)² / (n1·n2·C·(n−C)) with C = c1+c2
      .withColumn("chi2_x1000", expr(
        """CASE WHEN (c1 + c2) = 0 OR (c1 + c2) = (n1 + n2) THEN 0L
          |ELSE CAST((1000 * (n1 + n2)
          |     * CAST(c1 * n2 - c2 * n1 AS DECIMAL(38,0))
          |     * (c1 * n2 - c2 * n1))
          |   div (CAST(n1 AS DECIMAL(38,0)) * n2 * (c1 + c2)
          |        * (n1 + n2 - c1 - c2)) AS BIGINT) END""".stripMargin))
      .withColumn("placebo_fail", (col("chi2_x1000") > Chi2Crit1X1000).cast("int"))
      .select("n1", "c1", "n2", "c2", "aa_uplift_x10k", "chi2_x1000", "placebo_fail")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q392_srm_check" -> q392_srm_check,
    "q393_aa_placebo" -> q393_aa_placebo
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q392_srm_check" ->
      s"""WITH u AS (SELECT user_id,
         |                  CASE WHEN substr(md5(concat('ab8', ':',
         |                         CAST(user_id AS VARCHAR))), 1, 1) >= '8'
         |                       THEN 'b' ELSE 'a' END AS arm
         |           FROM events GROUP BY user_id),
         |a AS (SELECT CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |             CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         |      FROM u)
         |SELECT n_a, n_b,
         |       CAST((1000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b) AS BIGINT)
         |         AS chi2_x1000,
         |       CAST((1000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b)
         |            > $Chi2Crit1X1000 AS INT) AS srm_fail
         |FROM a""".stripMargin,
    "q393_aa_placebo" -> {
      import PreflightQueries.ConvMinPurchases
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |              >= $ConvMinPurchases AS INT) AS BIGINT) AS conv
         |  FROM events GROUP BY user_id),
         |ctl AS (SELECT *,
         |               CASE WHEN substr(md5(concat('aa9', ':',
         |                      CAST(user_id AS VARCHAR))), 1, 1) >= '8'
         |                    THEN 'a2' ELSE 'a1' END AS half
         |        FROM u
         |        WHERE substr(md5(concat('ab8', ':',
         |                CAST(user_id AS VARCHAR))), 1, 1) < '8'),
         |a AS (SELECT CAST(sum(CASE WHEN half = 'a1' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |             CAST(sum(CASE WHEN half = 'a1' THEN conv ELSE 0 END) AS BIGINT) AS c1,
         |             CAST(sum(CASE WHEN half = 'a2' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |             CAST(sum(CASE WHEN half = 'a2' THEN conv ELSE 0 END) AS BIGINT) AS c2
         |      FROM ctl)
         |SELECT n1, c1, n2, c2,
         |       CAST((10000 * c2) // n2 - (10000 * c1) // n1 AS BIGINT)
         |         AS aa_uplift_x10k,
         |       CAST(CASE WHEN (c1 + c2) = 0 OR (c1 + c2) = (n1 + n2) THEN 0
         |            ELSE (1000 * (n1 + n2)
         |                  * CAST(c1 * n2 - c2 * n1 AS HUGEINT)
         |                  * (c1 * n2 - c2 * n1))
         |                 // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
         |                     * (n1 + n2 - c1 - c2)) END AS BIGINT) AS chi2_x1000,
         |       CAST(CASE WHEN (c1 + c2) = 0 OR (c1 + c2) = (n1 + n2) THEN 0
         |            ELSE (1000 * (n1 + n2)
         |                  * CAST(c1 * n2 - c2 * n1 AS HUGEINT)
         |                  * (c1 * n2 - c2 * n1))
         |                 // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
         |                     * (n1 + n2 - c1 - c2)) END
         |            > $Chi2Crit1X1000 AS INT) AS placebo_fail
         |FROM a""".stripMargin
    }
  )
}
