package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-88:
  *
  *  - filter-ordering advisor (q375): the classic cascade rule —
  *    evaluate cheap, selective predicates first — applied to the
  *    q238 quality gate: per rule, measured marginal rejection rate,
  *    modeled pass cost (frozen integer literals: the repetition rule
  *    pays a token pass, the length rule a column read), and the
  *    greedy selectivity/cost ratio ranking. The predicate-ordering
  *    decision a CBO makes from estimates, here measured on the
  *    corpus itself;
  *  - Poisson-bootstrap uplift CI (q376): the q320/q374 A/B uplift
  *    shipped WITH its error bar — hash-seeded Poisson(1) replicate
  *    weights (the q253 one-pass bootstrap discipline, deterministic
  *    and oracle-replayable), per-replicate uplift, bootstrap
  *    mean/variance and the replicate envelope. An uplift whose
  *    envelope straddles zero is noise, whatever the point estimate
  *    says.
  */
object CascadeQueries {

  import GuardQueries.{RuleMaxPunctX10k, RuleMaxTokLenX100, RuleMaxTokens,
    RuleMinTokLenX100, RuleMinTokens, RuleMaxTopShareX10k}

  /** Modeled per-doc pass costs (arbitrary units): length/token counts
    * ride already-materialized columns; the symbol rule scans chars;
    * the repetition rule pays a full token grouping. */
  val RuleCosts: Seq[(String, Long)] =
    Seq("len" -> 1L, "toklen" -> 2L, "symbol" -> 3L, "repeat" -> 10L)

  /** X407 — filter-ordering advisor: per q238 rule, marginal fails,
    * selectivity ×10⁴, cost, ratio ×100 = selectivity/cost, and the
    * greedy evaluation rank. */
  def q375_cascade_order(spark: SparkSession, dir: String): DataFrame = {
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    val m = Tables.documents(spark, dir)
      .select(col("doc_id") +: metrics: _*)
    val top = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_cnt"), sum("c").as("n_norm"))
    val flags = m.join(top, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top_cnt", "n_norm"))
      .withColumn("top_share_x10k",
        when(col("n_norm") > 0,
          floor(lit(10000L) * col("top_cnt") / col("n_norm")))
          .otherwise(0L).cast("long"))
      .select(
        (col("n_tokens") < RuleMinTokens || col("n_tokens") > RuleMaxTokens)
          .cast("long").as("len"),
        (col("mean_tok_len_x100") < RuleMinTokLenX100 ||
          col("mean_tok_len_x100") > RuleMaxTokLenX100).cast("long").as("toklen"),
        (col("punct_per_10k") > RuleMaxPunctX10k).cast("long").as("symbol"),
        (col("top_share_x10k") > RuleMaxTopShareX10k).cast("long").as("repeat"))
    val agg = flags.agg(count(lit(1)).as("n_docs"),
      sum("len").as("f_len"), sum("toklen").as("f_toklen"),
      sum("symbol").as("f_symbol"), sum("repeat").as("f_repeat"))
    val rows = agg.select(expr(
      s"""stack(4,
         |  'len',    ${RuleCosts(0)._2}L, f_len,
         |  'toklen', ${RuleCosts(1)._2}L, f_toklen,
         |  'symbol', ${RuleCosts(2)._2}L, f_symbol,
         |  'repeat', ${RuleCosts(3)._2}L, f_repeat)
         |AS (rule, cost, n_fail)""".stripMargin), col("n_docs"))
      .withColumn("sel_x10k", expr("(10000 * n_fail) div n_docs"))
      .withColumn("ratio_x100", expr("(100 * sel_x10k) div cost"))
    // 4-row ranking window — bounded by construction
    rows.withColumn("rank", row_number().over(
        Window.orderBy(col("ratio_x100").desc, col("rule").asc)).cast("long"))
      .select("rule", "cost", "n_docs", "n_fail", "sel_x10k", "ratio_x100", "rank")
      .orderBy("rule")
  }

  /** Bootstrap replicates + seed for the uplift CI. */
  val UpliftBootR = 20
  val UpliftBootSeed = "bup7"

  /** X408 — Poisson-bootstrap CI for the A/B conversion uplift:
    * deterministic replicate weights, per-replicate weighted uplift
    * ×10⁴, bootstrap mean/variance and min/max envelope next to the
    * point estimate. */
  def q376_uplift_bootstrap(spark: SparkSession, dir: String): DataFrame = {
    import PreflightQueries.ConvMinPurchases
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("long")).as("np"))
      .withColumn("conv", (col("np") >= ConvMinPurchases).cast("long"))
      .withColumn("arm",
        when(substring(md5(concat_ws(":", lit("ab8"), col("user_id"))), 1, 1) >= "8",
          lit("b")).otherwise(lit("a")))
    val point = users.groupBy()
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("arm") === "b", 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === "b", col("conv")).otherwise(0L)).as("ct"),
        sum(when(col("arm") === "a", 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === "a", col("conv")).otherwise(0L)).as("cc"))
      .select(col("n_users"),
        expr("(10000 * ct) div nt - (10000 * cc) div nc").as("uplift_x10k"))
    val pw = expr(
      s"""CASE WHEN __h < 3679 THEN 0L WHEN __h < 7358 THEN 1L
         |WHEN __h < 9197 THEN 2L WHEN __h < 9810 THEN 3L
         |WHEN __h < 9963 THEN 4L ELSE 5L END""".stripMargin)
    val reps = users
      .select(col("user_id"), col("conv"), col("arm"),
        explode(sequence(lit(1), lit(UpliftBootR))).as("r"))
      .withColumn("__h",
        conv(substring(md5(concat_ws(":", lit(UpliftBootSeed), col("r"),
          col("user_id"))), 1, 4), 16, 10).cast("long") % 10000L)
      .withColumn("w", pw)
      .groupBy("r")
      .agg(sum(when(col("arm") === "b", col("w")).otherwise(0L)).as("wt"),
        sum(when(col("arm") === "b", col("w") * col("conv")).otherwise(0L)).as("wct"),
        sum(when(col("arm") === "a", col("w")).otherwise(0L)).as("wc"),
        sum(when(col("arm") === "a", col("w") * col("conv")).otherwise(0L)).as("wcc"))
      .withColumn("u_r", expr(
        """CASE WHEN wt = 0 OR wc = 0 THEN 0L
          |ELSE (10000 * wct) div wt - (10000 * wcc) div wc END""".stripMargin))
    val boot = reps.agg(count(lit(1)).as("n_reps"), sum("u_r").as("su"),
        sum(expr("u_r * u_r")).as("su2"),
        min("u_r").as("lo_x10k"), max("u_r").as("hi_x10k"))
      .withColumn("boot_mean_x10k", expr("su div n_reps"))
      .withColumn("boot_var", expr("(n_reps * su2 - su * su) div (n_reps * (n_reps - 1))"))
    point.crossJoin(broadcast(boot))
      .select("n_users", "uplift_x10k", "n_reps", "boot_mean_x10k", "boot_var",
        "lo_x10k", "hi_x10k")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q375_cascade_order" -> q375_cascade_order,
    "q376_uplift_bootstrap" -> q376_uplift_bootstrap
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{normToks, toks}

  val oracles: Map[String, String] = Map(
    "q375_cascade_order" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CAST(len($toks) AS BIGINT) AS n_tokens,
         |         CAST(CASE WHEN length(text) > 0 THEN floor(10000 *
         |             (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
         |             / length(text)) ELSE 0 END AS BIGINT) AS punct_per_10k,
         |         CAST(CASE WHEN len($toks) > 0 THEN floor(100 *
         |             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks))
         |             ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |  FROM documents),
         |tp AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
         |              CAST(sum(c) AS BIGINT) AS n_norm FROM (
         |         SELECT doc_id, token, count(*) AS c FROM (
         |           SELECT doc_id, unnest($normToks) AS token FROM documents)
         |         GROUP BY doc_id, token) GROUP BY doc_id),
         |f AS (SELECT
         |        CAST(m.n_tokens < $RuleMinTokens OR m.n_tokens > $RuleMaxTokens
         |             AS BIGINT) AS r_len,
         |        CAST(m.mean_tok_len_x100 < $RuleMinTokLenX100
         |             OR m.mean_tok_len_x100 > $RuleMaxTokLenX100 AS BIGINT) AS r_toklen,
         |        CAST(m.punct_per_10k > $RuleMaxPunctX10k AS BIGINT) AS r_symbol,
         |        CAST((CASE WHEN coalesce(tp.n_norm, 0) > 0
         |              THEN floor(10000 * coalesce(tp.top_cnt, 0) / tp.n_norm)
         |              ELSE 0 END) > $RuleMaxTopShareX10k AS BIGINT) AS r_repeat
         |      FROM m LEFT JOIN tp USING (doc_id)),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |               CAST(sum(r_len) AS BIGINT) AS f_len,
         |               CAST(sum(r_toklen) AS BIGINT) AS f_toklen,
         |               CAST(sum(r_symbol) AS BIGINT) AS f_symbol,
         |               CAST(sum(r_repeat) AS BIGINT) AS f_repeat
         |        FROM f),
         |rows0 AS (
         |  SELECT 'len' AS rule, CAST(1 AS BIGINT) AS cost, n_docs, f_len AS n_fail FROM agg
         |  UNION ALL SELECT 'toklen', 2, n_docs, f_toklen FROM agg
         |  UNION ALL SELECT 'symbol', 3, n_docs, f_symbol FROM agg
         |  UNION ALL SELECT 'repeat', 10, n_docs, f_repeat FROM agg),
         |rows1 AS (SELECT *, (10000 * n_fail) // n_docs AS sel_x10k FROM rows0),
         |rows2 AS (SELECT *, (100 * sel_x10k) // cost AS ratio_x100 FROM rows1)
         |SELECT rule, cost, n_docs, n_fail,
         |       CAST(sel_x10k AS BIGINT) AS sel_x10k,
         |       CAST(ratio_x100 AS BIGINT) AS ratio_x100,
         |       CAST(row_number() OVER (ORDER BY ratio_x100 DESC, rule ASC) AS BIGINT)
         |         AS rank
         |FROM rows2 ORDER BY rule""".stripMargin,
    "q376_uplift_bootstrap" -> {
      import PreflightQueries.ConvMinPurchases
      s"""WITH users AS (
         |  SELECT user_id,
         |         CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |              >= $ConvMinPurchases AS INT) AS BIGINT) AS conv,
         |         CASE WHEN substr(md5(concat('ab8', ':',
         |                CAST(user_id AS VARCHAR))), 1, 1) >= '8'
         |              THEN 'b' ELSE 'a' END AS arm
         |  FROM events GROUP BY user_id),
         |point AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |                 CAST((10000 * sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END))
         |                      // sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END)
         |                    - (10000 * sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END))
         |                      // sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
         |                   AS uplift_x10k
         |          FROM users),
         |reps AS (SELECT u.user_id, u.conv, u.arm, r.r,
         |                CAST(concat('0x', substr(md5(concat('$UpliftBootSeed', ':',
         |                  CAST(r.r AS VARCHAR), ':', CAST(u.user_id AS VARCHAR))), 1, 4))
         |                  AS BIGINT) % 10000 AS h
         |         FROM users u, (SELECT unnest(generate_series(1, $UpliftBootR)) AS r) r),
         |w AS (SELECT *, CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
         |                     WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3
         |                     WHEN h < 9963 THEN 4 ELSE 5 END AS w
         |      FROM reps),
         |per AS (SELECT r,
         |               CAST(sum(CASE WHEN arm = 'b' THEN w ELSE 0 END) AS BIGINT) AS wt,
         |               CAST(sum(CASE WHEN arm = 'b' THEN w * conv ELSE 0 END) AS BIGINT) AS wct,
         |               CAST(sum(CASE WHEN arm = 'a' THEN w ELSE 0 END) AS BIGINT) AS wc,
         |               CAST(sum(CASE WHEN arm = 'a' THEN w * conv ELSE 0 END) AS BIGINT) AS wcc
         |        FROM w GROUP BY r),
         |ur AS (SELECT r, CAST(CASE WHEN wt = 0 OR wc = 0 THEN 0
         |              ELSE (10000 * wct) // wt - (10000 * wcc) // wc END AS BIGINT) AS u_r
         |       FROM per),
         |boot AS (SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |                CAST(sum(u_r) AS BIGINT) AS su,
         |                CAST(sum(u_r * u_r) AS BIGINT) AS su2,
         |                CAST(min(u_r) AS BIGINT) AS lo_x10k,
         |                CAST(max(u_r) AS BIGINT) AS hi_x10k
         |         FROM ur)
         |SELECT p.n_users, p.uplift_x10k, b.n_reps,
         |       CAST(b.su // b.n_reps AS BIGINT) AS boot_mean_x10k,
         |       CAST((b.n_reps * b.su2 - b.su * b.su)
         |            // (b.n_reps * (b.n_reps - 1)) AS BIGINT) AS boot_var,
         |       b.lo_x10k, b.hi_x10k
         |FROM point p CROSS JOIN boot b""".stripMargin
    }
  )
}
