package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-7 wave-40 release-gate operators: the snapshot regression
  * report (four drift signals per source with pass/fail flags — the
  * single table a data-release review actually looks at) and
  * suffix-strip stemming with stem-family consolidation (vocabulary
  * normalization, the first step of recall-oriented retrieval and the
  * lens that shows how much of a corpus "vocabulary" is inflection).
  *
  * Oracle conventions as the sibling modules: exact integers,
  * suffix logic via substr/length only (no regex dialect risk),
  * identical aliases, ORDER BY a unique key.
  */
object GateQueries {

  /** Release-gate thresholds (×10⁴ unless noted). */
  val GateCountLoX10k = 8000L
  val GateCountHiX10k = 12500L
  val GateLexTauX10k = 2500L
  val GateKsTauX1m = 120000L
  val GateVocabTauX10k = 3000L

  /** X281 — release-gate snapshot regression: per source, the four
    * drift signals between the standing snapshot (even doc ids) and
    * the candidate snapshot (odd ids) — volume ratio, token-rate
    * drift (the q123 unit), exact KS on lengths (the q236 unit), and
    * NEW-vocabulary share — each thresholded, plus the single `pass`
    * bit. This is the composition a release review reads INSTEAD of
    * four dashboards; any flag names the dashboard to open.
    *
    * Scale: one token pass + one scalar pass, everything after is
    * |sources|-row; the KS window runs over distinct lengths. */
  def q255_release_gate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("even", (col("doc_id") % 2 === 0).cast("long"))
    val counts = docs.groupBy("source")
      .agg(sum("even").as("n_a"), sum(lit(1L) - col("even")).as("n_b"))
      .withColumn("count_ratio_x10k",
        expr("CASE WHEN n_a = 0 THEN 0L ELSE (10000 * n_b) div n_a END"))
    val tok = docs.select(col("source"), col("even"),
      explode(wsTokens(normalizeText(col("text")))).as("token"))
    val tokCounts = tok.groupBy("source", "token")
      .agg(sum("even").as("c_a"), sum(lit(1L) - col("even")).as("c_b"))
    val tokTotals = tok.groupBy("source")
      .agg(sum("even").as("t_a"), sum(lit(1L) - col("even")).as("t_b"))
    val lex = tokCounts.join(broadcast(tokTotals), "source")
      .withColumn("r_a", expr("CASE WHEN t_a = 0 THEN 0L ELSE (10000 * c_a) div t_a END"))
      .withColumn("r_b", expr("CASE WHEN t_b = 0 THEN 0L ELSE (10000 * c_b) div t_b END"))
      .groupBy("source").agg(sum(abs(col("r_a") - col("r_b"))).as("lex_drift_x10k"))
    // new vocab: distinct candidate-side tokens the standing side lacks
    val vocab = tokCounts.groupBy("source")
      .agg(sum((col("c_b") > 0).cast("long")).as("v_b"),
        sum((col("c_b") > 0 && col("c_a") === 0).cast("long")).as("v_new"))
      .withColumn("new_vocab_x10k",
        expr("CASE WHEN v_b = 0 THEN 0L ELSE (10000 * v_new) div v_b END"))
    val lenG = docs.groupBy("source", "n_chars")
      .agg(sum("even").as("lc_a"), sum(lit(1L) - col("even")).as("lc_b"))
    val w = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ks = lenG
      .withColumn("ca", sum("lc_a").over(w))
      .withColumn("cb", sum("lc_b").over(w))
      .join(broadcast(counts.select("source", "n_a", "n_b")), "source")
      // DECIMAL(38,0) like q236/KsDriftStream: dev ≤ n_a·n_b overflows
      // BIGINT past ~9.2e12 doc-pairs (round-7 ADVICE); exact to 1e38
      .withColumn("dev", abs(col("ca").cast("decimal(38,0)") * col("n_b") -
        col("cb").cast("decimal(38,0)") * col("n_a")))
      .groupBy("source")
      .agg(max("dev").as("ks_num"), max("n_a").as("kn_a"), max("n_b").as("kn_b"))
      .select(col("source"),
        expr("CASE WHEN kn_a * kn_b = 0 THEN 0L ELSE CAST((ks_num * 1000000) div " +
          "(CAST(kn_a AS DECIMAL(38,0)) * kn_b) AS BIGINT) END").as("ks_x1m"))
    counts.join(lex, "source").join(vocab.select("source", "new_vocab_x10k"), "source")
      .join(ks, "source")
      .withColumn("flag_count",
        (col("count_ratio_x10k") < GateCountLoX10k ||
          col("count_ratio_x10k") > GateCountHiX10k).cast("int"))
      .withColumn("flag_lex", (col("lex_drift_x10k") > GateLexTauX10k).cast("int"))
      .withColumn("flag_ks", (col("ks_x1m") > GateKsTauX1m).cast("int"))
      .withColumn("flag_vocab", (col("new_vocab_x10k") > GateVocabTauX10k).cast("int"))
      .withColumn("pass",
        (col("flag_count") + col("flag_lex") + col("flag_ks") + col("flag_vocab") === 0)
          .cast("int"))
      .select("source", "n_a", "n_b", "count_ratio_x10k", "lex_drift_x10k",
        "ks_x1m", "new_vocab_x10k", "flag_count", "flag_lex", "flag_ks",
        "flag_vocab", "pass")
      .orderBy("source")
  }

  /** X282 — suffix-strip stemming + stem-family consolidation: every
    * normalized token stemmed by a fixed first-match suffix ruleset
    * (sses→ss, ies→i, ss kept, -s, -ing if len>5, -ed if len>4 —
    * Porter step-1-lite, expressed in substr/length so both engines
    * agree byte-for-byte), then stem families with ≥2 surface forms
    * reported with their pooled frequency — the measurement of how
    * much "vocabulary" is inflection (feeds q24's thresholds and
    * BM25-style recall).
    *
    * Scale: one token pass with codegen'd scalar stemming, one
    * vocabulary-sized aggregate. */
  /** First-match suffix ruleset (Porter step-1-lite) over a `token`
    * column — factored out so StemSpec can pin families on a real
    * inflected vocabulary (the driver corpus's 31-word vocabulary has
    * no inflection, so q256 is legitimately empty there and the
    * behavioral evidence lives in the spec). */
  private[queries] def stemExpr = expr(
    """CASE
      |WHEN length(token) > 4 AND right(token, 4) = 'sses'
      |  THEN substr(token, 1, length(token) - 2)
      |WHEN length(token) > 3 AND right(token, 3) = 'ies'
      |  THEN concat(substr(token, 1, length(token) - 3), 'i')
      |WHEN length(token) > 2 AND right(token, 2) = 'ss' THEN token
      |WHEN length(token) > 3 AND right(token, 1) = 's'
      |  THEN substr(token, 1, length(token) - 1)
      |WHEN length(token) > 5 AND right(token, 3) = 'ing'
      |  THEN substr(token, 1, length(token) - 3)
      |WHEN length(token) > 4 AND right(token, 2) = 'ed'
      |  THEN substr(token, 1, length(token) - 2)
      |ELSE token END""".stripMargin)

  /** Stem families over ANY (token, tf) frame — q256's body, reused by
    * the spec with an inflected vocabulary. */
  private[graft] def stemFamilies(tf: DataFrame): DataFrame =
    tf.withColumn("stem", stemExpr)
      .groupBy("stem")
      .agg(countDistinct("token").cast("long").as("n_variants"),
        sum("tf").as("total_tf"), min("token").as("exemplar"))
      .filter(col("n_variants") >= 2)
      .orderBy("stem")

  def q256_stem_families(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
    tf.withColumn("stem", stemExpr)
      .groupBy("stem")
      .agg(countDistinct("token").cast("long").as("n_variants"),
        sum("tf").as("total_tf"), min("token").as("exemplar"))
      .filter(col("n_variants") >= 2)
      .orderBy("stem")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q255_release_gate" -> q255_release_gate,
    "q256_stem_families" -> q256_stem_families
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  val oracles: Map[String, String] = Map(
    "q255_release_gate" ->
      s"""WITH d AS (SELECT doc_id, source, n_chars, text,
         |                  CAST(doc_id % 2 = 0 AS BIGINT) AS even
         |           FROM documents),
         |cnt AS (SELECT source, CAST(sum(even) AS BIGINT) AS n_a,
         |               CAST(sum(1 - even) AS BIGINT) AS n_b
         |        FROM d GROUP BY source),
         |cr AS (SELECT source, n_a, n_b,
         |              CASE WHEN n_a = 0 THEN 0 ELSE (10000 * n_b) // n_a END
         |                AS count_ratio_x10k
         |       FROM cnt),
         |tk AS (SELECT source, even, unnest($normToks) AS token FROM d),
         |tc AS (SELECT source, token, CAST(sum(even) AS BIGINT) AS c_a,
         |              CAST(sum(1 - even) AS BIGINT) AS c_b
         |       FROM tk GROUP BY source, token),
         |tt AS (SELECT source, CAST(sum(even) AS BIGINT) AS t_a,
         |              CAST(sum(1 - even) AS BIGINT) AS t_b
         |       FROM tk GROUP BY source),
         |lex AS (SELECT tc.source,
         |               CAST(sum(abs(
         |                 (CASE WHEN tt.t_a = 0 THEN 0 ELSE (10000 * tc.c_a) // tt.t_a END)
         |               - (CASE WHEN tt.t_b = 0 THEN 0 ELSE (10000 * tc.c_b) // tt.t_b END)))
         |                 AS BIGINT) AS lex_drift_x10k
         |        FROM tc JOIN tt USING (source) GROUP BY tc.source),
         |vc AS (SELECT source,
         |              CAST(sum(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_b,
         |              CAST(sum(CASE WHEN c_b > 0 AND c_a = 0 THEN 1 ELSE 0 END)
         |                AS BIGINT) AS v_new
         |       FROM tc GROUP BY source),
         |vr AS (SELECT source,
         |              CASE WHEN v_b = 0 THEN 0 ELSE (10000 * v_new) // v_b END
         |                AS new_vocab_x10k
         |       FROM vc),
         |lg AS (SELECT source, n_chars, CAST(sum(even) AS BIGINT) AS lc_a,
         |              CAST(sum(1 - even) AS BIGINT) AS lc_b
         |       FROM d GROUP BY source, n_chars),
         |cum AS (SELECT lg.source, lg.n_chars,
         |               CAST(sum(lc_a) OVER (PARTITION BY source ORDER BY n_chars
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
         |               CAST(sum(lc_b) OVER (PARTITION BY source ORDER BY n_chars
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
         |        FROM lg),
         |ksv AS (SELECT cum.source,
         |               CAST(max(abs(cum.ca * cnt.n_b - cum.cb * cnt.n_a)) AS BIGINT)
         |                 AS ks_num,
         |               CAST(max(cnt.n_a) AS BIGINT) AS kn_a,
         |               CAST(max(cnt.n_b) AS BIGINT) AS kn_b
         |        FROM cum JOIN cnt USING (source) GROUP BY cum.source),
         |ks AS (SELECT source,
         |              CASE WHEN kn_a * kn_b = 0 THEN 0
         |                   ELSE (ks_num * 1000000) // (kn_a * kn_b) END AS ks_x1m
         |       FROM ksv),
         |j AS (SELECT cr.source, cr.n_a, cr.n_b, cr.count_ratio_x10k,
         |             lex.lex_drift_x10k, ks.ks_x1m, vr.new_vocab_x10k
         |      FROM cr JOIN lex USING (source) JOIN vr USING (source)
         |           JOIN ks USING (source)),
         |f AS (SELECT j.*,
         |             CAST(count_ratio_x10k < $GateCountLoX10k
         |                  OR count_ratio_x10k > $GateCountHiX10k AS INT) AS flag_count,
         |             CAST(lex_drift_x10k > $GateLexTauX10k AS INT) AS flag_lex,
         |             CAST(ks_x1m > $GateKsTauX1m AS INT) AS flag_ks,
         |             CAST(new_vocab_x10k > $GateVocabTauX10k AS INT) AS flag_vocab
         |      FROM j)
         |SELECT f.*, CAST(flag_count + flag_lex + flag_ks + flag_vocab = 0 AS INT)
         |         AS pass
         |FROM f ORDER BY source""".stripMargin,
    "q256_stem_families" ->
      s"""WITH tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM (
         |              SELECT unnest($normToks) AS token FROM documents)
         |            GROUP BY token),
         |st AS (SELECT token, tf,
         |              CASE
         |              WHEN length(token) > 4 AND right(token, 4) = 'sses'
         |                THEN substr(token, 1, length(token) - 2)
         |              WHEN length(token) > 3 AND right(token, 3) = 'ies'
         |                THEN concat(substr(token, 1, length(token) - 3), 'i')
         |              WHEN length(token) > 2 AND right(token, 2) = 'ss' THEN token
         |              WHEN length(token) > 3 AND right(token, 1) = 's'
         |                THEN substr(token, 1, length(token) - 1)
         |              WHEN length(token) > 5 AND right(token, 3) = 'ing'
         |                THEN substr(token, 1, length(token) - 3)
         |              WHEN length(token) > 4 AND right(token, 2) = 'ed'
         |                THEN substr(token, 1, length(token) - 2)
         |              ELSE token END AS stem
         |       FROM tf)
         |SELECT stem, CAST(count(DISTINCT token) AS BIGINT) AS n_variants,
         |       CAST(sum(tf) AS BIGINT) AS total_tf, min(token) AS exemplar
         |FROM st GROUP BY stem HAVING count(DISTINCT token) >= 2
         |ORDER BY stem""".stripMargin
  )
}
