package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.ops.Relational

/** Round-6 wave-35 agreement/design operators: modality drift agreement
  * (does lexical drift and embedding drift tell the same per-source
  * story?), systematic sampling over the deterministic shuffle order
  * (the equal-interval design next to q51's hash Bernoulli), and the
  * cost-optimal decision threshold (the asymmetric-cost companion of
  * q209's best-F1).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object AgreeQueries {

  /** X256 — modality drift agreement: per source, LEXICAL drift between
    * the doc-id-parity halves (Σ per-token |rate_A − rate_B| per 10⁴ —
    * total-variation over the source's vocabulary, the q123 unit
    * aggregated to one score) next to EMBEDDING drift (Σ_dim squared
    * mean-shift ×1k — the q147 unit keyed by source via the doc↔vec id
    * alignment), plus both RANKS and their gap. A source whose text
    * moved but whose embeddings didn't (or vice versa) is a scraper/
    * encoder change, not a content change — the cross-modal
    * consistency read neither monitor gives alone.
    *
    * Scale: one token pass + one cell pass, both aggregated to
    * |sources|-sized tables; ranks are |sources|-row windows. */
  def q232_modality_drift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs
      .select(col("source"), (col("doc_id") % 2 === 0).cast("long").as("even"),
        explode(wsTokens(normalizeText(col("text")))).as("token"))
    val tokCounts = tok.groupBy("source", "token")
      .agg(sum("even").as("c_a"), sum(lit(1L) - col("even")).as("c_b"))
    val tokTotals = tok.groupBy("source")
      .agg(sum("even").as("t_a"), sum(lit(1L) - col("even")).as("t_b"))
    val lex = tokCounts.join(broadcast(tokTotals), "source")
      .withColumn("r_a", expr("CASE WHEN t_a = 0 THEN 0L ELSE (10000 * c_a) div t_a END"))
      .withColumn("r_b", expr("CASE WHEN t_b = 0 THEN 0L ELSE (10000 * c_b) div t_b END"))
      .groupBy("source").agg(sum(abs(col("r_a") - col("r_b"))).as("lex_drift_x10k"))
    val cells = Tables.embeddings(spark, dir)
      .join(docs.select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select(col("source"), (col("vec_id") % 2 === 0).cast("long").as("even"),
        posexplode(quantize(col("embedding"))).as(Seq("dim", "v")))
      .groupBy("source", "dim")
      .agg(sum(when(col("even") === 1, col("v")).otherwise(0L)).as("s_a"),
        sum("even").as("n_a"),
        sum(when(col("even") === 0, col("v")).otherwise(0L)).as("s_b"),
        sum(lit(1L) - col("even")).as("n_b"))
      .withColumn("m_a", expr("CASE WHEN n_a = 0 THEN 0L ELSE (1000 * s_a) div n_a END"))
      .withColumn("m_b", expr("CASE WHEN n_b = 0 THEN 0L ELSE (1000 * s_b) div n_b END"))
    val emb = cells.groupBy("source")
      .agg(sum((col("m_a") - col("m_b")) * (col("m_a") - col("m_b"))).as("emb_drift_sq"))
    // |sources|-row rank windows (pmod key: non-foldable constant spec)
    val joined = lex.join(emb, "source")
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(pmod(length(col("source")), lit(1)))
          .orderBy(col("lex_drift_x10k").desc, col("source"))).cast("long"))
      .withColumn("emb_rank", row_number().over(
        Window.partitionBy(pmod(length(col("source")), lit(1)))
          .orderBy(col("emb_drift_sq").desc, col("source"))).cast("long"))
    joined.select(col("source"), col("lex_drift_x10k"), col("emb_drift_sq"),
        col("lex_rank"), col("emb_rank"),
        abs(col("lex_rank") - col("emb_rank")).as("rank_gap"))
      .orderBy("source")
  }

  /** Systematic-sampling target size. */
  val SysSampleK = 50L

  /** X257 — systematic sampling over the deterministic shuffle order:
    * rank the corpus by `(md5(doc_id), doc_id)` (the reproducible
    * shuffle key), take every ⌊N/k⌋-th doc starting at position 1 —
    * the equal-interval design whose per-stratum coverage tracks
    * stratum share by construction (q51's Bernoulli hash sample has
    * binomial jitter; systematic has ±1). Output = the sample with
    * positions plus per-source counts for the coverage audit.
    *
    * Scale: one two-phase global index pass + a modulo filter. */
  def q233_systematic_sample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("shuf", md5(col("doc_id").cast("string")))
    val n = docs.count()
    val step = math.max(1L, n / SysSampleK)
    Relational.globalIndex(docs, Seq(col("shuf"), col("doc_id")), "pos")
      .filter(pmod(col("pos") - 1L, lit(step)) === 0L)
      .select(col("pos"), col("doc_id"), col("source"))
      .orderBy("pos")
  }

  /** Decision costs: a false positive costs 1, a false negative 5. */
  val CostFpX1 = 1L
  val CostFnX1 = 5L

  /** X258 — cost-optimal decision threshold: sweep every distinct
    * classifier score as the keep-cutoff and price each with the
    * asymmetric cost matrix (FP = [[CostFpX1]], FN = [[CostFnX1]]) —
    * the deployment-decision companion of q209's best-F1 (symmetric
    * costs are a fiction in moderation/filtering: letting a bad doc
    * through rarely costs what dropping a good one does). Output: the
    * cost curve over distinct scores with the argmin flagged (ties →
    * higher threshold = prefer precision).
    *
    * Scale: |distinct scores|-sized after the grouped-score aggregate
    * (the q203 discipline) — cumulative windows run over score groups,
    * never the corpus. */
  def q234_cost_threshold(spark: SparkSession, dir: String): DataFrame = {
    val scores = TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
    val keep = DataPrepQueries.q26_quality_filter(spark, dir)
      .select(col("doc_id"), col("keep").cast("long").as("y"))
    val g = scores.join(keep, "doc_id")
      .groupBy("score")
      .agg(sum("y").as("pos_s"), (count(lit(1)) - sum("y")).as("neg_s"))
    val tot = g.agg(sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"))
    // predict keep iff score >= t: FP = negatives at/above t, FN =
    // positives below t; cumulative over DISTINCT scores only
    val w = Window.partitionBy(pmod(col("score"), lit(1))).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val priced = g
      .withColumn("fp", sum("neg_s").over(w))
      .withColumn("tp", sum("pos_s").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("fn", col("n_pos") - col("tp"))
      .withColumn("cost", col("fp") * CostFpX1 + col("fn") * CostFnX1)
    val best = priced.agg(min(struct(col("cost"), (-col("score")).as("ns"))).as("b"))
      .select(col("b.cost").as("best_cost"), (-col("b.ns")).as("best_score"))
    priced.crossJoin(broadcast(best))
      .select(col("score").as("threshold"), col("tp"), col("fp"), col("fn"),
        col("cost"),
        (col("cost") === col("best_cost") && col("score") === col("best_score"))
          .cast("int").as("is_optimal"))
      .orderBy("threshold")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q232_modality_drift" -> q232_modality_drift,
    "q233_systematic_sample" -> q233_systematic_sample,
    "q234_cost_threshold" -> q234_cost_threshold
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{normToks, quantVec}

  val oracles: Map[String, String] = Map(
    "q232_modality_drift" ->
      s"""WITH tk AS (SELECT source, CAST(doc_id % 2 = 0 AS BIGINT) AS even,
         |                   unnest($normToks) AS token
         |            FROM documents),
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
         |cl AS (SELECT d.source, CAST(e.vec_id % 2 = 0 AS BIGINT) AS even,
         |              CAST(unnest(generate_series(1, len(qv))) - 1 AS BIGINT) AS dim,
         |              unnest(qv) AS v
         |       FROM (SELECT vec_id, $quantVec AS qv FROM embeddings) e
         |       JOIN documents d ON d.doc_id = e.vec_id),
         |cg AS (SELECT source, dim,
         |              CAST(sum(CASE WHEN even = 1 THEN v ELSE 0 END) AS BIGINT) AS s_a,
         |              CAST(sum(even) AS BIGINT) AS n_a,
         |              CAST(sum(CASE WHEN even = 0 THEN v ELSE 0 END) AS BIGINT) AS s_b,
         |              CAST(sum(1 - even) AS BIGINT) AS n_b
         |       FROM cl GROUP BY source, dim),
         |cm AS (SELECT source, dim,
         |              CASE WHEN n_a = 0 THEN 0 ELSE (1000 * s_a) // n_a END AS m_a,
         |              CASE WHEN n_b = 0 THEN 0 ELSE (1000 * s_b) // n_b END AS m_b
         |       FROM cg),
         |emb AS (SELECT source, CAST(sum((m_a - m_b) * (m_a - m_b)) AS BIGINT) AS emb_drift_sq
         |        FROM cm GROUP BY source),
         |j AS (SELECT lex.source, lex.lex_drift_x10k, emb.emb_drift_sq,
         |             CAST(row_number() OVER (ORDER BY lex.lex_drift_x10k DESC, lex.source)
         |               AS BIGINT) AS lex_rank,
         |             CAST(row_number() OVER (ORDER BY emb.emb_drift_sq DESC, lex.source)
         |               AS BIGINT) AS emb_rank
         |      FROM lex JOIN emb USING (source))
         |SELECT source, lex_drift_x10k, emb_drift_sq, lex_rank, emb_rank,
         |       CAST(abs(lex_rank - emb_rank) AS BIGINT) AS rank_gap
         |FROM j ORDER BY source""".stripMargin,
    "q233_systematic_sample" ->
      s"""WITH d AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS shuf
         |           FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
         |rk AS (SELECT doc_id, source,
         |              CAST(row_number() OVER (ORDER BY shuf, doc_id) AS BIGINT) AS pos
         |       FROM d)
         |SELECT rk.pos, rk.doc_id, rk.source
         |FROM rk, n
         |WHERE (rk.pos - 1) % greatest(1, n.n_total // $SysSampleK) = 0
         |ORDER BY rk.pos""".stripMargin,
    "q234_cost_threshold" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |sy AS (SELECT sc.doc_id, sc.score, kp.keep AS y FROM sc JOIN kp USING (doc_id)),
         |g AS (SELECT score, CAST(sum(y) AS BIGINT) AS pos_s,
         |             CAST(count(*) - sum(y) AS BIGINT) AS neg_s
         |      FROM sy GROUP BY score),
         |tot AS (SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos FROM g),
         |cum AS (SELECT g.*,
         |               CAST(sum(neg_s) OVER (ORDER BY score DESC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
         |               CAST(sum(pos_s) OVER (ORDER BY score DESC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp
         |        FROM g),
         |pr AS (SELECT cum.score, cum.tp, cum.fp,
         |              tot.n_pos - cum.tp AS fn,
         |              cum.fp * $CostFpX1 + (tot.n_pos - cum.tp) * $CostFnX1 AS cost
         |       FROM cum, tot),
         |bst AS (SELECT cost AS best_cost, score AS best_score FROM pr
         |        ORDER BY cost, score DESC LIMIT 1)
         |SELECT pr.score AS threshold, pr.tp, pr.fp, CAST(pr.fn AS BIGINT) AS fn,
         |       CAST(pr.cost AS BIGINT) AS cost,
         |       CAST(CASE WHEN pr.cost = bst.best_cost AND pr.score = bst.best_score
         |            THEN 1 ELSE 0 END AS INT) AS is_optimal
         |FROM pr, bst ORDER BY threshold""".stripMargin
  )
}
