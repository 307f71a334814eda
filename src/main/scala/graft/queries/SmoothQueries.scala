package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-7 wave-36 statistical-smoothing operators: Good–Turing
  * count-of-counts smoothing (the LM-estimation companion of q64's
  * Kneser–Ney continuation counts), the exact Kolmogorov–Smirnov
  * distribution-shift statistic (the nonparametric twin of q123's
  * rate-difference drift monitor), and kNN classifier-score smoothing
  * (neighbor-consensus disagreement as a label/score-noise screen —
  * the score-space analogue of q108's label propagation).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end (floor division where operands may be negative — Spark
  * `div` truncates while DuckDB `//` floors, so signed quotients go
  * through `floor(a / b)` on exact-in-double longs on BOTH sides),
  * identical aliases, ORDER BY a unique key.
  */
object SmoothQueries {

  /** X259 — Good–Turing frequency smoothing: token counts r → counts
    * of counts N_r → the adjusted count r* = (r+1)·N_{r+1}/N_r (×10⁶)
    * plus each frequency class's share of total token mass (×10⁶).
    * Row r=1's mass is the Good–Turing estimate of UNSEEN probability
    * — the number a curation pipeline reads to decide whether a corpus
    * slice is saturated (tiny N_1 share) or still surfacing new
    * vocabulary (the acquisition signal next to q138's Heaps curve).
    *
    * Scale: one token-count pass (map-side combining), then the N_r
    * table is at most |distinct frequencies| rows (≤ max df, in
    * practice hundreds) — the r+1 self-join and the totals broadcast
    * are metadata-sized. */
  def q235_good_turing(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("r"))
    val nr = tc.groupBy("r").agg(count(lit(1)).as("n_r"))
    val tot = nr.agg(sum(col("r") * col("n_r")).as("n_tokens"))
    val next = nr.select((col("r") - 1L).as("r"), col("n_r").as("n_r_next"))
    nr.join(next, Seq("r"), "left")
      .na.fill(0L, Seq("n_r_next"))
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"), col("n_r_next"),
        // DECIMAL(38,0): n_{r+1}·1e6·(r+1) passes BIGINT once a count-of-
        // counts bucket holds ~9e12 types (round-9 envelope audit)
        expr("CAST((CAST(r + 1 AS DECIMAL(38,0)) * n_r_next * 1000000) div n_r AS BIGINT)").as("gt_star_x1m"),
        expr("(r * n_r * 1000000) div n_tokens").as("mass_x1m"))
      .orderBy("r")
  }

  /** X260 — exact two-sample Kolmogorov–Smirnov statistic per source:
    * the doc-length (`n_chars`) distributions of the doc-id-parity
    * halves compared via the maximum ECDF deviation, kept EXACT by
    * cross-multiplying instead of dividing — D·n_a·n_b =
    * max over the merged support of |cumA·n_b − cumB·n_a| (all
    * integers). Ties on the max resolve to the smallest length. The
    * nonparametric "did the distribution move" read that q123's
    * binned rate diff approximates; KS is what a data-quality gate
    * actually thresholds.
    *
    * Scale: one (source, n_chars) aggregate; the cumulative window
    * runs over DISTINCT lengths per source (bounded by the length
    * domain, never corpus rows); final reduce is |sources| rows. */
  def q236_ks_shift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"),
        (col("doc_id") % 2 === 0).cast("long").as("even"))
    val g = d.groupBy("source", "n_chars")
      .agg(sum("even").as("c_a"), sum(lit(1L) - col("even")).as("c_b"))
    val w = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.groupBy("source")
      .agg(sum("even").as("n_a"), sum(lit(1L) - col("even")).as("n_b"))
    // DECIMAL(38,0) arithmetic for the cross-multiplied deviation and the
    // ×10⁶ statistic: dev ≤ n_a·n_b, so the BIGINT form overflows once
    // n_a·n_b > ~9.2e12 (~3M docs a side; round-7 ADVICE). Exact to
    // n_a·n_b·10⁶ < 1e38; outputs cast back to BIGINT (ks_num ≤ n_a·n_b
    // by |ECDF dev| ≤ 1, ks_x1m ≤ 10⁶). Same fix in KsDriftStream.ks.
    g.withColumn("ca", sum("c_a").over(w))
      .withColumn("cb", sum("c_b").over(w))
      .join(broadcast(tot), "source")
      .withColumn("dev", abs(col("ca").cast("decimal(38,0)") * col("n_b") -
        col("cb").cast("decimal(38,0)") * col("n_a")))
      .groupBy("source")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        max(struct(col("dev"), (-col("n_chars")).as("neg"))).as("m"))
      .select(col("source"), col("n_a"), col("n_b"),
        col("m.dev").cast("long").as("ks_num"), (-col("m.neg")).as("ks_at"),
        expr("CASE WHEN n_a * n_b = 0 THEN 0L ELSE CAST((m.dev * 1000000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END").as("ks_x1m"))
      .orderBy("source")
  }

  /** Neighbor-consensus gap (×1k score units) above which a doc is
    * flagged as score-suspect. */
  val SmoothGapX1k = 2000L

  /** X261 — kNN classifier-score smoothing: each doc's frozen-classifier
    * score (q97's pinned artifact) against the mean score of its kNN
    * neighbors (q91's pinned graph) — a large |gap| means the classifier
    * disagrees with the doc's embedding neighborhood, the
    * confident-learning-style screen that surfaces mislabeled /
    * misscored docs before they bias a quality-filter threshold.
    * Neighbor mean uses floor division (scores are signed).
    *
    * Scale: two pinned cores + one equijoin on neighbor id + a per-doc
    * aggregate over ≤k rows each; nothing new is quadratic. */
  def q237_score_smoothing(spark: SparkSession, dir: String): DataFrame = {
    val sc = TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
    val nb = OlapQueries.knnGraphPinned(spark, dir)
      .join(sc.select(col("doc_id").as("neighbor_id"), col("score").as("ns")),
        "neighbor_id")
      .groupBy(col("query_id").as("doc_id"))
      .agg(count(lit(1)).as("n_nb"), sum("ns").as("s_nb"))
    sc.join(nb, "doc_id")
      .withColumn("nb_mean_x1k",
        floor(lit(1000L) * col("s_nb") / col("n_nb")).cast("long"))
      .withColumn("gap_x1k", col("nb_mean_x1k") - lit(1000L) * col("score"))
      .select(col("doc_id"), col("score"), col("n_nb"), col("nb_mean_x1k"),
        col("gap_x1k"),
        (abs(col("gap_x1k")) > SmoothGapX1k).cast("int").as("is_suspect"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q235_good_turing" -> q235_good_turing,
    "q236_ks_shift" -> q236_ks_shift,
    "q237_score_smoothing" -> q237_score_smoothing
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  val oracles: Map[String, String] = Map(
    "q235_good_turing" ->
      s"""WITH tk AS (SELECT unnest($normToks) AS token FROM documents),
         |tc AS (SELECT token, CAST(count(*) AS BIGINT) AS r FROM tk GROUP BY token),
         |nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tc GROUP BY r),
         |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens FROM nr)
         |SELECT nr.r, nr.n_r,
         |       CAST(coalesce(nx.n_r, 0) AS BIGINT) AS n_r_next,
         |       CAST(((nr.r + 1) * coalesce(nx.n_r, 0) * 1000000) // nr.n_r AS BIGINT)
         |         AS gt_star_x1m,
         |       CAST((nr.r * nr.n_r * 1000000) // tot.n_tokens AS BIGINT) AS mass_x1m
         |FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1, tot
         |ORDER BY nr.r""".stripMargin,
    "q236_ks_shift" ->
      s"""WITH d AS (SELECT source, n_chars,
         |                  CAST(doc_id % 2 = 0 AS BIGINT) AS even
         |           FROM documents),
         |g AS (SELECT source, n_chars, CAST(sum(even) AS BIGINT) AS c_a,
         |             CAST(sum(1 - even) AS BIGINT) AS c_b
         |      FROM d GROUP BY source, n_chars),
         |tot AS (SELECT source, CAST(sum(even) AS BIGINT) AS n_a,
         |               CAST(sum(1 - even) AS BIGINT) AS n_b
         |        FROM d GROUP BY source),
         |cum AS (SELECT g.source, g.n_chars,
         |               CAST(sum(c_a) OVER (PARTITION BY source ORDER BY n_chars
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
         |               CAST(sum(c_b) OVER (PARTITION BY source ORDER BY n_chars
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
         |        FROM g),
         |dev AS (SELECT cum.source, cum.n_chars, tot.n_a, tot.n_b,
         |               abs(cum.ca * tot.n_b - cum.cb * tot.n_a) AS dv
         |        FROM cum JOIN tot USING (source)),
         |mx AS (SELECT source, n_a, n_b, dv AS ks_num, n_chars AS ks_at,
         |              row_number() OVER (PARTITION BY source
         |                ORDER BY dv DESC, n_chars ASC) AS rn
         |       FROM dev)
         |SELECT source, n_a, n_b, CAST(ks_num AS BIGINT) AS ks_num,
         |       CAST(ks_at AS BIGINT) AS ks_at,
         |       CAST(CASE WHEN n_a * n_b = 0 THEN 0
         |            ELSE (ks_num * 1000000) // (n_a * n_b) END AS BIGINT) AS ks_x1m
         |FROM mx WHERE rn = 1 ORDER BY source""".stripMargin,
    "q237_score_smoothing" ->
      s"""WITH ${TrainPrepQueries.clsChainSql},
         |${OlapQueries.knnChainSql},
         |nb AS (SELECT r.query_id AS doc_id, CAST(count(*) AS BIGINT) AS n_nb,
         |              CAST(sum(ns.score) AS BIGINT) AS s_nb
         |       FROM r JOIN sc ns ON ns.doc_id = r.neighbor_id
         |       WHERE r.rank <= ${OlapQueries.KnnK}
         |       GROUP BY r.query_id)
         |SELECT sc.doc_id, CAST(sc.score AS BIGINT) AS score, nb.n_nb,
         |       CAST(floor(1000 * nb.s_nb / nb.n_nb) AS BIGINT) AS nb_mean_x1k,
         |       CAST(floor(1000 * nb.s_nb / nb.n_nb) - 1000 * sc.score AS BIGINT)
         |         AS gap_x1k,
         |       CAST(CASE WHEN abs(floor(1000 * nb.s_nb / nb.n_nb) - 1000 * sc.score)
         |                      > $SmoothGapX1k THEN 1 ELSE 0 END AS INT) AS is_suspect
         |FROM sc JOIN nb USING (doc_id)
         |ORDER BY sc.doc_id""".stripMargin
  )
}
