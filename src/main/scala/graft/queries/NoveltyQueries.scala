package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-77:
  *
  *  - diagonal-Mahalanobis novelty (q353): distribution-relative
  *    outlier scoring — each vector's squared deviation per dimension,
  *    NORMALIZED by that dimension's corpus variance, summed. The
  *    statistical complement of q146 (kth-NN distance) and q290
  *    (LOF): no graph, no neighbors, one stats pass + one score pass,
  *    so it is the O(n·d) novelty screen that still works when the
  *    kNN core would be overkill. Exact integers: quantized vectors,
  *    floor means/variances, per-dim term = Δ²·10⁶ div (var+1);
  *  - head-token rank stability (q354): Jaccard overlap of the two
  *    corpus halves' top-D token sets at depths 10/25/50/100 — the
  *    rank-set robustness readout behind any "top tokens" dashboard
  *    (q123 prices per-token frequency drift; this prices the HEAD
  *    SET's identity). TakeOrdered caps both sides at 100 rows, so
  *    every window after the cut is bounded by construction.
  */
object NoveltyQueries {

  /** Top-k reported by the novelty screen. */
  val NoveltyTopK = 20

  /** X384 — diagonal-Mahalanobis novelty: per-dim corpus mean/variance
    * (floor-integer over quantized coords), score = Σ_d Δ²·10⁶ div
    * (var_d + 1), top-[[NoveltyTopK]] by score. The stats table is
    * |dims| rows — broadcast back onto the coordinate pass. */
  def q353_diag_mahalanobis(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val coords = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(quantize(col("embedding"))))
      .withColumnRenamed("pos", "d").withColumnRenamed("col", "x")
    val stats = coords.groupBy("d")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .withColumn("mu", expr("sx div n"))
    val vars = coords.join(broadcast(stats.select("d", "mu", "n")), "d")
      .groupBy("d")
      .agg(max("mu").as("mu"), max("n").as("n"),
        sum(expr("(x - mu) * (x - mu)")).as("ssd"))
      .withColumn("v", expr("ssd div n"))
      .select("d", "mu", "v")
    val scored = coords.join(broadcast(vars), "d")
      .withColumn("term", expr("((x - mu) * (x - mu) * 1000000) div (v + 1)"))
      .groupBy("vec_id", "label")
      .agg(sum("term").as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(NoveltyTopK)
    // rank over the <= NoveltyTopK surviving rows — bounded window
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("vec_id").asc)))
      .select("vec_id", "label", "score", "rank")
      .orderBy("rank")
  }

  /** Depths at which the head sets are compared. */
  val StabilityDepths: Seq[Int] = Seq(10, 25, 50, 100)

  /** X385 — head-token rank stability across the doc_id-parity corpus
    * halves: per depth D, |top_D(A) ∩ top_D(B)| and the Jaccard ×10⁴
    * of the two head sets. Per half: one token count pass, a
    * TakeOrdered top-100 cut, then all windows run over ≤100 rows. */
  def q354_head_stability(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val toks = Tables.documents(spark, dir)
      .select(pmod(col("doc_id"), lit(2L)).as("half"),
        explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("half", "token").agg(count(lit(1)).as("c"))
    def head(h: Int): DataFrame = {
      val top = toks.filter(col("half") === h)
        .orderBy(col("c").desc, col("token").asc)
        .limit(StabilityDepths.max)
      top.withColumn("rnk", row_number().over(
          Window.orderBy(col("c").desc, col("token").asc)))
        .select(col("token"), col("rnk"))
    }
    val (ha, hb) = (head(0), head(1))
    val depths = StabilityDepths.map { dep =>
      val common = ha.filter(col("rnk") <= dep).join(
        hb.filter(col("rnk") <= dep), "token")
      common.agg(coalesce(count(lit(1)), lit(0L)).as("n_common"))
        .select(lit(dep.toLong).as("depth"), col("n_common"))
    }
    depths.reduce(_.unionByName(_))
      .withColumn("jaccard_x10k",
        expr("(10000 * n_common) div (2 * depth - n_common)"))
      .orderBy("depth")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q353_diag_mahalanobis" -> q353_diag_mahalanobis,
    "q354_head_stability" -> q354_head_stability
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{normToks, quantVec}

  val oracles: Map[String, String] = Map(
    "q353_diag_mahalanobis" ->
      s"""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |                  $quantVec AS vq FROM embeddings),
         |coords AS (SELECT vec_id, label,
         |                  unnest(generate_series(1, len(vq))) AS d,
         |                  unnest(vq) AS x
         |           FROM v),
         |stats AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
         |                 CAST(sum(x) AS BIGINT) AS sx
         |          FROM coords GROUP BY d),
         |mu AS (SELECT d, n, sx // n AS mu FROM stats),
         |vr AS (SELECT c.d, max(m.mu) AS mu,
         |              CAST(sum((c.x - m.mu) * (c.x - m.mu)) AS BIGINT)
         |                // max(m.n) AS v
         |       FROM coords c JOIN mu m USING (d) GROUP BY c.d),
         |sc AS (SELECT c.vec_id, c.label,
         |              CAST(sum(((c.x - vr.mu) * (c.x - vr.mu) * 1000000)
         |                       // (vr.v + 1)) AS BIGINT) AS score
         |       FROM coords c JOIN vr USING (d)
         |       GROUP BY c.vec_id, c.label
         |       ORDER BY score DESC, vec_id ASC LIMIT $NoveltyTopK)
         |SELECT vec_id, label, score,
         |       CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT)
         |         AS rank
         |FROM sc ORDER BY rank""".stripMargin,
    "q354_head_stability" -> {
      val depthsSql = StabilityDepths.map(d => s"SELECT CAST($d AS BIGINT) AS depth")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT doc_id % 2 AS half, unnest($normToks) AS token
         |              FROM documents),
         |cnt AS (SELECT half, token, count(*) AS c FROM toks GROUP BY half, token),
         |ha AS (SELECT token, row_number() OVER (ORDER BY c DESC, token ASC) AS rnk
         |       FROM (SELECT * FROM cnt WHERE half = 0
         |             ORDER BY c DESC, token ASC LIMIT ${StabilityDepths.max})),
         |hb AS (SELECT token, row_number() OVER (ORDER BY c DESC, token ASC) AS rnk
         |       FROM (SELECT * FROM cnt WHERE half = 1
         |             ORDER BY c DESC, token ASC LIMIT ${StabilityDepths.max})),
         |ds AS ($depthsSql)
         |SELECT ds.depth,
         |       CAST(count(hb.token) AS BIGINT) AS n_common,
         |       CAST((10000 * count(hb.token))
         |            // (2 * ds.depth - count(hb.token)) AS BIGINT) AS jaccard_x10k
         |FROM ds
         |LEFT JOIN ha ON ha.rnk <= ds.depth
         |LEFT JOIN hb ON hb.token = ha.token AND hb.rnk <= ds.depth
         |GROUP BY ds.depth ORDER BY ds.depth""".stripMargin
    }
  )
}
