package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.Relational

/** Round-8 wave-82:
  *
  *  - PPS systematic sampling + Hansen–Hurwitz audit (q363): size-
  *    proportional systematic draws (deterministic anchor at skip/2 —
  *    no RNG, the q233 discipline) against plain uniform systematic,
  *    both estimating the corpus token total, with the exact error vs
  *    truth. Point-to-interval matching is CLOSED FORM — the count of
  *    grid points inside each doc's cumulative interval is two floor
  *    divisions, so there is NO range join at any scale;
  *  - covariance diagonality audit (q364): are the embedding dims
  *    decorrelated enough that diagonal methods (q353's Mahalanobis,
  *    q115's per-dim variance ranks) are honest? Off-diagonal vs
  *    diagonal covariance mass over a deterministic md5-ordered
  *    sample (the lloyd training-cap discipline) — covariance needs
  *    n·d² multiplies, so the SAMPLE is the scale story, exactly as
  *    IVF training caps its input.
  */
object SamplingQueries {

  /** Systematic sample size (both arms). */
  val PpsSamples = 50L

  /** X395 — PPS vs uniform systematic sampling, Hansen–Hurwitz
    * estimates of the corpus token total with exact integer error.
    * Per method: points landed, docs hit, truth, estimate, |err| ×10⁴. */
  def q363_pps_estimate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("s"),
        size(wsTokens(normalizeText(col("text")))).cast("long").as("y"))
    val cum = Relational.globalCumSum(docs, Seq(col("doc_id")), col("s"), "c")
    val idx = Relational.globalIndex(cum, Seq(col("doc_id")), "rn")
    val tot = docs.agg(sum("s").as("s_tot"), sum("y").as("y_true"),
      count(lit(1)).as("n_docs_tot"))
    val base = idx.crossJoin(broadcast(tot))
    def cnt(x: String, r: String, skip: String): String =
      s"least($PpsSamples, CASE WHEN $x < $r THEN 0L ELSE ($x - $r) div $skip + 1 END)"
    val pps = base
      .withColumn("skip", expr(s"greatest(s_tot div $PpsSamples, 1L)"))
      .withColumn("r", expr("skip div 2"))
      .withColumn("m", expr(
        s"${cnt("c - 1", "r", "skip")} - ${cnt("c - s - 1", "r", "skip")}"))
      .withColumn("contrib", expr(
        "CASE WHEN m > 0 THEN m * ((y * s_tot) div s) ELSE 0L END"))
      .agg(sum("m").as("n_points"),
        sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_docs"),
        max("y_true").as("y_true"), sum("contrib").as("num"))
      .select(lit("pps_systematic").as("method"), col("n_points"), col("n_docs"),
        col("y_true"), expr("num div n_points").as("y_est"))
    val uni = base
      .withColumn("skip", expr(s"greatest(n_docs_tot div $PpsSamples, 1L)"))
      .withColumn("r", expr("skip div 2"))
      .withColumn("m", expr(
        s"${cnt("rn - 1", "r", "skip")} - ${cnt("rn - 2", "r", "skip")}"))
      .withColumn("contrib", expr(
        "CASE WHEN m > 0 THEN m * (y * n_docs_tot) ELSE 0L END"))
      .agg(sum("m").as("n_points"),
        sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_docs"),
        max("y_true").as("y_true"), sum("contrib").as("num"))
      .select(lit("uniform_systematic").as("method"), col("n_points"), col("n_docs"),
        col("y_true"), expr("num div n_points").as("y_est"))
    pps.unionByName(uni)
      .withColumn("err_x10k", expr("(10000 * abs(y_est - y_true)) div y_true"))
      .orderBy("method")
  }

  /** Deterministic covariance sample cap. */
  val CovSample = 256L

  /** X396 — covariance diagonality audit over the md5-ordered vector
    * sample: exact integer covariance numerators n·Σxy − Σx·Σy per dim
    * pair, off-diagonal vs diagonal absolute mass, and the single
    * strongest off-diagonal pair. */
  def q364_cov_diagonality(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val sample = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("vq"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(CovSample.toInt)
    val coords = sample.select(col("vec_id"), posexplode(col("vq")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
        col("col").as("x"))
    val n = coords.groupBy("i").agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val pair = coords.as("a")
      .join(coords.as("b"), expr("a.vec_id = b.vec_id AND a.i <= b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(expr("a.x * b.x")).as("sxy"))
      .join(broadcast(n.select(col("i"), col("n"), col("sx").as("sxi"))), "i")
      .join(broadcast(n.select(col("i").as("j"), col("sx").as("sxj"))), "j")
      .withColumn("num", expr("n * sxy - sxi * sxj"))
    val masses = pair.agg(
      max("n").as("n_sample"),
      countDistinct("i").as("d"),
      sum(when(col("i") === col("j"), col("num")).otherwise(0L)).as("diag_mass"),
      sum(when(col("i") =!= col("j"), abs(col("num"))).otherwise(0L)).as("offdiag_mass"))
    val top = pair.filter(col("i") =!= col("j"))
      .orderBy(abs(col("num")).desc, col("i").asc, col("j").asc)
      .limit(1)
      .select(col("i").as("top_i"), col("j").as("top_j"),
        abs(col("num")).as("top_abs_cov"))
    masses.crossJoin(broadcast(top))
      .withColumn("offdiag_x10k", expr("(10000 * offdiag_mass) div diag_mass"))
      .select("n_sample", "d", "diag_mass", "offdiag_mass", "offdiag_x10k",
        "top_i", "top_j", "top_abs_cov")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q363_pps_estimate" -> q363_pps_estimate,
    "q364_cov_diagonality" -> q364_cov_diagonality
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{normToks, quantVec}

  val oracles: Map[String, String] = Map(
    "q363_pps_estimate" -> {
      def cnt(x: String, r: String, skip: String): String =
        s"least($PpsSamples, CASE WHEN $x < $r THEN 0 ELSE ($x - $r) // $skip + 1 END)"
      s"""WITH docs AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS s,
         |                     CAST(len($normToks) AS BIGINT) AS y
         |              FROM documents),
         |cum AS (SELECT *, CAST(sum(s) OVER (ORDER BY doc_id) AS BIGINT) AS c,
         |               CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
         |        FROM docs),
         |tot AS (SELECT CAST(sum(s) AS BIGINT) AS s_tot,
         |               CAST(sum(y) AS BIGINT) AS y_true,
         |               CAST(count(*) AS BIGINT) AS n_docs_tot
         |        FROM docs),
         |base AS (SELECT * FROM cum CROSS JOIN tot),
         |pps0 AS (SELECT *,
         |                greatest(s_tot // $PpsSamples, 1) AS skip,
         |                greatest(s_tot // $PpsSamples, 1) // 2 AS r
         |         FROM base),
         |pps1 AS (SELECT *,
         |                ${cnt("c - 1", "r", "skip")}
         |                  - ${cnt("c - s - 1", "r", "skip")} AS m
         |         FROM pps0),
         |ppsa AS (SELECT 'pps_systematic' AS method,
         |                CAST(sum(m) AS BIGINT) AS n_points,
         |                CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |                  AS n_docs,
         |                max(y_true) AS y_true,
         |                CAST(sum(CASE WHEN m > 0
         |                         THEN m * ((y * s_tot) // s) ELSE 0 END)
         |                     // sum(m) AS BIGINT) AS y_est
         |         FROM pps1),
         |uni0 AS (SELECT *,
         |                greatest(n_docs_tot // $PpsSamples, 1) AS skip,
         |                greatest(n_docs_tot // $PpsSamples, 1) // 2 AS r
         |         FROM base),
         |uni1 AS (SELECT *,
         |                ${cnt("rn - 1", "r", "skip")}
         |                  - ${cnt("rn - 2", "r", "skip")} AS m
         |         FROM uni0),
         |unia AS (SELECT 'uniform_systematic' AS method,
         |                CAST(sum(m) AS BIGINT) AS n_points,
         |                CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |                  AS n_docs,
         |                max(y_true) AS y_true,
         |                CAST(sum(CASE WHEN m > 0 THEN m * (y * n_docs_tot)
         |                         ELSE 0 END) // sum(m) AS BIGINT) AS y_est
         |         FROM uni1)
         |SELECT method, n_points, n_docs, y_true, y_est,
         |       CAST((10000 * abs(y_est - y_true)) // y_true AS BIGINT) AS err_x10k
         |FROM (SELECT * FROM ppsa UNION ALL SELECT * FROM unia)
         |ORDER BY method""".stripMargin
    },
    "q364_cov_diagonality" ->
      s"""WITH sample AS (SELECT vec_id, $quantVec AS vq FROM embeddings
         |                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |                LIMIT $CovSample),
         |coords AS (SELECT vec_id, unnest(generate_series(1, len(vq))) AS i,
         |                  unnest(vq) AS x
         |           FROM sample),
         |nn AS (SELECT i, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(x) AS BIGINT) AS sx
         |       FROM coords GROUP BY i),
         |pair AS (SELECT a.i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS sxy
         |         FROM coords a JOIN coords b
         |           ON a.vec_id = b.vec_id AND a.i <= b.i
         |         GROUP BY a.i, b.i),
         |nums AS (SELECT p.i, p.j,
         |                x.n * p.sxy - x.sx * y.sx AS num
         |         FROM pair p JOIN nn x ON x.i = p.i JOIN nn y ON y.i = p.j),
         |masses AS (SELECT (SELECT max(n) FROM nn) AS n_sample,
         |                  (SELECT CAST(count(*) AS BIGINT) FROM nn) AS d,
         |                  CAST(sum(CASE WHEN i = j THEN num ELSE 0 END) AS BIGINT)
         |                    AS diag_mass,
         |                  CAST(sum(CASE WHEN i != j THEN abs(num) ELSE 0 END)
         |                    AS BIGINT) AS offdiag_mass
         |           FROM nums),
         |top AS (SELECT CAST(i AS BIGINT) AS top_i, CAST(j AS BIGINT) AS top_j,
         |               CAST(abs(num) AS BIGINT) AS top_abs_cov
         |        FROM nums WHERE i != j
         |        ORDER BY abs(num) DESC, i ASC, j ASC LIMIT 1)
         |SELECT n_sample, d, diag_mass, offdiag_mass,
         |       CAST((10000 * offdiag_mass) // diag_mass AS BIGINT) AS offdiag_x10k,
         |       top_i, top_j, top_abs_cov
         |FROM masses CROSS JOIN top""".stripMargin
  )
}
