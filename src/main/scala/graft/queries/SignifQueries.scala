package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-52 statistical-significance suite for model/labeling
  * decisions — the "is classifier A actually better, and which labels
  * are wrong" layer on top of the eval metrics:
  *
  *  - paired significance (q296): McNemar's test + an exact-integer
  *    sign-flip permutation test on the per-vector correctness
  *    difference between q185's two raters — q183/q184 score each
  *    system alone; this answers whether the DIFFERENCE is real;
  *  - k-sweep accuracy (q297): kNN-vote accuracy at k ∈ {1,3,5} from
  *    ONE pinned graph — the hyperparameter curve behind q184's fixed-k
  *    confusion;
  *  - confident-learning label-noise matrix (q298): class-conditional
  *    confident joint counts (Northcutt-style thresholds t_j = mean
  *    self-class vote share, exact integer cross-multiplied) — q108
  *    flags majority disagreement; this adds the per-class calibration
  *    that separates "hard example" from "probably mislabeled".
  *
  * Scale shapes: everything rides the session-pinned kNN core and the
  * q185 rater pair — per-vector frames joined through the |V|·k edge
  * list; the permutation fan-out is |discordant|·B rows generated
  * map-side (no shuffle until the B-row reduce), B a constant.
  */
object SignifQueries {

  import OlapQueries.KnnK

  /** X325 — paired McNemar + sign-flip permutation test. d_i ∈
    * {−1,0,+1} is (rater1 correct) − (rater2 correct); T_obs = Σd.
    * Permutation b flips each discordant d by a deterministic md5
    * parity sign, p = share of B permutations with |T_b| ≥ |T_obs| —
    * the exact-arithmetic replacement for a normal approximation (the
    * md5-hex-digit ≥ '8' parity is reproducible in both engines). */
  val PermB = 256
  def q296_paired_significance(spark: SparkSession, dir: String): DataFrame = {
    val own = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("own"))
    val d = EvalQueries.raterPredictions(spark, dir)
      .join(own, "vec_id")
      .withColumn("d", (col("l1") === col("own")).cast("long")
        - (col("l2") === col("own")).cast("long"))
    val stats = d.agg(
      count(lit(1)).as("n"),
      sum((col("d") === 1L).cast("long")).as("n10"),
      sum((col("d") === -1L).cast("long")).as("n01"),
      sum("d").as("t_obs"))
    val perms = d.filter(col("d") =!= 0L)
      .withColumn("b", explode(sequence(lit(1), lit(PermB))))
      .withColumn("sign",
        when(substring(md5(concat_ws(":", lit("perm"), col("b"), col("vec_id"))),
          1, 1) >= "8", 1L).otherwise(-1L))
      .groupBy("b").agg(sum(col("sign") * col("d")).as("tb"))
    val nGe = perms.crossJoin(broadcast(stats.select("t_obs")))
      .agg(sum((abs(col("tb")) >= abs(col("t_obs"))).cast("long")).as("n_ge"))
    stats.crossJoin(broadcast(nGe))
      // no discordant pairs ⇒ no permutation rows, but every |T_b| = 0
      // ≥ |T_obs| = 0 trivially: count as all B
      .withColumn("n_ge", coalesce(col("n_ge"), lit(PermB.toLong)))
      .withColumn("mcnemar_x1000", expr(
        """CASE WHEN n10 + n01 = 0 THEN 0
          |ELSE (1000 * (n10 - n01) * (n10 - n01)) div (n10 + n01) END""".stripMargin))
      .withColumn("p_x10k", expr(s"(10000 * n_ge) div $PermB"))
      .select("n", "n10", "n01", "t_obs", "mcnemar_x1000", "p_x10k")
  }

  /** X326 — kNN accuracy k-sweep: majority-vote accuracy at k ∈
    * [[SweepKs]] from the one pinned rank-ordered graph (votes at k are
    * the rank ≤ k prefix — no rebuild per arm; ties → smallest label,
    * q108's convention). The elbow of this curve is how KnnK itself is
    * chosen. */
  val SweepKs: Seq[Int] = Seq(1, 3, 5)
  def q297_k_sweep_accuracy(spark: SparkSession, dir: String): DataFrame = {
    val lb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val g = OlapQueries.knnGraphPinned(spark, dir)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .join(lb.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nlabel"), "neighbor_id")
    import spark.implicits._
    val ks = SweepKs.map(_.toLong).toDF("k")
    val votes = g.join(broadcast(ks), col("rank") <= col("k"))
      .groupBy("k", "query_id", "nlabel")
      .agg(count(lit(1)).as("votes"))
    val pred = votes.withColumn("rn", row_number().over(
        Window.partitionBy("k", "query_id")
          .orderBy(col("votes").desc, col("nlabel").asc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("query_id"), col("nlabel").as("pred"))
    pred.join(lb.withColumnRenamed("vec_id", "query_id"), "query_id")
      .groupBy("k")
      .agg(count(lit(1)).as("n_total"),
        sum((col("pred") === col("label")).cast("long")).as("n_correct"))
      .withColumn("acc_x10k", expr("(10000 * n_correct) div n_total"))
      .orderBy("k")
  }

  /** X327 — confident-learning label-noise matrix: example i is a
    * CONFIDENT member of class j when its vote share votes_j(i)/k
    * reaches the class's own mean self-vote share t_j =
    * Σ_{own=j} votes_j / (k·n_j) — compared exactly as
    * votes_j(i)·n_j ≥ T_j (k cancels), votes ≥ 1. Among passing
    * classes the argmax-vote class (ties → smallest) fills the joint
    * (own_label, confident_label) cell; off-diagonal mass = suspected
    * mislabels, per-class-calibrated where q108's plain majority vote
    * is not. */
  def q298_label_noise_matrix(spark: SparkSession, dir: String): DataFrame = {
    val lb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("own"))
    val votes = OlapQueries.knnGraphPinned(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
      .join(lb.select(col("vec_id").as("neighbor_id"), col("own").as("j")),
        "neighbor_id")
      .groupBy("query_id", "j").agg(count(lit(1)).as("v"))
    // class thresholds: T_j = Σ_{own=j} votes_j(i);  n_j = |{own=j}|
    val nj = lb.groupBy(col("own").as("j")).agg(count(lit(1)).as("n_j"))
    val tj = votes.join(lb.select(col("vec_id").as("query_id"), col("own")), "query_id")
      .filter(col("own") === col("j"))
      .groupBy("j").agg(sum("v").as("t_num"))
    val thr = nj.join(tj, Seq("j"), "left")
      .select(col("j"), col("n_j"), coalesce(col("t_num"), lit(0L)).as("t_num"))
    val pass = votes.join(broadcast(thr), "j")
      .filter(col("v") * col("n_j") >= col("t_num"))
    val confident = pass.groupBy("query_id")
      .agg(min(struct((-col("v")).as("nv"), col("j").as("l"))).as("m"))
      .select(col("query_id"), col("m.l").as("conf_label"))
    confident.join(lb.withColumnRenamed("vec_id", "query_id"), "query_id")
      .groupBy(col("own").as("own_label"), col("conf_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("own_label", "conf_label")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q296_paired_significance" -> q296_paired_significance,
    "q297_k_sweep_accuracy" -> q297_k_sweep_accuracy,
    "q298_label_noise_matrix" -> q298_label_noise_matrix
  )

  val oracles: Map[String, String] = Map(
    "q296_paired_significance" ->
      s"""WITH ${EvalQueries.raterPairSql},
         |own AS (SELECT vec_id, CAST(label AS BIGINT) AS own FROM embeddings),
         |dd AS (SELECT j.vec_id,
         |              CAST(CASE WHEN j.l1 = own.own THEN 1 ELSE 0 END
         |                 - CASE WHEN j.l2 = own.own THEN 1 ELSE 0 END AS BIGINT) AS d
         |       FROM j JOIN own ON own.vec_id = j.vec_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |              CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |              CAST(sum(d) AS BIGINT) AS t_obs
         |       FROM dd),
         |pm AS (SELECT b.b, CAST(sum(
         |         CASE WHEN substr(md5(concat('perm', ':', CAST(b.b AS VARCHAR),
         |                ':', CAST(dd.vec_id AS VARCHAR))), 1, 1) >= '8'
         |              THEN dd.d ELSE -dd.d END) AS BIGINT) AS tb
         |       FROM dd, (SELECT unnest(generate_series(1, $PermB)) AS b) b
         |       WHERE dd.d <> 0 GROUP BY b.b),
         |ge AS (SELECT CAST(sum(CASE WHEN abs(pm.tb) >= abs(st.t_obs)
         |                            THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
         |       FROM pm, st)
         |SELECT st.n, st.n10, st.n01, st.t_obs,
         |       CAST(CASE WHEN st.n10 + st.n01 = 0 THEN 0
         |            ELSE (1000 * (st.n10 - st.n01) * (st.n10 - st.n01))
         |                 // (st.n10 + st.n01) END AS BIGINT) AS mcnemar_x1000,
         |       CAST((10000 * coalesce(ge.n_ge, $PermB)) // $PermB AS BIGINT) AS p_x10k
         |FROM st CROSS JOIN ge""".stripMargin,
    "q297_k_sweep_accuracy" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |g AS (SELECT e.query_id, e.rank, l.label AS nlabel
         |      FROM r e JOIN lb l ON l.vec_id = e.neighbor_id
         |      WHERE e.rank <= $KnnK),
         |ks AS (SELECT CAST(unnest([${SweepKs.mkString(", ")}]) AS BIGINT) AS k),
         |vt AS (SELECT ks.k, g.query_id, g.nlabel, CAST(count(*) AS BIGINT) AS votes
         |       FROM g JOIN ks ON g.rank <= ks.k
         |       GROUP BY ks.k, g.query_id, g.nlabel),
         |pr AS (SELECT k, query_id, nlabel AS pred FROM (
         |         SELECT *, row_number() OVER (PARTITION BY k, query_id
         |                  ORDER BY votes DESC, nlabel ASC) AS rn FROM vt)
         |       WHERE rn = 1)
         |SELECT pr.k, count(*) AS n_total,
         |       CAST(sum(CASE WHEN pr.pred = lb.label THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_correct,
         |       CAST((10000 * sum(CASE WHEN pr.pred = lb.label THEN 1 ELSE 0 END))
         |            // count(*) AS BIGINT) AS acc_x10k
         |FROM pr JOIN lb ON lb.vec_id = pr.query_id
         |GROUP BY pr.k ORDER BY pr.k""".stripMargin,
    "q298_label_noise_matrix" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS own FROM embeddings),
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= $KnnK),
         |vt AS (SELECT k.query_id, l.own AS j, CAST(count(*) AS BIGINT) AS v
         |       FROM knn k JOIN lb l ON l.vec_id = k.neighbor_id
         |       GROUP BY k.query_id, l.own),
         |nj AS (SELECT own AS j, CAST(count(*) AS BIGINT) AS n_j FROM lb GROUP BY own),
         |tj AS (SELECT vt.j, CAST(sum(vt.v) AS BIGINT) AS t_num
         |       FROM vt JOIN lb ON lb.vec_id = vt.query_id
         |       WHERE lb.own = vt.j GROUP BY vt.j),
         |thr AS (SELECT nj.j, nj.n_j, coalesce(tj.t_num, 0) AS t_num
         |        FROM nj LEFT JOIN tj ON tj.j = nj.j),
         |pass AS (SELECT vt.query_id, vt.j, vt.v
         |         FROM vt JOIN thr ON thr.j = vt.j
         |         WHERE vt.v * thr.n_j >= thr.t_num),
         |conf AS (SELECT query_id, j AS conf_label FROM (
         |           SELECT *, row_number() OVER (PARTITION BY query_id
         |                    ORDER BY v DESC, j ASC) AS rn FROM pass)
         |         WHERE rn = 1)
         |SELECT lb.own AS own_label, conf.conf_label, count(*) AS n
         |FROM conf JOIN lb ON lb.vec_id = conf.query_id
         |GROUP BY own_label, conf_label
         |ORDER BY own_label, conf_label""".stripMargin
  )
}
