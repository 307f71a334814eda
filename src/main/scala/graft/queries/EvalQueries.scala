package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Round-5 wave-20 retrieval- and model-evaluation operators: the
  * measurement surface a training-data pipeline needs AFTER it has built
  * retrieval (q142 BM25, q91 kNN) and scoring (q97 classifier) artifacts
  * — rank fusion across retrievers, graded retrieval quality (NDCG),
  * threshold-free classifier quality (ROC AUC), per-class
  * precision/recall/F1, and inter-rater agreement (Cohen's kappa).
  *
  * Everything is integer-exact end-to-end: rank discounts that would
  * need a log are carried as precomputed ×10⁶ literals (the q175
  * Benford convention), AUC comes from the Mann–Whitney rank-sum
  * identity counted over GROUPED scores (never pairs), and every ratio
  * is a scaled BIGINT `div`. Oracle conventions as the sibling modules:
  * identical aliases both sides, ORDER BY a unique key.
  */
object EvalQueries {

  /** Depth each ranker contributes to fusion, fused list length, and
    * the standard RRF dampening constant. */
  val RrfDepth = 30
  val RrfK = 15
  val RrfC = 60L

  /** X197 — reciprocal-rank fusion of two lexical retrievers: the q142
    * BM25 ranking and a query-likelihood ranking (`Σ_t (10⁶·tf_t) div
    * dl` — pure length-normalized term mass, no rarity weighting) are
    * fused per doc as `Σ_lists 10⁶ div (C + rank)` over each ranker's
    * top [[RrfDepth]] (docs a list misses contribute nothing — the
    * standard RRF convention, and what makes fusion mergeable across
    * retrievers that never exchange scores). This is the hybrid-search
    * primitive: RRF needs only RANKS, so it composes rankers with
    * incomparable score scales (BM25 vs embedding cosine vs freshness)
    * without calibration.
    *
    * Scale: both rankers share the q142 candidate discipline (probe-term
    * filter BEFORE any shuffle; ReuseExchange dedupes the shared token
    * pass inside the one plan) and each list is cut by a sort-free
    * TakeOrderedAndProject; fusion then touches ≤ 2·[[RrfDepth]] rows. */
  def q181_rrf_fusion(spark: SparkSession, dir: String): DataFrame = {
    def ranked(scored: DataFrame, scoreCol: String, rankName: String): DataFrame = {
      val top = scored.orderBy(col(scoreCol).desc, col("doc_id")).limit(RrfDepth)
      top.withColumn(rankName,
          row_number().over(Window.orderBy(col(scoreCol).desc, col("doc_id")))
            .cast("long"))
        .select(col("doc_id"), col(rankName))
    }
    val bm = ranked(SearchQueries.bm25Scored(spark, dir), "score", "bm25_rank")
    val ql = ranked(
      SearchQueries.bm25Tf(spark, dir)
        .groupBy("doc_id")
        .agg(sum(expr("(1000000 * tf) div dl")).as("qls")),
      "qls", "ql_rank")
    val fused = bm.join(ql, Seq("doc_id"), "full")
      .withColumn("rrf_x1e6",
        coalesce(expr(s"1000000 div ($RrfC + bm25_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfC + ql_rank)"), lit(0L)))
    fused.withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_x1e6").desc, col("doc_id")))
          .cast("long"))
      .filter(col("rank") <= RrfK)
      .select("rank", "doc_id", "rrf_x1e6", "bm25_rank", "ql_rank")
      .orderBy("rank")
  }

  /** ⌊10⁶ / log₂(r+1)⌋ for ranks 1..5 and its prefix sums — the NDCG
    * discount carried as literals so no log crosses an engine. */
  val DiscountX1e6 = Seq(1000000L, 630929L, 500000L, 430676L, 386852L)
  val IdealPrefixX1e6 = Seq(1000000L, 1630929L, 2130929L, 2561605L, 2948457L)

  /** X198 — NDCG@k retrieval quality of the q91 kNN graph: treating
    * "neighbor shares the query's label" as binary relevance, each
    * query's DCG@[[OlapQueries.KnnK]] is `Σ_r rel_r · ⌊10⁶/log₂(r+1)⌋`
    * (literal discounts), its ideal DCG is the prefix sum at
    * `min(k, n_same_label − 1)` (the most relevant results that COULD
    * have been returned), and NDCG ×10⁶ is their integer ratio —
    * reported per label (mean over that label's queries). The graded
    * companion to q119's recall sweep: recall counts hits, NDCG also
    * charges the retriever for WHERE it put them.
    *
    * Scale: the q91 IVF graph (bounded-heap ranking, no all-pairs) +
    * two label equijoins; per-label sizes are a broadcast; everything
    * after the graph is |V|·k rows collapsing to |labels|. */
  def q182_ndcg_at_k(spark: SparkSession, dir: String): DataFrame = {
    val k = OlapQueries.KnnK
    val emb = Tables.embeddings(spark, dir)
    val lbl = emb.select(col("vec_id"), col("label").cast("long").as("label"))
    val disc = array(DiscountX1e6.map(lit): _*)
    val ideal = array(IdealPrefixX1e6.map(lit): _*)
    val knn = OlapQueries.knnGraphPinned(spark, dir)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val dcg = knn
      .join(lbl.toDF("query_id", "q_label"), "query_id")
      .join(lbl.toDF("neighbor_id", "n_label"), "neighbor_id")
      .withColumn("contrib",
        when(col("q_label") === col("n_label"),
          element_at(disc, col("rank").cast("int"))).otherwise(0L))
      .groupBy("query_id", "q_label")
      .agg(sum("contrib").as("dcg"))
    val sizes = lbl.groupBy("label").agg(count(lit(1)).as("n_label"))
    dcg.join(broadcast(sizes), col("q_label") === col("label"))
      .withColumn("ideal_k", least(lit(k.toLong), col("n_label") - 1L))
      .withColumn("idcg",
        when(col("ideal_k") > 0, element_at(ideal, col("ideal_k").cast("int")))
          .otherwise(1L))
      .withColumn("ndcg_x1e6", when(col("ideal_k") <= 0, 0L)
        .otherwise(expr("(1000000 * dcg) div idcg")))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        expr("sum(ndcg_x1e6) div count(*)").as("mean_ndcg_x1e6"))
      .orderBy("label")
  }

  /** X199 — ROC AUC of the frozen classifier against the rule-based
    * quality gate: does q97's hashed-linear score rank q26's keep=1
    * docs above its keep=0 docs? AUC via the Mann–Whitney identity
    * counted over score GROUPS — `concordant = Σ_s pos_s ·
    * neg_below(s)`, ties counted half — so the work is one grouped
    * aggregate plus a running sum over DISTINCT scores (bounded by the
    * score's integer range, the q138-cumsum discipline), never the
    * |pos|·|neg| pair space. `auc_x1e6 = 10⁶·(2·concordant + tied) div
    * (2·n_pos·n_neg)` — exact, threshold-free, and the standard answer
    * to "is this quality classifier better than chance" before anyone
    * picks a cut. */
  def q183_classifier_auc(spark: SparkSession, dir: String): DataFrame = {
    val scores = TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
    val keep = DataPrepQueries.q26_quality_filter(spark, dir)
      .select(col("doc_id"), col("keep").cast("long").as("keep"))
    val g = scores.join(keep, "doc_id")
      .groupBy("score")
      .agg(sum("keep").as("pos_s"),
        (count(lit(1)) - sum("keep")).as("neg_s"))
    // running negatives strictly below each score: a window over DISTINCT
    // scores — cardinality is the score range, not the corpus
    val cum = g.withColumn("neg_below",
      coalesce(sum("neg_s").over(
        Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    cum.agg(
        sum("pos_s").as("n_pos"),
        sum("neg_s").as("n_neg"),
        sum(col("pos_s") * col("neg_below")).as("concordant"),
        sum(col("pos_s") * col("neg_s")).as("tied"))
      .withColumn("auc_x1e6",
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
               |ELSE (1000000 * (2 * concordant + tied)) div (2 * n_pos * n_neg)
               |END""".stripMargin))
      .select("n_pos", "n_neg", "concordant", "tied", "auc_x1e6")
  }

  /** X200 — per-class precision/recall/F1 of the q108 kNN majority-vote
    * classifier against the embeddings' own labels: per label, tp =
    * votes that agree, fp = rows predicted INTO the label from outside,
    * fn = rows voted OUT of it; precision/recall/F1 as ×10⁴ integer
    * ratios (F1 computed from the scaled precision/recall, so both
    * engines floor identically). The confusion summary every labeled
    * pipeline reports; macro-F1 is this table's mean.
    *
    * Scale: the q108 chain (IVF graph + vote window) feeds two
    * |labels|-row aggregates joined full-outer — nothing after the
    * votes exceeds |labels| rows. */
  def q184_knn_confusion(spark: SparkSession, dir: String): DataFrame = {
    val lp = OlapQueries.labelPropagationOver(
      Tables.embeddings(spark, dir), OlapQueries.knnGraphPinned(spark, dir))
    val byTrue = lp.groupBy(col("own_label").as("label"))
      .agg(count(lit(1)).as("n_true"), sum("agree").cast("long").as("tp"))
    val byPred = lp.groupBy(col("prop_label").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    byTrue.join(byPred, Seq("label"), "full")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("prec_x10k",
        expr("CASE WHEN n_pred = 0 THEN 0 ELSE (10000 * tp) div n_pred END"))
      .withColumn("rec_x10k",
        expr("CASE WHEN n_true = 0 THEN 0 ELSE (10000 * tp) div n_true END"))
      .withColumn("f1_x10k",
        expr("""CASE WHEN prec_x10k + rec_x10k = 0 THEN 0
               |ELSE (2 * prec_x10k * rec_x10k) div (prec_x10k + rec_x10k)
               |END""".stripMargin))
      .select("label", "n_true", "n_pred", "tp", "fp", "fn",
        "prec_x10k", "rec_x10k", "f1_x10k")
      .orderBy("label")
  }

  /** X201 — Cohen's kappa between two independent classifiers of the
    * same vectors: the q108 kNN majority vote (rater 1) and a
    * nearest-centroid assignment (rater 2: per-label integer mean
    * centroid `(1000·Σv) div n`, argmax dot, ties → smallest label —
    * the Rocchio classifier). Kappa ×10⁶ = `10⁶·(N·agree − S) div
    * (N² − S)` with `S = Σ_l a_l·b_l` the marginal-product chance
    * mass — chance-corrected agreement, the honest replacement for raw
    * agreement when label marginals are skewed. Raw po/pe ride along.
    *
    * Scale: rater 2 is a broadcast of |labels| centroids against one
    * corpus pass with a max-of-struct partial aggregate (no window);
    * the kappa arithmetic runs on |labels|-row marginals. */
  /** The two independent raters of q185, factored for reuse by the
    * wave-52 significance suite (q296): rater 1 = q108's kNN majority
    * vote over the pinned graph; rater 2 = nearest integer-mean
    * centroid. Returns one row per vector: (vec_id, l1, l2). */
  private[queries] def raterPredictions(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val r1 = OlapQueries.labelPropagationOver(emb,
        OlapQueries.knnGraphPinned(spark, dir))
      .select(col("vec_id"), col("prop_label").as("l1"))
    val cents = emb
      .select(col("label").cast("long").as("label"),
        posexplode(quantize(col("embedding"))).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .withColumn("cd", expr("(1000 * s) div n"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("cd")))),
        x => x.getField("cd")).as("centv"))
    val r2 = emb
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), qdot(col("qv"), col("centv")).as("dot"))
      .groupBy("vec_id")
      .agg(min(struct((-col("dot")).as("nd"), col("label").as("l"))).as("m"))
      .select(col("vec_id"), col("m.l").as("l2"))
    r1.join(r2, "vec_id")
  }

  def q185_rater_kappa(spark: SparkSession, dir: String): DataFrame = {
    val j = raterPredictions(spark, dir)
    val tot = j.agg(count(lit(1)).as("n"),
      sum((col("l1") === col("l2")).cast("long")).as("n_agree"))
    val s = j.groupBy(col("l1").as("label")).agg(count(lit(1)).as("a"))
      .join(j.groupBy(col("l2").as("label")).agg(count(lit(1)).as("b")),
        Seq("label"), "full")
      .agg(sum(coalesce(col("a"), lit(0L)) * coalesce(col("b"), lit(0L))).as("s"))
    tot.crossJoin(s)
      .withColumn("po_x1e6", expr("(1000000 * n_agree) div n"))
      .withColumn("pe_x1e6", expr("(1000000 * s) div (n * n)"))
      .withColumn("kappa_x1e6",
        expr("""CASE WHEN n * n - s = 0 THEN 1000000
               |ELSE (1000000 * (n * n_agree - s)) div (n * n - s)
               |END""".stripMargin))
      .select("n", "n_agree", "po_x1e6", "pe_x1e6", "kappa_x1e6")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_rrf_fusion" -> q181_rrf_fusion,
    "q182_ndcg_at_k" -> q182_ndcg_at_k,
    "q183_classifier_auc" -> q183_classifier_auc,
    "q184_knn_confusion" -> q184_knn_confusion,
    "q185_rater_kappa" -> q185_rater_kappa
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{toks, hitsSql, quantVec}

  private val knnK = OlapQueries.KnnK

  /** CTE chain producing `j AS (vec_id, l1, l2)` — the q185 rater pair
    * (kNN majority vote vs nearest integer-mean centroid), shared with
    * the wave-52 significance suite ([[SignifQueries]]). */
  private[queries] lazy val raterPairSql: String =
    s"""${OlapQueries.knnChainSql},
       |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= $knnK),
       |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
       |vt AS (SELECT k.query_id, l.label, CAST(count(*) AS BIGINT) AS votes
       |       FROM knn k JOIN lb l ON k.neighbor_id = l.vec_id
       |       GROUP BY k.query_id, l.label),
       |mj AS (SELECT query_id, label AS l1,
       |              row_number() OVER (PARTITION BY query_id
       |                ORDER BY votes DESC, label ASC) AS rn
       |       FROM vt),
       |r1 AS (SELECT query_id AS vec_id, l1 FROM mj WHERE rn = 1),
       |vq AS (SELECT vec_id, ${DataPrepQueries.quantVec} AS qv FROM embeddings),
       |cd AS (
       |  SELECT lb.label, e.dim,
       |         CAST((1000 * sum(e.v)) // count(*) AS BIGINT) AS cd
       |  FROM (SELECT vec_id, unnest(generate_series(1, len(qv))) AS dim,
       |               unnest(qv) AS v FROM vq) e
       |  JOIN lb ON lb.vec_id = e.vec_id
       |  GROUP BY lb.label, e.dim),
       |cent2 AS (SELECT label, list(cd ORDER BY dim) AS centv FROM cd GROUP BY label),
       |dots AS (
       |  SELECT v.vec_id, c.label,
       |         CAST(list_sum(list_transform(generate_series(1, len(v.qv)),
       |              i -> v.qv[i] * c.centv[i])) AS BIGINT) AS dot
       |  FROM vq v CROSS JOIN cent2 c),
       |r2 AS (SELECT vec_id, label AS l2 FROM (
       |         SELECT vec_id, label, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY dot DESC, label ASC) AS rn FROM dots)
       |       WHERE rn = 1),
       |j AS (SELECT r1.vec_id, r1.l1, r2.l2 FROM r1 JOIN r2 USING (vec_id))""".stripMargin

  /** The scored-and-labeled oracle chain (q97's classifier `sc` + q26's
    * keep gate `kp`) — shared by q183 and the q203–q205 curve family. */
  private[queries] lazy val clsKeepSql: String =
    s"""${TrainPrepQueries.clsChainSql},
       |qm AS (
       |  SELECT doc_id,
       |         CAST(len($toks) AS BIGINT) AS n_tokens,
       |         CAST(CASE WHEN len($toks) > 0 THEN floor(10000 * ${hitsSql("en")} / len($toks)) ELSE 0 END AS BIGINT) AS stop_per_10k,
       |         CAST(CASE WHEN len($toks) > 0 THEN floor(100 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks)) ELSE 0 END AS BIGINT) AS mean_tok_len_x100
       |  FROM documents),
       |kp AS (SELECT doc_id,
       |              CAST(n_tokens >= 10 AND n_tokens <= 500 AND stop_per_10k <= 3000
       |                   AND mean_tok_len_x100 >= 200 AND mean_tok_len_x100 <= 800
       |                   AS BIGINT) AS keep
       |       FROM qm)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q181_rrf_fusion" ->
      s"""WITH ${SearchQueries.bm25ChainSql},
         |qls AS (SELECT doc_id, CAST(sum((1000000 * tf) // dl) AS BIGINT) AS qls
         |        FROM tf GROUP BY doc_id),
         |qlr AS (SELECT doc_id, CAST(row_number() OVER
         |          (ORDER BY qls DESC, doc_id) AS BIGINT) AS ql_rank FROM qls),
         |a AS (SELECT doc_id, rank AS bm25_rank FROM top WHERE rank <= $RrfDepth),
         |b AS (SELECT doc_id, ql_rank FROM qlr WHERE ql_rank <= $RrfDepth),
         |u AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.bm25_rank, b.ql_rank
         |      FROM a FULL JOIN b ON a.doc_id = b.doc_id),
         |f AS (SELECT doc_id, bm25_rank, ql_rank,
         |             CAST(coalesce(1000000 // ($RrfC + bm25_rank), 0)
         |                + coalesce(1000000 // ($RrfC + ql_rank), 0) AS BIGINT)
         |               AS rrf_x1e6
         |      FROM u),
         |rk AS (SELECT *, CAST(row_number() OVER
         |         (ORDER BY rrf_x1e6 DESC, doc_id) AS BIGINT) AS rank FROM f)
         |SELECT rank, doc_id, rrf_x1e6, bm25_rank, ql_rank
         |FROM rk WHERE rank <= $RrfK ORDER BY rank""".stripMargin,
    "q182_ndcg_at_k" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, rank, neighbor_id FROM r WHERE rank <= $knnK),
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |disc AS (SELECT [${DiscountX1e6.mkString(", ")}] AS d,
         |                [${IdealPrefixX1e6.mkString(", ")}] AS p),
         |dcg AS (
         |  SELECT k.query_id, ql.label AS q_label,
         |         CAST(sum(CASE WHEN ql.label = nl.label
         |                       THEN di.d[k.rank] ELSE 0 END)
         |              AS BIGINT) AS dcg
         |  FROM knn k
         |  JOIN lb ql ON ql.vec_id = k.query_id
         |  JOIN lb nl ON nl.vec_id = k.neighbor_id
         |  CROSS JOIN disc di
         |  GROUP BY k.query_id, ql.label),
         |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM lb GROUP BY label),
         |nd AS (
         |  SELECT dcg.q_label AS label,
         |         CASE WHEN least($knnK, sz.n_label - 1) <= 0 THEN 0
         |              ELSE (1000000 * dcg.dcg)
         |                   // di.p[least($knnK, sz.n_label - 1)]
         |         END AS ndcg_x1e6
         |  FROM dcg JOIN sz ON sz.label = dcg.q_label CROSS JOIN disc di)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(ndcg_x1e6) // count(*) AS BIGINT) AS mean_ndcg_x1e6
         |FROM nd GROUP BY label ORDER BY label""".stripMargin,
    "q183_classifier_auc" ->
      s"""WITH $clsKeepSql,
         |g AS (SELECT sc.score, CAST(sum(kp.keep) AS BIGINT) AS pos_s,
         |             CAST(count(*) - sum(kp.keep) AS BIGINT) AS neg_s
         |      FROM sc JOIN kp USING (doc_id) GROUP BY sc.score),
         |c AS (SELECT *, CAST(coalesce(sum(neg_s) OVER (ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |        AS neg_below
         |      FROM g),
         |t AS (SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
         |             CAST(sum(neg_s) AS BIGINT) AS n_neg,
         |             CAST(sum(pos_s * neg_below) AS BIGINT) AS concordant,
         |             CAST(sum(pos_s * neg_s) AS BIGINT) AS tied
         |      FROM c)
         |SELECT n_pos, n_neg, concordant, tied,
         |       CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
         |            ELSE (1000000 * (2 * concordant + tied)) // (2 * n_pos * n_neg)
         |            END AS BIGINT) AS auc_x1e6
         |FROM t""".stripMargin,
    "q184_knn_confusion" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= $knnK),
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |vt AS (SELECT k.query_id, l.label, CAST(count(*) AS BIGINT) AS votes
         |       FROM knn k JOIN lb l ON k.neighbor_id = l.vec_id
         |       GROUP BY k.query_id, l.label),
         |mj AS (SELECT query_id, label AS prop_label,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY votes DESC, label ASC) AS rn
         |       FROM vt),
         |lp AS (SELECT lb.vec_id, lb.label AS own_label, mj.prop_label
         |       FROM lb JOIN mj ON lb.vec_id = mj.query_id AND mj.rn = 1),
         |bt AS (SELECT own_label AS label, CAST(count(*) AS BIGINT) AS n_true,
         |              CAST(sum(CASE WHEN own_label = prop_label THEN 1 ELSE 0 END)
         |                   AS BIGINT) AS tp
         |       FROM lp GROUP BY own_label),
         |bp AS (SELECT prop_label AS label, CAST(count(*) AS BIGINT) AS n_pred
         |       FROM lp GROUP BY prop_label),
         |m AS (SELECT coalesce(bt.label, bp.label) AS label,
         |             coalesce(bt.n_true, 0) AS n_true,
         |             coalesce(bp.n_pred, 0) AS n_pred,
         |             coalesce(bt.tp, 0) AS tp
         |      FROM bt FULL JOIN bp ON bt.label = bp.label),
         |x AS (SELECT label, n_true, n_pred, tp,
         |             n_pred - tp AS fp, n_true - tp AS fn,
         |             CASE WHEN n_pred = 0 THEN 0 ELSE (10000 * tp) // n_pred END
         |               AS prec_x10k,
         |             CASE WHEN n_true = 0 THEN 0 ELSE (10000 * tp) // n_true END
         |               AS rec_x10k
         |      FROM m)
         |SELECT label, n_true, n_pred, tp, CAST(fp AS BIGINT) AS fp,
         |       CAST(fn AS BIGINT) AS fn,
         |       CAST(prec_x10k AS BIGINT) AS prec_x10k,
         |       CAST(rec_x10k AS BIGINT) AS rec_x10k,
         |       CAST(CASE WHEN prec_x10k + rec_x10k = 0 THEN 0
         |            ELSE (2 * prec_x10k * rec_x10k) // (prec_x10k + rec_x10k)
         |            END AS BIGINT) AS f1_x10k
         |FROM x ORDER BY label""".stripMargin,
    "q185_rater_kappa" ->
      s"""WITH $raterPairSql,
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) AS BIGINT)
         |                 AS n_agree
         |        FROM j),
         |m1 AS (SELECT l1 AS label, CAST(count(*) AS BIGINT) AS a FROM j GROUP BY l1),
         |m2 AS (SELECT l2 AS label, CAST(count(*) AS BIGINT) AS b FROM j GROUP BY l2),
         |sm AS (SELECT CAST(sum(coalesce(m1.a, 0) * coalesce(m2.b, 0)) AS BIGINT) AS s
         |       FROM m1 FULL JOIN m2 ON m1.label = m2.label)
         |SELECT n, n_agree,
         |       CAST((1000000 * n_agree) // n AS BIGINT) AS po_x1e6,
         |       CAST((1000000 * s) // (n * n) AS BIGINT) AS pe_x1e6,
         |       CAST(CASE WHEN n * n - s = 0 THEN 1000000
         |            ELSE (1000000 * (n * n_agree - s)) // (n * n - s)
         |            END AS BIGINT) AS kappa_x1e6
         |FROM tot CROSS JOIN sm""".stripMargin
  )
}
