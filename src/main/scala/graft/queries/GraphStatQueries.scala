package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Round-5 wave-13b graph/embedding statistics: triangle counting +
  * local clustering coefficients over the kNN graph (how clique-y is
  * each embedding's neighborhood — dense semantic regions vs bridges),
  * kth-neighbor-similarity outlier scores (the kNN-distance outlier
  * detector: a vector whose 5th-best neighbor is still far is isolated),
  * and per-label embedding drift between corpus halves (did a label's
  * embedding distribution MOVE between two snapshots — the vector-space
  * twin of q123's token-frequency drift).
  *
  * All three reuse the q91 IVF-kNN machinery (deterministic trained
  * quantizer ⇒ oracle-exact approximate graph); triangle work is bounded
  * by Σdeg² with deg ≤ 2k, never by |V|².
  */
object GraphStatQueries {

  import OlapQueries.KnnK

  private def knnEdges(spark: SparkSession, dir: String): DataFrame =
    OlapQueries.knnGraphPinned(spark, dir)

  /** X152 — kNN-graph triangle count + local clustering coefficient:
    * undirected-canonicalize the q91 edges (u < v), enumerate each
    * triangle exactly once as an ordered wedge a<b<c closed by the (a,c)
    * edge, then credit all three corners. `cc_x10k = ⌊10⁴·2·tri /
    * (deg·(deg−1))⌋` — the per-node transitivity of the embedding
    * manifold (high = inside a dense duplicate/topic cluster, 0 at a
    * hub bridging unrelated regions).
    *
    * Scale: the wedge join fans out Σdeg² with deg ≤ 2k (a constant),
    * and closure is an equi-join back on the canonical edge set —
    * everything is edge-list-sized, the corpus is never re-touched. */
  def q145_knn_triangles(spark: SparkSession, dir: String): DataFrame = {
    // session-pinned: the canonical edge set feeds FOUR consumers here
    // (degree + the three triangle roles) and two sibling queries
    val und = OlapQueries.knnUndirectedPinned(spark, dir)
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val ab = und.select(col("u").as("a"), col("v").as("b"))
    val bc = und.select(col("u").as("b"), col("v").as("c"))
    val ac = und.select(col("u").as("a"), col("v").as("c"))
    val tri = ab.join(bc, "b").join(ac, Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_x10k", expr(
        "CASE WHEN degree < 2 THEN 0L ELSE (10000 * 2 * n_tri) div (degree * (degree - 1)) END"))
      .orderBy("node")
  }

  /** X153 — kth-neighbor outlier scores: each vector's WEAKEST retained
    * neighbor similarity (the dot of its rank-k edge) as an isolation
    * score — the classic kNN-distance outlier detector in similarity
    * form (low kth-dot = nothing near it, even at depth k). Flagged
    * below the corpus median: `med2` = exact interpolated median of
    * 2·kth_dot (doubling makes the even-n midpoint an exact integer in
    * doubles, the q48/q85 convention), outlier ⇔ 2·kth_dot < med2.
    *
    * Scale: one per-query argmax over the kNN edges (max-of-struct
    * partial aggregate), one global exact percentile over |V| scores
    * (at corpus scale: swap for the mergeable q67 sketch), broadcast
    * threshold join back. */
  def q146_knn_outliers(spark: SparkSession, dir: String): DataFrame = {
    val weakest = knnEdges(spark, dir)
      .groupBy(col("query_id").as("vec_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        max(struct(col("rank").as("r"), col("dot").as("d"))).as("m"))
      .select(col("vec_id"), col("n_neighbors"), col("m.d").as("kth_dot"))
    val med = weakest.agg(
      percentile(col("kth_dot") * 2, lit(0.5)).cast("long").as("med2"))
    weakest.crossJoin(broadcast(med))
      .select(col("vec_id"), col("n_neighbors"), col("kth_dot"),
        (col("kth_dot") * 2 < col("med2")).cast("int").as("outlier"))
      .orderBy("vec_id")
  }

  /** X154 — per-label embedding drift between corpus halves: split each
    * label's vectors by vec_id parity (the stand-in for two snapshots /
    * pipeline versions), compare the per-dimension integer centroids
    * `mean_x1k = (1000·Σv) div n`, and report the squared L2 gap summed
    * over dimensions — "did this label's embedding distribution move",
    * the vector-space twin of the q123 token-drift monitor (an encoder
    * regression or data shift shows up here before any downstream eval).
    *
    * Scale: one narrow posexplode pass, a (label × dim)-row aggregate,
    * a |labels|-row reduce — nothing corpus-quadratic, no windows. */
  def q147_embed_drift(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"), col("vec_id"),
        posexplode(quantize(col("embedding"))).as(Seq("dim", "v")))
      .withColumn("even", (col("vec_id") % 2 === 0).cast("long"))
      .groupBy("label", "dim")
      .agg(sum(when(col("even") === 1, col("v")).otherwise(0L)).as("s_a"),
        sum(col("even")).as("n_a"),
        sum(when(col("even") === 0, col("v")).otherwise(0L)).as("s_b"),
        sum(lit(1L) - col("even")).as("n_b"))
      .withColumn("mean_a_x1k", expr("CASE WHEN n_a = 0 THEN 0L ELSE (1000 * s_a) div n_a END"))
      .withColumn("mean_b_x1k", expr("CASE WHEN n_b = 0 THEN 0L ELSE (1000 * s_b) div n_b END"))
    cells.groupBy("label")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        sum((col("mean_a_x1k") - col("mean_b_x1k")) *
          (col("mean_a_x1k") - col("mean_b_x1k"))).as("drift_sq"))
      .orderBy("label")
  }

  /** Candidate links reported by q178. */
  val LinkTopK = 20

  /** X193 — common-neighbor link prediction over the kNN graph: for
    * node pairs NOT already connected, the number of shared neighbors
    * (the classic link-prediction / "you may also like" score, and on
    * an embedding kNN graph the near-miss detector: two vectors the
    * index didn't connect but whose neighborhoods agree — candidates a
    * dedup or retrieval pass should re-examine). Top [[LinkTopK]] by
    * (common neighbors desc, pair).
    *
    * Scale: the wedge join is the q145 machinery — Σdeg² with deg ≤ 2k,
    * a constant per node; the non-edge screen is a LEFT ANTI against
    * the canonical edge set; everything edge-list-sized, never |V|². */
  def q178_link_prediction(spark: SparkSession, dir: String): DataFrame = {
    val und = OlapQueries.knnUndirectedPinned(spark, dir)
    val adj = und.select(col("u").as("node"), col("v").as("nbr"))
      .union(und.select(col("v").as("node"), col("u").as("nbr")))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.node") === col("y.node") && col("x.nbr") < col("y.nbr"))
      .select(col("x.nbr").as("u"), col("y.nbr").as("v"))
    wedges.groupBy("u", "v")
      .agg(count(lit(1)).cast("long").as("common_neighbors"))
      .join(und, Seq("u", "v"), "left_anti")
      .orderBy(col("common_neighbors").desc, col("u"), col("v"))
      .limit(LinkTopK)
      .select(col("u").as("id_a"), col("v").as("id_b"), col("common_neighbors"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_knn_triangles" -> q145_knn_triangles,
    "q146_knn_outliers" -> q146_knn_outliers,
    "q147_embed_drift" -> q147_embed_drift,
    "q178_link_prediction" -> q178_link_prediction
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.quantVec

  val oracles: Map[String, String] = Map(
    "q145_knn_triangles" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= $KnnK),
         |und AS (SELECT DISTINCT least(query_id, neighbor_id) AS u,
         |               greatest(query_id, neighbor_id) AS v FROM knn),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
         |          SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
         |        GROUP BY node),
         |tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
         |        FROM und ab JOIN und bc ON ab.v = bc.u
         |        JOIN und ac ON ac.u = ab.u AND ac.v = bc.v),
         |nt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |          SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
         |          UNION ALL SELECT c AS node FROM tri)
         |       GROUP BY node)
         |SELECT deg.node, deg.degree, CAST(coalesce(nt.n_tri, 0) AS BIGINT) AS n_tri,
         |       CAST(CASE WHEN deg.degree < 2 THEN 0
         |            ELSE (10000 * 2 * coalesce(nt.n_tri, 0))
         |                 // (deg.degree * (deg.degree - 1)) END AS BIGINT) AS cc_x10k
         |FROM deg LEFT JOIN nt USING (node) ORDER BY deg.node""".stripMargin,
    "q146_knn_outliers" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id, dot, rank FROM r WHERE rank <= $KnnK),
         |wk AS (SELECT query_id AS vec_id, CAST(count(*) AS BIGINT) AS n_neighbors,
         |              CAST(max_by(dot, rank) AS BIGINT) AS kth_dot
         |       FROM knn GROUP BY query_id),
         |med AS (SELECT CAST(quantile_cont(kth_dot * 2, 0.5) AS BIGINT) AS med2 FROM wk)
         |SELECT vec_id, n_neighbors, kth_dot,
         |       CAST(CASE WHEN kth_dot * 2 < med.med2 THEN 1 ELSE 0 END AS INT) AS outlier
         |FROM wk CROSS JOIN med ORDER BY vec_id""".stripMargin,
    "q147_embed_drift" ->
      s"""WITH v AS (SELECT CAST(label AS BIGINT) AS label, vec_id, $quantVec AS qv
         |           FROM embeddings),
         |cell AS (
         |  SELECT label, CAST(unnest(generate_series(1, len(qv))) - 1 AS BIGINT) AS dim,
         |         unnest(qv) AS val,
         |         CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS even
         |  FROM v),
         |g AS (SELECT label, dim,
         |             CAST(sum(CASE WHEN even = 1 THEN val ELSE 0 END) AS BIGINT) AS s_a,
         |             CAST(sum(even) AS BIGINT) AS n_a,
         |             CAST(sum(CASE WHEN even = 0 THEN val ELSE 0 END) AS BIGINT) AS s_b,
         |             CAST(sum(1 - even) AS BIGINT) AS n_b
         |      FROM cell GROUP BY label, dim),
         |m AS (SELECT *,
         |             CASE WHEN n_a = 0 THEN 0 ELSE (1000 * s_a) // n_a END AS mean_a_x1k,
         |             CASE WHEN n_b = 0 THEN 0 ELSE (1000 * s_b) // n_b END AS mean_b_x1k
         |      FROM g)
         |SELECT label, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
         |       CAST(sum((mean_a_x1k - mean_b_x1k) * (mean_a_x1k - mean_b_x1k)) AS BIGINT)
         |         AS drift_sq
         |FROM m GROUP BY label ORDER BY label""".stripMargin,
    "q178_link_prediction" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= $KnnK),
         |und AS (SELECT DISTINCT least(query_id, neighbor_id) AS u,
         |               greatest(query_id, neighbor_id) AS v FROM knn),
         |adj AS (SELECT u AS node, v AS nbr FROM und
         |        UNION ALL
         |        SELECT v AS node, u AS nbr FROM und),
         |w AS (SELECT x.nbr AS u, y.nbr AS v
         |      FROM adj x JOIN adj y ON x.node = y.node AND x.nbr < y.nbr),
         |cn AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors
         |       FROM w GROUP BY u, v),
         |ne AS (SELECT cn.u, cn.v, cn.common_neighbors
         |       FROM cn LEFT JOIN und ON und.u = cn.u AND und.v = cn.v
         |       WHERE und.u IS NULL)
         |SELECT u AS id_a, v AS id_b, common_neighbors
         |FROM ne ORDER BY common_neighbors DESC, u, v LIMIT $LinkTopK""".stripMargin
  )
}
