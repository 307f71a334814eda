package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-78:
  *
  *  - hash-width collision audit (q355): exact collision census of
  *    md5-prefix surrogate keys at 4/6/8 hex digits, next to the
  *    birthday-bound expectation C(n,2)/16^w — the key-width sizing
  *    decision every pipeline that mints hash ids makes once and
  *    regrets at 100 TB (q336 prices the Bloom filter's bits; this
  *    prices the ID itself). One grouped pass per width;
  *  - kNN label homophily (q356): per label, the share of kNN edges
  *    whose endpoints agree, vs the label's base rate among graph
  *    nodes — lift > 1 means the embedding clusters that label
  *    (q108's label propagation assumes exactly this; this measures
  *    it). Rides the pinned kNN core; the per-label table is
  *    \|labels\|-bounded.
  */
object HomophilyQueries {

  /** Hex-digit widths audited (16^w key spaces). */
  val HashWidths: Seq[Int] = Seq(4, 6, 8)

  /** X386 — hash-width collision audit: per width, distinct keys,
    * excess (rows minus distinct — the collision mass), colliding-key
    * count, and the birthday expectation ⌊C(n,2)/16^w⌋. */
  def q355_hash_collisions(spark: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(spark, dir)
      .select(md5(col("doc_id").cast("string")).as("h"))
    val perW = HashWidths.map { w =>
      val space = math.pow(16, w).toLong
      val keys = ids.select(substring(col("h"), 1, w).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
      keys.agg(sum("c").as("n_keys"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_colliding_keys"))
        .select(lit(w.toLong).as("width_hex"), col("n_keys"), col("n_distinct"),
          (col("n_keys") - col("n_distinct")).as("n_excess"),
          col("n_colliding_keys"),
          expr(s"(n_keys * (n_keys - 1) div 2) div ${space}L").as("expected_excess"))
    }
    perW.reduce(_.unionByName(_)).orderBy("width_hex")
  }

  /** X387 — kNN label homophily: directed edges of the pinned
    * undirected core, grouped by the source endpoint's label;
    * homophily ×10⁴ = same-label edge share, base ×10⁴ = the label's
    * node share, lift ×100 = homophily/base. */
  def q356_label_homophily(spark: SparkSession, dir: String): DataFrame = {
    val und = OlapQueries.knnUndirectedPinned(spark, dir)
    val lab = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val de = und.select(col("u").as("a"), col("v").as("b"))
      .unionByName(und.select(col("v").as("a"), col("u").as("b")))
    val e = de
      .join(lab.select(col("vec_id").as("a"), col("label").as("la")), "a")
      .join(lab.select(col("vec_id").as("b"), col("label").as("lb")), "b")
    val nodes = de.select(col("a").as("id")).distinct()
      .join(lab.select(col("vec_id").as("id"), col("label")), "id")
    val nTot = nodes.agg(count(lit(1)).as("n_graph_nodes"))
    val base = nodes.groupBy("label").agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(nTot))
      .withColumn("base_x10k", expr("(10000 * n_nodes) div n_graph_nodes"))
    e.groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("n_dir_edges"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_same"))
      .withColumn("homophily_x10k", expr("(10000 * n_same) div n_dir_edges"))
      .join(broadcast(base), "label")
      .withColumn("lift_x100", expr(
        "CASE WHEN base_x10k = 0 THEN 0L ELSE (100 * homophily_x10k) div base_x10k END"))
      .select("label", "n_nodes", "base_x10k", "n_dir_edges", "n_same",
        "homophily_x10k", "lift_x100")
      .orderBy("label")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q355_hash_collisions" -> q355_hash_collisions,
    "q356_label_homophily" -> q356_label_homophily
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q355_hash_collisions" -> {
      val arms = HashWidths.map { w =>
        val space = math.pow(16, w).toLong
        s"""SELECT CAST($w AS BIGINT) AS width_hex,
           |       CAST(sum(c) AS BIGINT) AS n_keys,
           |       CAST(count(*) AS BIGINT) AS n_distinct,
           |       CAST(sum(c) - count(*) AS BIGINT) AS n_excess,
           |       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_colliding_keys,
           |       CAST((sum(c) * (sum(c) - 1) // 2) // $space AS BIGINT)
           |         AS expected_excess
           |FROM (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, $w) AS k,
           |             count(*) AS c
           |      FROM documents GROUP BY 1)""".stripMargin
      }
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY width_hex")
    },
    "q356_label_homophily" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= ${OlapQueries.KnnK}),
         |und AS (SELECT DISTINCT least(query_id, neighbor_id) AS u,
         |               greatest(query_id, neighbor_id) AS v FROM knn),
         |de AS (SELECT u AS a, v AS b FROM und
         |       UNION ALL SELECT v AS a, u AS b FROM und),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |e AS (SELECT x.label AS la, y.label AS lb FROM de
         |      JOIN lab x ON x.vec_id = de.a JOIN lab y ON y.vec_id = de.b),
         |nodes AS (SELECT DISTINCT de.a AS id FROM de),
         |nl AS (SELECT n.id, l.label FROM nodes n JOIN lab l ON l.vec_id = n.id),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_graph_nodes FROM nl),
         |base AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
         |                CAST((10000 * count(*)) // max(nt.n_graph_nodes) AS BIGINT)
         |                  AS base_x10k
         |         FROM nl CROSS JOIN nt GROUP BY label),
         |hom AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS n_dir_edges,
         |               CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         |                 AS n_same
         |        FROM e GROUP BY la)
         |SELECT h.label, b.n_nodes, b.base_x10k, h.n_dir_edges, h.n_same,
         |       CAST((10000 * h.n_same) // h.n_dir_edges AS BIGINT) AS homophily_x10k,
         |       CAST(CASE WHEN b.base_x10k = 0 THEN 0
         |            ELSE (100 * ((10000 * h.n_same) // h.n_dir_edges)) // b.base_x10k
         |            END AS BIGINT) AS lift_x100
         |FROM hom h JOIN base b USING (label)
         |ORDER BY label""".stripMargin
  )
}
