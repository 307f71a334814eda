package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-23 fuzzy-matching / graph-analysis operators: SymSpell
  * typo detection (the deletion-neighborhood trick that makes edit-
  * distance-1 matching an EQUIJOIN), personalized PageRank (seeded
  * teleport — "relevance to THIS set", the retrieval/expansion walk),
  * and degree assortativity of the kNN graph (do well-connected vectors
  * cluster with each other — the hub-structure read).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object FuzzyQueries {

  /** Length bounds for spelling-variant candidates. */
  val TypoMinLen = 3
  val TypoMaxLen = 20

  /** X212 — SymSpell spelling-variant pairs: every pair of distinct
    * part-name vocabulary tokens within edit distance 1 — the fuzzy
    * attribute-matching pass a catalog/record-linkage pipeline runs to
    * find variant spellings ("rod"/"red", "old"/"cold") before keys are
    * joined on. The scale trick is SymSpell's deletion neighborhood:
    * every token emits its 1-deletion variants plus itself as join
    * keys, and ANY edit-distance-1 pair (insert, delete, substitute)
    * shares a key — so candidate generation is a pure EQUIJOIN on
    * variant strings (≤ len+1 keys per token), never an all-pairs
    * edit-distance scan; the exact `levenshtein = 1` rerank runs only
    * on candidates (the q81 rerank discipline).
    *
    * Scale: vocabulary-sized after the df aggregate (tokens, not
    * rows); variant fan-out bounded by token length ≤ [[TypoMaxLen]].
    * On a 100 TB corpus vocabulary this join is the SymSpell index —
    * the quadratic alternative never materializes. */
  def q194_typo_pairs(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.part(spark, dir)
      .select(explode(split(lower(col("p_name")), " ")).as("token"))
      .filter(length(col("token")).between(TypoMinLen, TypoMaxLen))
      .groupBy("token").agg(count(lit(1)).cast("long").as("df"))
    // token plus each single-deletion variant, as equijoin keys
    def variants(t: org.apache.spark.sql.Column) =
      array_union(array(t), transform(sequence(lit(1), length(t)),
        i => concat(t.substr(lit(1), i - 1), t.substr(i + 1, lit(1000)))))
    val keyed = df.select(col("token"), col("df"), explode(variants(col("token"))).as("v"))
    keyed.toDF("token_a", "df_a", "v")
      .join(keyed.toDF("token_b", "df_b", "v"), "v")
      .filter(col("token_a") < col("token_b"))
      .select("token_a", "token_b", "df_a", "df_b").distinct()
      .withColumn("edit_dist",
        levenshtein(col("token_a"), col("token_b")).cast("long"))
      .filter(col("edit_dist") === 1L)
      .orderBy("token_a", "token_b")
  }

  /** Personalized-PageRank seed set (label-0 vectors), scale, rounds. */
  val PprScale = 1000000L
  val PprRounds = 3

  /** X213 — personalized PageRank over the kNN graph: q131's integer
    * power iteration with the teleport mass restricted to the label-0
    * SEED set — "how relevant is every vector to THIS cluster", the
    * seeded-expansion walk behind related-item retrieval and
    * topic-sensitive ranking. Per round the identical edge equijoin +
    * dst partial aggregate (edge-list-bounded); the only change from
    * q131 is WHERE the 15% restart mass lands (seeds get
    * `0.15·Scale·N div |S|` so total mass is preserved at N·Scale).
    * Top 20 non-seed vectors by rank reported (the expansion answer). */
  def q195_personalized_pagerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val edges = OlapQueries.knnGraphPinned(spark, dir)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = emb.select(col("vec_id"),
      (col("label") === 0).cast("long").as("is_seed"))
    val counts = nodes.agg(count(lit(1)).as("n_nodes"), sum("is_seed").as("n_seeds"))
    // restart mass: seeds share the full 15% of N*Scale
    val seeded = nodes.crossJoin(broadcast(counts))
      .withColumn("restart",
        expr(s"CASE WHEN is_seed = 1 THEN (15 * $PprScale * n_nodes) div (100 * n_seeds) ELSE CAST(0 AS BIGINT) END"))
      .select("vec_id", "is_seed", "restart")
    var pr = seeded.select(col("vec_id"),
      expr(s"restart * 100 div 15").as("pr"))
    (1 to PprRounds).foreach { _ =>
      val contrib = edges.join(outdeg, "src")
        .join(pr.select(col("vec_id").as("src"), col("pr")), "src")
        .select(col("dst"), expr("(pr * 85) div (100 * outdeg)").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      pr = seeded.join(contrib.select(col("dst").as("vec_id"), col("in_mass")),
          Seq("vec_id"), "left")
        .select(col("vec_id"), col("is_seed"), col("restart"),
          (col("restart") + coalesce(col("in_mass"), lit(0L))).as("pr"))
        .select("vec_id", "pr")
    }
    val top = seeded.join(pr, "vec_id").filter(col("is_seed") === 0L)
      .select(col("vec_id"), col("pr"))
      .orderBy(col("pr").desc, col("vec_id")).limit(20)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("vec_id"))).cast("long"))
      .select("rank", "vec_id", "pr")
      .orderBy("rank")
  }

  /** X214 — degree assortativity of the kNN graph: Pearson correlation
    * of endpoint degrees over the undirected edge list (both
    * orientations, so the two marginals coincide and the correlation
    * needs NO square root: `r_x1e6 = (10⁶·Σ du'·dv') div Σ du'²` with
    * du' the degree centered on the FLOORED mean — q186's prescale,
    * keeping every term in BIGINT at sf1). Positive ⇒ hubs link to
    * hubs (a dense semantic core); negative ⇒ hub-and-spoke. The
    * structural summary next to q145's clustering coefficient and
    * q178's link prediction.
    *
    * Scale: degrees are one edge-list aggregate; the moment sums are
    * one more pass over 2|E| rows — never |V|². */
  def q196_degree_assortativity(spark: SparkSession, dir: String): DataFrame = {
    // Edge-sum algebra off the DEGREE table (round 12): the former shape
    // joined deg onto the directed edges twice and consumed that frame
    // twice (the 1-row moment aggregate AND the centered-product
    // aggregate), so the edge⋈deg⋈deg chain executed twice per run. All
    // moments except Σ_edges da·db are node-local — n = Σd, sx = Σ_edges
    // da = Σd², Σ_edges da² = Σd³ — and Σ_edges da·db = Σ_a d(a)·sn(a)
    // with sn(a) = Σ_{b∈N(a)} d(b), so ONE edges⋈deg join (the sn
    // aggregate) replaces the four edge-sized join passes. With
    // μ = sx div n (integer, exactly the old expr):
    //   num = Σ(da−μ)(db−μ) = s2 − 2μ·sx + n·μ²
    //   den = Σ(da−μ)²      = s3 − 2μ·sx + n·μ²
    // — same integers, same floor-div result.
    val und = OlapQueries.knnUndirectedPinned(spark, dir)
    val dirEdges = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
    val deg = dirEdges.groupBy("a").agg(count(lit(1)).cast("long").as("d"))
    val sn = dirEdges.join(deg.toDF("b", "db"), "b")
      .groupBy("a").agg(sum("db").as("snd"))
    // every node has ≥1 neighbor, so the inner join keeps every node
    deg.join(sn, "a")
      .agg(sum("d").as("n"), sum(col("d") * col("d")).as("sx"),
        sum(col("d") * col("d") * col("d")).as("s3"),
        sum(col("d") * col("snd")).as("s2"))
      .withColumn("mu", expr("sx div n"))
      .select(col("n").as("n_endpoints"),
        (col("s2") - lit(2L) * col("mu") * col("sx") +
          col("n") * col("mu") * col("mu")).as("num"),
        (col("s3") - lit(2L) * col("mu") * col("sx") +
          col("n") * col("mu") * col("mu")).as("den"))
      .withColumn("assort_x1e6",
        expr("CASE WHEN den = 0 THEN 0 ELSE (1000000 * num) div den END"))
      .select("n_endpoints", "num", "den", "assort_x1e6")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_typo_pairs" -> q194_typo_pairs,
    "q195_personalized_pagerank" -> q195_personalized_pagerank,
    "q196_degree_assortativity" -> q196_degree_assortativity
  )

  // ---------------------------------------------------------------- oracles



  private val variantsSql =
    """list_distinct([token] || list_transform(generate_series(1, length(token)),
      |  i -> substr(token, 1, i - 1) || substr(token, i + 1)))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q194_typo_pairs" ->
      s"""WITH df AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT unnest(string_split(lower(p_name), ' ')) AS token FROM part)
         |  WHERE length(token) BETWEEN $TypoMinLen AND $TypoMaxLen
         |  GROUP BY token),
         |k AS (SELECT token, df, unnest($variantsSql) AS v FROM df),
         |cand AS (SELECT DISTINCT a.token AS token_a, b.token AS token_b,
         |                a.df AS df_a, b.df AS df_b
         |         FROM k a JOIN k b ON a.v = b.v AND a.token < b.token)
         |SELECT token_a, token_b, df_a, df_b,
         |       CAST(levenshtein(token_a, token_b) AS BIGINT) AS edit_dist
         |FROM cand
         |WHERE levenshtein(token_a, token_b) = 1
         |ORDER BY token_a, token_b""".stripMargin,
    "q195_personalized_pagerank" -> {
      def round(i: Int): String =
        s"""p$i AS (
           |  SELECT s.vec_id, s.restart + coalesce(m.in_mass, 0) AS pr
           |  FROM seeded s LEFT JOIN (
           |    SELECT e.dst, CAST(sum((p.pr * 85) // (100 * o.outdeg)) AS BIGINT) AS in_mass
           |    FROM knn e
           |    JOIN od o ON o.src = e.src
           |    JOIN p${i - 1} p ON p.vec_id = e.src
           |    GROUP BY e.dst) m ON m.dst = s.vec_id)""".stripMargin
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id AS src, neighbor_id AS dst FROM r
         |        WHERE rank <= ${OlapQueries.KnnK}),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM knn GROUP BY src),
         |nodes AS (SELECT vec_id, CAST(label = 0 AS BIGINT) AS is_seed FROM embeddings),
         |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |               CAST(sum(is_seed) AS BIGINT) AS n_seeds FROM nodes),
         |seeded AS (
         |  SELECT vec_id, is_seed,
         |         CASE WHEN is_seed = 1
         |              THEN (15 * $PprScale * cnt.n_nodes) // (100 * cnt.n_seeds)
         |              ELSE 0 END AS restart
         |  FROM nodes CROSS JOIN cnt),
         |p0 AS (SELECT vec_id, restart * 100 // 15 AS pr FROM seeded),
         |${(1 to PprRounds).map(round).mkString(",\n")},
         |top AS (
         |  SELECT s.vec_id, CAST(p.pr AS BIGINT) AS pr,
         |         CAST(row_number() OVER (ORDER BY p.pr DESC, s.vec_id) AS BIGINT)
         |           AS rank
         |  FROM seeded s JOIN p$PprRounds p ON p.vec_id = s.vec_id
         |  WHERE s.is_seed = 0)
         |SELECT rank, vec_id, pr FROM top WHERE rank <= 20 ORDER BY rank""".stripMargin
    },
    "q196_degree_assortativity" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= ${OlapQueries.KnnK}),
         |und AS (SELECT DISTINCT least(query_id, neighbor_id) AS u,
         |               greatest(query_id, neighbor_id) AS v FROM knn),
         |de AS (SELECT u AS a, v AS b FROM und
         |       UNION ALL SELECT v AS a, u AS b FROM und),
         |dg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM de GROUP BY a),
         |wd AS (SELECT de.a, de.b, x.d AS da, y.d AS db
         |       FROM de JOIN dg x ON x.a = de.a JOIN dg y ON y.a = de.b),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(da) AS BIGINT) AS sx
         |      FROM wd),
         |c AS (SELECT wd.da - (m.sx // m.n) AS cda, wd.db - (m.sx // m.n) AS cdb,
         |             m.n
         |      FROM wd CROSS JOIN m)
         |SELECT CAST(max(n) AS BIGINT) AS n_endpoints,
         |       CAST(sum(cda * cdb) AS BIGINT) AS num,
         |       CAST(sum(cda * cda) AS BIGINT) AS den,
         |       CAST(CASE WHEN sum(cda * cda) = 0 THEN 0
         |            ELSE (1000000 * sum(cda * cdb)) // sum(cda * cda)
         |            END AS BIGINT) AS assort_x1e6
         |FROM c""".stripMargin
  )
}
