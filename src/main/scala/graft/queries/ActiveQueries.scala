package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-57 selection/structure compositions:
  *
  *  - active-learning batch selection (q309): the uncertainty+diversity
  *    loop every labeling pipeline runs — pool the docs the frozen
  *    classifier is least sure about (|score| smallest), then greedy
  *    k-center over their embeddings so the batch spans the pool
  *    instead of stacking near-duplicates of one boundary region. A
  *    capstone composition (q97 scores + X103 coreset), like q199 is
  *    for retrieval and q276 for curation;
  *  - synchronous LPA communities (q310): two label-propagation rounds
  *    over the pinned kNN graph with labels initialized to own ids —
  *    COMMUNITY structure (who merges with whom), where q108/q184 use
  *    the same vote op for supervised classification and X19/q33 use CC
  *    for hard near-dup links. Deterministic: ties → smallest label.
  *
  * Scale shapes: q309's pool is a TakeOrdered top-U (bounded,
  * broadcastable) and each k-center round is one pass over the POOL
  * (not the corpus); q310 is two |V|·k edge-list vote rounds off the
  * session-pinned graph.
  */
object ActiveQueries {

  /** X340 — active-learning batch selection. Pool = [[AlPoolU]] docs by
    * smallest |score| (q97's coalesced-to-0 semantics, ties → doc_id);
    * batch = [[AlBatchK]] greedy k-centers over the pool's embeddings
    * ([[graft.ops.Coreset.kCenters]] — hash-spread seed, exact integer
    * distances). Output carries the uncertainty score and the coverage
    * radius so the labeling budget is auditable. */
  val AlPoolU = 64
  val AlBatchK = 8
  def q309_active_learning_batch(spark: SparkSession, dir: String): DataFrame = {
    val sc = Tables.documents(spark, dir).select("doc_id")
      .join(TrainPrepQueries.classifierScores(spark, dir), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"))
    val pool = sc.withColumn("m", abs(col("score")))
      .orderBy(col("m").asc, col("doc_id").asc).limit(AlPoolU)
    val poolEmb = pool
      .join(Tables.embeddings(spark, dir), col("vec_id") === col("doc_id"))
      .select(col("doc_id"), col("embedding"))
    graft.ops.Coreset.kCenters(poolEmb, AlBatchK, idCol = "doc_id")
      .withColumnRenamed("vec_id", "doc_id")
      .join(broadcast(pool.select("doc_id", "score")), "doc_id")
      .select("sel_round", "doc_id", "score", "radius_d2")
      .orderBy("sel_round")
  }

  /** X341 — synchronous LPA community detection: labels start as own
    * ids; each round every node adopts the most frequent label among
    * its kNN out-neighbors (ties → smallest). After [[LpaRounds]]
    * rounds, the community-size histogram — the soft-cluster view of
    * the embedding manifold (CC over the same edges answers only
    * reachability). */
  val LpaRounds = 2
  def q310_lpa_communities(spark: SparkSession, dir: String): DataFrame =
    lpaLabels(spark, dir)
      .groupBy("lbl").agg(count(lit(1)).as("community_size"))
      .orderBy(col("community_size").desc, col("lbl").asc)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q309_active_learning_batch" -> q309_active_learning_batch,
    "q310_lpa_communities" -> q310_lpa_communities
  )

  /** The q310 LPA label chain (kNN edges `e`, per-round majority votes,
    * final labels `l2`) — shared with q331's modularity oracle. */
  private[queries] lazy val lpaChainSql: String =
    s"""${OlapQueries.knnChainSql},
       |e AS (SELECT query_id, neighbor_id FROM r WHERE rank <= ${OlapQueries.KnnK}),
       |l0 AS (SELECT vec_id, vec_id AS lbl FROM embeddings),
       |v1 AS (SELECT e.query_id, l.lbl, count(*) AS votes
       |       FROM e JOIN l0 l ON l.vec_id = e.neighbor_id
       |       GROUP BY e.query_id, l.lbl),
       |l1 AS (SELECT query_id AS vec_id, lbl FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |                  ORDER BY votes DESC, lbl ASC) AS rn FROM v1)
       |       WHERE rn = 1),
       |v2 AS (SELECT e.query_id, l.lbl, count(*) AS votes
       |       FROM e JOIN l1 l ON l.vec_id = e.neighbor_id
       |       GROUP BY e.query_id, l.lbl),
       |l2 AS (SELECT query_id AS vec_id, lbl FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |                  ORDER BY votes DESC, lbl ASC) AS rn FROM v2)
       |       WHERE rn = 1)""".stripMargin

  /** The LPA label ASSIGNMENT (vec_id → lbl) after [[LpaRounds]] — the
    * DataFrame twin of `lpaChainSql`'s `l2`, reused by q331. */
  private[queries] def lpaLabels(spark: SparkSession, dir: String): DataFrame = {
    val edges = OlapQueries.knnGraphPinned(spark, dir)
      .select("query_id", "neighbor_id")
    var labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("vec_id").as("lbl"))
    (1 to LpaRounds).foreach { _ =>
      val votes = edges
        .join(labels.select(col("vec_id").as("neighbor_id"), col("lbl")), "neighbor_id")
        .groupBy("query_id", "lbl").agg(count(lit(1)).as("votes"))
      labels = votes.withColumn("rn", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("votes").desc, col("lbl").asc)))
        .filter(col("rn") === 1)
        .select(col("query_id").as("vec_id"), col("lbl"))
    }
    labels
  }

  val oracles: Map[String, String] = Map(
    "q309_active_learning_batch" -> {
      import TrainPrepQueries.{clsChainSql, qdistSql, kcRoundSql}
      val d0 = qdistSql.format("v.qv", "v.qv", "s.cqv", "v.qv", "s.cqv")
      val rounds = (1 until AlBatchK).map(kcRoundSql).mkString(",\n")
      val union = (1 until AlBatchK).map(r =>
        s"SELECT CAST($r AS BIGINT) AS sel_round, cid AS doc_id, cd AS radius_d2 FROM c$r")
        .mkString("\n  UNION ALL ")
      s"""WITH $clsChainSql,
         |sca AS (SELECT d.doc_id, CAST(coalesce(sc.score, 0) AS BIGINT) AS score
         |        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
         |pool AS (SELECT doc_id, score FROM sca
         |         ORDER BY abs(score) ASC, doc_id ASC LIMIT $AlPoolU),
         |v AS (SELECT p.doc_id AS id, ${DataPrepQueries.quantVec} AS qv
         |      FROM pool p JOIN embeddings ON embeddings.vec_id = p.doc_id),
         |s0 AS (SELECT id AS cid, qv AS cqv FROM v
         |       ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 1),
         |m0 AS (SELECT v.id, v.qv, $d0 AS d FROM v, s0 s),
         |$rounds,
         |sel AS (
         |  SELECT CAST(0 AS BIGINT) AS sel_round, cid AS doc_id,
         |         CAST(0 AS BIGINT) AS radius_d2 FROM s0
         |  UNION ALL $union)
         |SELECT sel.sel_round, sel.doc_id, pool.score, sel.radius_d2
         |FROM sel JOIN pool ON pool.doc_id = sel.doc_id
         |ORDER BY sel.sel_round""".stripMargin
    },
    "q310_lpa_communities" ->
      s"""WITH $lpaChainSql
         |SELECT lbl, count(*) AS community_size
         |FROM l2 GROUP BY lbl
         |ORDER BY community_size DESC, lbl ASC""".stripMargin
  )
}
