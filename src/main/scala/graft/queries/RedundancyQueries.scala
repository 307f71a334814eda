package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Round-8 wave-98:
  *
  *  - retrieved-set redundancy audit (q394): how much of the BM25
  *    top-k is the SAME document in light disguise — pairwise lexical
  *    jaccard over the retrieved set (missing pairs count as zero, so
  *    the mean is over all C(k,2) slot pairs), the worst pair, and
  *    the count clearing the near-dup bar. The retrieval-side
  *    complement of q191's MMR: MMR spends rank positions to BUY
  *    diversity, this MEASURES the redundancy a plain top-k carries
  *    (the number that justifies turning MMR on). Rides the pinned
  *    shingle/pair core restricted to k ids — bounded by C(k,2)
  *    everywhere.
  */
object RedundancyQueries {

  /** X428 — top-k redundancy: slot pairs, overlapping pairs, mean and
    * max jaccard ×10⁴ over all slot pairs, near-dup pair count. */
  def q394_topk_redundancy(spark: SparkSession, dir: String): DataFrame = {
    val top = SearchQueries.bm25Scored(spark, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(SearchQueries.Bm25K)
      .select(col("doc_id"))
    val pairs = Dedup.jaccardPairsPinned(spark, dir, n = DataPrepQueries.ShingleN,
        minJaccardX10k = 0L, maxDf = DataPrepQueries.JaccardMaxDf)
      .select("id_a", "id_b", "jaccard_x10k")
      .join(broadcast(top.select(col("doc_id").as("id_a"))), "id_a")
      .join(broadcast(top.select(col("doc_id").as("id_b"))), "id_b")
    val kCnt = top.agg(count(lit(1)).as("k"))
    pairs.agg(count(lit(1)).as("n_overlap"),
        coalesce(sum("jaccard_x10k"), lit(0L)).as("sum_j"),
        coalesce(max("jaccard_x10k"), lit(0L)).as("max_j_x10k"),
        coalesce(sum(when(col("jaccard_x10k") >= DataPrepQueries.JaccardMinX10k, 1L)
          .otherwise(0L)), lit(0L)).as("n_redundant"))
      .crossJoin(broadcast(kCnt))
      .withColumn("n_possible", expr("k * (k - 1) div 2"))
      .withColumn("mean_j_x10k", expr(
        "CASE WHEN n_possible = 0 THEN 0L ELSE sum_j div n_possible END"))
      .select("k", "n_possible", "n_overlap", "mean_j_x10k", "max_j_x10k",
        "n_redundant")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q394_topk_redundancy" -> q394_topk_redundancy
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{JaccardMaxDf, JaccardMinX10k, shingleCte}

  val oracles: Map[String, String] = Map(
    "q394_topk_redundancy" ->
      s"""WITH ${SearchQueries.bm25ChainSql},
         |topk AS (SELECT doc_id FROM top WHERE rank <= ${SearchQueries.Bm25K}),
         |$shingleCte,
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $JaccardMaxDf) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |pj AS (
         |  SELECT i.id_a, i.id_b,
         |         CAST(floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common))
         |           AS BIGINT) AS jaccard_x10k
         |  FROM inter i
         |  JOIN sizes sa ON sa.id = i.id_a
         |  JOIN sizes sb ON sb.id = i.id_b
         |  JOIN topk ta ON ta.doc_id = i.id_a
         |  JOIN topk tb ON tb.doc_id = i.id_b),
         |kc AS (SELECT CAST(count(*) AS BIGINT) AS k FROM topk),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap,
         |               CAST(coalesce(sum(jaccard_x10k), 0) AS BIGINT) AS sum_j,
         |               CAST(coalesce(max(jaccard_x10k), 0) AS BIGINT) AS max_j_x10k,
         |               CAST(coalesce(sum(CASE WHEN jaccard_x10k >= $JaccardMinX10k
         |                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_redundant
         |        FROM pj)
         |SELECT kc.k, CAST(kc.k * (kc.k - 1) // 2 AS BIGINT) AS n_possible,
         |       agg.n_overlap,
         |       CAST(CASE WHEN kc.k * (kc.k - 1) // 2 = 0 THEN 0
         |            ELSE agg.sum_j // (kc.k * (kc.k - 1) // 2) END AS BIGINT)
         |         AS mean_j_x10k,
         |       agg.max_j_x10k, agg.n_redundant
         |FROM agg CROSS JOIN kc""".stripMargin
  )
}
