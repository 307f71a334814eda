package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.KMeans

/** Round-8 wave-96:
  *
  *  - k-means assignment-churn audit (q390): how many vectors changed
  *    cells between Lloyd round 1 and round 2 — the convergence
  *    evidence behind freezing the IVF quantizer at a fixed round
  *    count (q223's elbow picks k; this says whether ITERS was
  *    enough). Per final cell: population, arrivals, churn share
  *    ×10⁴; both assignments ride the same trained-seed path, so the
  *    audit is oracle-exact;
  *  - normalization-collision audit (q391): exact-dedup groups whose
  *    members have DIFFERENT raw text — the docs merged purely by
  *    normalization (lowercasing, punctuation strip, whitespace
  *    collapse). A high collision share means the fingerprint is
  *    more aggressive than "exact" suggests, and the q15 keep-first
  *    policy is silently choosing among non-identical documents.
  */
object ChurnAuditQueries {

  /** X424 — assignment churn between Lloyd rounds 1 and 2, per final
    * cell: population, arrivals from a different cell, churn ×10⁴. */
  def q390_assignment_churn(spark: SparkSession, dir: String): DataFrame = {
    import AnalyticsQueries.KmeansK
    val emb = Tables.embeddings(spark, dir)
    val a1 = KMeans.lloydAssign(emb, KmeansK, iters = 1)
      .select(col("id"), col("cluster").as("c1"))
    val a2 = KMeans.lloydAssign(emb, KmeansK, iters = 2)
      .select(col("id"), col("cluster").as("c2"))
    a1.join(a2, "id")
      .groupBy(col("c2").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("c1") =!= col("c2"), 1L).otherwise(0L)).as("n_arrived"))
      .withColumn("churn_x10k", expr("(10000 * n_arrived) div n_vectors"))
      .orderBy("cluster")
  }

  /** X425 — normalization collisions: among multi-member fingerprint
    * groups, those containing >1 DISTINCT raw text, with the worst
    * variant count. */
  def q391_norm_collisions(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(spark, dir)
      .select(fingerprint(col("text")).as("fp"), col("text"))
    val groups = fp.groupBy("fp")
      .agg(count(lit(1)).as("n_members"),
        countDistinct("text").as("n_variants"))
      .filter(col("n_members") > 1)
    groups.agg(count(lit(1)).as("n_dup_groups"),
        coalesce(sum(when(col("n_variants") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_collision_groups"),
        coalesce(max("n_variants"), lit(0L)).as("max_variants"))
      .withColumn("collision_x10k", expr(
        "CASE WHEN n_dup_groups = 0 THEN 0L " +
          "ELSE (10000 * n_collision_groups) div n_dup_groups END"))
      .select("n_dup_groups", "n_collision_groups", "collision_x10k", "max_variants")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q390_assignment_churn" -> q390_assignment_churn,
    "q391_norm_collisions" -> q391_norm_collisions
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.norm

  val oracles: Map[String, String] = Map(
    "q390_assignment_churn" -> {
      import AnalyticsQueries.lloydAssignSql
      s"""WITH $lloydAssignSql
         |SELECT a2.cluster,
         |       CAST(count(*) AS BIGINT) AS n_vectors,
         |       CAST(sum(CASE WHEN a1.cluster <> a2.cluster THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_arrived,
         |       CAST((10000 * sum(CASE WHEN a1.cluster <> a2.cluster THEN 1 ELSE 0 END))
         |            // count(*) AS BIGINT) AS churn_x10k
         |FROM a2 JOIN a1 USING (id)
         |GROUP BY a2.cluster ORDER BY a2.cluster""".stripMargin
    },
    "q391_norm_collisions" ->
      s"""WITH fp AS (SELECT md5($norm) AS fp, text FROM documents),
         |g AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_members,
         |             CAST(count(DISTINCT text) AS BIGINT) AS n_variants
         |      FROM fp GROUP BY fp HAVING count(*) > 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
         |       CAST(coalesce(sum(CASE WHEN n_variants > 1 THEN 1 ELSE 0 END), 0)
         |         AS BIGINT) AS n_collision_groups,
         |       CAST(CASE WHEN count(*) = 0 THEN 0
         |            ELSE (10000 * coalesce(sum(CASE WHEN n_variants > 1
         |                  THEN 1 ELSE 0 END), 0)) // count(*) END AS BIGINT)
         |         AS collision_x10k,
         |       CAST(coalesce(max(n_variants), 0) AS BIGINT) AS max_variants
         |FROM g""".stripMargin
  )
}
