package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-6 wave-32a retrieval/governance operators: proximity search
  * (the NEAR operator between phrase-exact and bag-of-words), quota-
  * constrained top-k (provenance-fair ranking), and a disparate-impact
  * audit of the quality gate (the 80%-rule read a responsible curation
  * pipeline reports per source).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object GovernQueries {

  /** Proximity probe: both terms within [[ProxWindow]] token positions. */
  val ProxTermA = "customer"
  val ProxTermB = "query"
  val ProxWindow = 5L

  /** X240 — proximity search (NEAR operator): docs where
    * [[ProxTermA]] and [[ProxTermB]] co-occur within [[ProxWindow]]
    * token positions — per doc the qualifying position-pair count and
    * the closest distance. Sits between q190's exact-adjacent phrase
    * and plain co-occurrence: the standard retrieval predicate for
    * "about X in the context of Y".
    *
    * Scale: each term's position list is a map-side filter of the
    * token stream (pushed predicates, no index rebuild); the pair join
    * keys on doc over the two SMALL filtered sides. */
  def q219_proximity_search(spark: SparkSession, dir: String): DataFrame = {
    val tk = graft.ops.Dedup.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), posexplode(wsTokens(normalizeText(col("text")))).as(Seq("p", "token")))
    val pa = tk.filter(col("token") === ProxTermA).select(col("doc_id"), col("p").as("pa"))
    val pb = tk.filter(col("token") === ProxTermB).select(col("doc_id"), col("p").as("pb"))
    pa.join(pb, "doc_id")
      .withColumn("dist", abs(col("pa") - col("pb")).cast("long"))
      .filter(col("dist") >= 1L && col("dist") <= ProxWindow)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"), min("dist").as("min_dist"))
      .orderBy("doc_id")
  }

  /** Quota ranking: global depth and the per-source cap. */
  val QuotaTopK = 50
  val QuotaPerSource = 15

  /** X241 — quota-constrained top-k: the [[QuotaTopK]] best docs by
    * q97 classifier score (ties → doc_id) under a [[QuotaPerSource]]
    * cap per source — provenance-fair ranking (result diversification
    * by source), the selection shape a mixed-corpus sampler or search
    * results page applies so one dominant source can't fill the list.
    *
    * Scale: the per-source cap rides the bounded-heap top-k aggregate
    * (X76 — ≤ cap rows per (source, task) survive map-side), the
    * global cut is a TakeOrdered over ≤ |sources|·cap rows; the score
    * itself is the session-pinned classifier core. */
  def q220_quota_topk(spark: SparkSession, dir: String): DataFrame = {
    val scored = TrainPrepQueries.classifierScores(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
    val capped = graft.ops.Relational.topKPerGroup(
      scored.select(col("source"), col("score"), col("doc_id")),
      groupCols = Seq("source"), ordCol = "score", idCol = "doc_id", k = QuotaPerSource)
    capped.orderBy(col("score").desc, col("doc_id")).limit(QuotaTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("source"), col("score"))
      .orderBy("rank")
  }

  /** The 80%-rule threshold ×10⁴. */
  val ImpactFloorX10k = 8000L

  /** X242 — disparate-impact audit of the quality gate: per source the
    * q26 keep rate, its ratio to the BEST source's rate ×10⁴, and the
    * four-fifths-rule flag (ratio < [[ImpactFloorX10k]]) — the fairness
    * read a curation pipeline publishes next to its datasheet: a gate
    * that keeps 60% of one source and 20% of another is a corpus-
    * composition decision, whether or not it was meant as one.
    *
    * Scale: one scalar pass + |sources|-row aggregate + 1-row best. */
  def q221_impact_audit(spark: SparkSession, dir: String): DataFrame = {
    val keep = DataPrepQueries.q26_quality_filter(spark, dir)
      .select(col("doc_id"), col("keep").cast("long").as("keep"))
    val bySource = Tables.documents(spark, dir).select("doc_id", "source")
      .join(keep, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_keep"))
      .withColumn("keep_x10k", expr("(10000 * n_keep) div n_docs"))
    val best = bySource.agg(max("keep_x10k").as("best_x10k"))
    bySource.crossJoin(broadcast(best))
      .withColumn("ratio_to_best_x10k",
        expr("CASE WHEN best_x10k = 0 THEN 10000 ELSE (10000 * keep_x10k) div best_x10k END"))
      .withColumn("flagged", (col("ratio_to_best_x10k") < ImpactFloorX10k).cast("int"))
      .select("source", "n_docs", "n_keep", "keep_x10k", "ratio_to_best_x10k", "flagged")
      .orderBy("source")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q219_proximity_search" -> q219_proximity_search,
    "q220_quota_topk" -> q220_quota_topk,
    "q221_impact_audit" -> q221_impact_audit
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  val oracles: Map[String, String] = Map(
    "q219_proximity_search" ->
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |tk AS (SELECT doc_id, CAST(unnest(generate_series(1, len(t))) - 1 AS BIGINT) AS p,
         |              unnest(t) AS token FROM d),
         |pa AS (SELECT doc_id, p AS pa FROM tk WHERE token = '$ProxTermA'),
         |pb AS (SELECT doc_id, p AS pb FROM tk WHERE token = '$ProxTermB'),
         |h AS (SELECT pa.doc_id, abs(pa.pa - pb.pb) AS dist
         |      FROM pa JOIN pb USING (doc_id)
         |      WHERE abs(pa.pa - pb.pb) BETWEEN 1 AND $ProxWindow)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(min(dist) AS BIGINT) AS min_dist
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q220_quota_topk" ->
      s"""WITH ${TrainPrepQueries.clsChainSql},
         |sd AS (SELECT sc.doc_id, d.source, sc.score
         |       FROM sc JOIN documents d USING (doc_id)),
         |sr AS (SELECT *, row_number() OVER (PARTITION BY source
         |                 ORDER BY score DESC, doc_id) AS srk FROM sd),
         |cp AS (SELECT doc_id, source, score FROM sr WHERE srk <= $QuotaPerSource),
         |gr AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         |         AS rank FROM cp)
         |SELECT rank, doc_id, source, score FROM gr
         |WHERE rank <= $QuotaTopK ORDER BY rank""".stripMargin,
    "q221_impact_audit" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |bs AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |              CAST(sum(kp.keep) AS BIGINT) AS n_keep
         |       FROM documents d JOIN kp USING (doc_id) GROUP BY d.source),
         |br AS (SELECT *, CAST((10000 * n_keep) // n_docs AS BIGINT) AS keep_x10k FROM bs),
         |bb AS (SELECT CAST(max(keep_x10k) AS BIGINT) AS best_x10k FROM br)
         |SELECT br.source, br.n_docs, br.n_keep, br.keep_x10k,
         |       CAST(CASE WHEN bb.best_x10k = 0 THEN 10000
         |            ELSE (10000 * br.keep_x10k) // bb.best_x10k END AS BIGINT)
         |         AS ratio_to_best_x10k,
         |       CAST(CASE WHEN (CASE WHEN bb.best_x10k = 0 THEN 10000
         |            ELSE (10000 * br.keep_x10k) // bb.best_x10k END) < $ImpactFloorX10k
         |            THEN 1 ELSE 0 END AS INT) AS flagged
         |FROM br, bb ORDER BY br.source""".stripMargin
  )
}
