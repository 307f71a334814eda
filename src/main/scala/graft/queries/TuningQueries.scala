package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.ops.Dedup

/** Round-5 wave-14a index-tuning operators: prefix-dimension two-stage
  * ANN (the Matryoshka/truncated-embedding retrieval trick — coarse-score
  * on a dimension prefix, exact-rerank the survivors), the empirical LSH
  * S-curve (what fraction of true near-dup pairs the banding actually
  * catches, by similarity bucket — the tuning read before trusting a
  * band configuration at corpus scale), and daily distinct-user counts
  * with the mergeable-sketch error contract (the windowed form of q61).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key. */
object TuningQueries {

  /** Prefix-ANN geometry: coarse dot on the first `PrefixDims` of the
    * quantized vector, `CandK` survivors, exact top-`PrefixK` rerank. */
  val PrefixDims = 16
  val CandK = 50
  val PrefixK = 5
  val PrefixQueryMod = 250L
  /** LSH-curve floor: pairs with exact Jaccard below this are not
    * reported (they are the intended misses of an 8000-threshold
    * screen; the curve reads detection from here up). */
  val CurveMinX10k = 2000L

  /** X162 — prefix-dimension two-stage ANN: score candidates on the
    * FIRST `PrefixDims` dimensions only (Matryoshka-style truncation —
    * prefix dims carry most of the signal in MRL-trained embeddings,
    * and a 4× narrower vector is a 4× cheaper scan/shuffle), keep
    * `CandK` per query, then exact-rerank the survivors on the full
    * vector. Both stages ride the bounded heap (≤ k rows per query per
    * task); the full-width vectors are touched only candidate-side —
    * at corpus scale that is the difference between streaming 1/4 of
    * the bytes and all of them. Deterministic, so the two-stage result
    * is oracle-exact (same discipline as the q31 IVF path). */
  def q153_prefix_ann(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val queries = emb.filter(col("vec_id") % PrefixQueryMod === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("quv"))
    val coarse = broadcast(queries
      .select(col("query_id"), slice(col("quv"), 1, PrefixDims).as("qp")))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
        slice(col("qv"), 1, PrefixDims).as("cp")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), qdot(col("qp"), col("cp")).as("cdot"))
    val cands = graft.ops.Relational.topKPerGroup(
        coarse, Seq("query_id"), "cdot", "neighbor_id", CandK)
      .select("query_id", "neighbor_id")
    val rerank = cands
      .join(emb.select(col("vec_id").as("neighbor_id"), col("qv").as("cv")), "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"), qdot(col("quv"), col("cv")).as("dot"))
    graft.ops.Relational.topKPerGroup(rerank, Seq("query_id"), "dot", "neighbor_id", PrefixK)
      .select("query_id", "rank", "neighbor_id", "dot")
      .orderBy("query_id", "rank")
  }

  /** X166 — empirical LSH S-curve: exact-Jaccard pairs (from the SAME
    * pinned inverted-index core as q16/q76) bucketed by similarity
    * decile, each pair flagged by whether the q17 MinHash banding would
    * have proposed it — the measured detection-probability curve
    * 1−(1−j^r)^b that decides bands×rows before a corpus-scale dedup
    * rollout (q119 is this read for the IVF index; this is it for the
    * text screen). Work: the bounded pair set left-joins the bounded
    * band-collision set; nothing corpus-quadratic. */
  def q157_lsh_curve(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.jaccardPairsPinned(spark, dir,
      n = DataPrepQueries.ShingleN,
      minJaccardX10k = CurveMinX10k, maxDf = DataPrepQueries.JaccardMaxDf)
    val caught = Dedup.minhashLshPairs(docs, n = DataPrepQueries.ShingleN,
        bands = DataPrepQueries.MinhashBands, rowsPerBand = DataPrepQueries.MinhashRows)
      .withColumn("caught", lit(1L))
    exact.join(caught, Seq("id_a", "id_b"), "left")
      .select(col("jaccard_x10k"), coalesce(col("caught"), lit(0L)).as("caught"))
      .withColumn("bucket", expr("jaccard_x10k div 1000"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"), sum("caught").as("n_caught"))
      .withColumn("catch_x10k", expr("(10000 * n_caught) div n_pairs"))
      .orderBy("bucket")
  }

  /** X165 — daily distinct users, sketch-checked: per UTC day the event
    * volume, the EXACT distinct-user count, and the 0/1 verdict that the
    * mergeable HLL estimate lands within 5% — q61's error contract on a
    * time axis, i.e. the shape a dashboard's daily-actives tile
    * computes. At corpus scale only the sketch column survives (the
    * exact count is the oracle's job); the sketch partial-aggregates
    * map-side and merges associatively, so days × users never
    * co-shuffle raw ids more than once. */
  def q156_windowed_distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", expr("ts_ms div 86400000"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("__approx"))
      .select(col("day"), col("n_events"), col("n_users"),
        (abs(col("__approx") - col("n_users")) * lit(20L) <= col("n_users"))
          .cast("int").as("sketch_within_5pct"))
      .orderBy("day")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_prefix_ann" -> q153_prefix_ann,
    "q156_windowed_distinct" -> q156_windowed_distinct,
    "q157_lsh_curve" -> q157_lsh_curve
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{quantVec, shingleCte, minhashCols, bandRows}

  val oracles: Map[String, String] = Map(
    "q153_prefix_ann" ->
      s"""WITH v AS (SELECT vec_id, $quantVec AS qv FROM embeddings),
         |q AS (SELECT vec_id AS query_id, qv AS quv FROM v
         |      WHERE vec_id % $PrefixQueryMod = 0),
         |co AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, $PrefixDims),
         |              i -> q.quv[i] * v.qv[i])) AS BIGINT) AS cdot
         |  FROM q, v WHERE q.query_id <> v.vec_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |           SELECT *, row_number() OVER (PARTITION BY query_id
         |                  ORDER BY cdot DESC, neighbor_id) AS crk FROM co)
         |         WHERE crk <= $CandK),
         |s AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(q.quv)),
         |              i -> q.quv[i] * v.qv[i])) AS BIGINT) AS dot
         |  FROM cand c JOIN q ON c.query_id = q.query_id
         |  JOIN v ON c.neighbor_id = v.vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank FROM s)
         |SELECT query_id, rank, neighbor_id, dot
         |FROM r WHERE rank <= $PrefixK ORDER BY query_id, rank""".stripMargin,
    "q156_windowed_distinct" ->
      """SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
        |       count(*) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(1 AS INT) AS sketch_within_5pct
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "q157_lsh_curve" ->
      s"""WITH $shingleCte,
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle
         |        HAVING count(*) <= ${DataPrepQueries.JaccardMaxDf}) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |ex AS (
         |  SELECT i.id_a, i.id_b,
         |         CAST(floor(10000 * i.n_common
         |              / (sa.set_size + sb.set_size - i.n_common)) AS BIGINT) AS jaccard_x10k
         |  FROM inter i
         |  JOIN sizes sa ON sa.id = i.id_a
         |  JOIN sizes sb ON sb.id = i.id_b
         |  WHERE floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common))
         |        >= $CurveMinX10k),
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows),
         |cg AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |       FROM banded a
         |       JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |fl AS (SELECT ex.jaccard_x10k,
         |              CASE WHEN cg.id_a IS NULL THEN 0 ELSE 1 END AS caught,
         |              ex.jaccard_x10k // 1000 AS bucket
         |       FROM ex LEFT JOIN cg ON ex.id_a = cg.id_a AND ex.id_b = cg.id_b)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(caught) AS BIGINT) AS n_caught,
         |       CAST((10000 * sum(caught)) // count(*) AS BIGINT) AS catch_x10k
         |FROM fl GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
