package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.Sharding

/** Round-4 wave-10 balance/baseline operators: shard-balance audit (is the
  * deterministic sharding actually uniform in token mass?), seasonal
  * baseline deviations (hour-of-day medians per event type), and
  * quality-aware duplicate-cluster canonicalization (pick the BEST doc
  * per cluster, not the first).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key. Subtractions may
  * go negative (no division on negatives — `div` only over non-negative
  * operands).
  */
object BalanceQueries {

  /** X139 — shard-balance audit: q54's deterministic shard assignment
    * re-weighed by TOKEN mass — per shard, docs, tokens, and the relative
    * deviation ×10k of the shard's token mass from the uniform share
    * (|S·tokens_shard − total| / total). Uniform DOC counts don't imply
    * uniform token counts; a training run packs by tokens, so this is the
    * imbalance that actually costs wall-clock. One token-count pass,
    * |shards|-row aggregate, 1-row broadcast total. */
  def q133_shard_balance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      size(wsTokens(normalizeText(col("text")))).cast("long").as("ntok"))
    val sharded = docs.withColumn("shard",
      Sharding.shardId(Sharding.shuffleKey(col("doc_id"), PipelineQueries.ShuffleSeed),
        PipelineQueries.NShards))
    val per = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("t_total"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"""CASE WHEN t_total = 0 THEN 0L
                 ELSE (10000 * abs(${PipelineQueries.NShards} * n_tokens - t_total))
                      div t_total END""").as("dev_x10k"))
      .orderBy("shard")
  }

  /** X140 — seasonal baseline deviations: per (event type, UTC day,
    * hour-of-day) the event count next to the hour-of-day's exact lower
    * median across the observed days — the "is this hour unusual FOR THIS
    * hour" monitor (an absolute threshold fires every rush hour; the
    * seasonal baseline only fires when an hour departs from its own
    * history). Cell counts in one pass; the median is a rank window
    * partitioned by (type, hour) — parallel across cells at any scale;
    * deviation stays a signed integer (no division). */
  def q134_seasonal_baseline(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_ms div 86400000").as("day"),
        expr("(ts_ms div 3600000) % 24").as("hour"))
      .groupBy("event_type", "day", "hour").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type", "hour").orderBy(col("n"), col("day"))
    val ranked = cells
      .withColumn("rk", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type", "hour")))
    val med = ranked.filter(col("rk") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("hour"), col("n").as("med_n"))
    cells.join(med, Seq("event_type", "hour"))
      .select(col("event_type"), col("day"), col("hour"), col("n"), col("med_n"),
        (col("n") - col("med_n")).as("dev"))
      .orderBy("event_type", "day", "hour")
  }

  /** X141 — quality-aware duplicate-cluster canonicalization: q33's
    * connected components re-keepered by QUALITY — per cluster the member
    * with the highest en-stopword fluency (ties → lowest doc_id) becomes
    * the keeper, replacing keep-lowest-id (the naive rule deletes the
    * better-edited copy whenever it arrived later). Emits per cluster the
    * keeper and the token accounting a dedup pass would realize. Work on
    * top of the cluster labels: one quality pass + one per-cluster argmax
    * (max-of-struct partial aggregate, no window over the corpus). */
  def q135_cluster_keeper(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = graft.ops.Dedup.minhashLshPairs(docs,
      n = DataPrepQueries.ShingleN, bands = DataPrepQueries.MinhashBands,
      rowsPerBand = DataPrepQueries.MinhashRows)
    val labels = graft.ops.Graph.dupClusters(docs, pairs)
      .select(col("doc_id"), col("component_id"))
    val quality = docs.select(col("doc_id"),
      size(wsTokens(normalizeText(col("text")))).cast("long").as("ntok"),
      when(tokenCountWs(col("text")) > 0,
        floor(lit(10000L) * stopwordHits(col("text"), "en") / tokenCountWs(col("text"))))
        .otherwise(0L).cast("long").as("fluency_x10k"))
    labels.join(quality, "doc_id")
      .groupBy("component_id")
      .agg(count(lit(1)).as("cluster_size"), sum("ntok").as("total_tokens"),
        max(struct(col("fluency_x10k").as("f"), (-col("doc_id")).as("nid"),
          col("ntok").as("kt"))).as("m"))
      .select(col("component_id"), (-col("m.nid")).as("keeper_id"),
        col("cluster_size"), col("total_tokens"),
        col("m.kt").as("kept_tokens"),
        (col("total_tokens") - col("m.kt")).as("dropped_tokens"))
      .orderBy("component_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_shard_balance" -> q133_shard_balance,
    "q134_seasonal_baseline" -> q134_seasonal_baseline,
    "q135_cluster_keeper" -> q135_cluster_keeper
  )

  // ---------------------------------------------------------------- oracles

  import AnalyticsQueries.normToks
  import DataPrepQueries.{hitsSql, minhashCols, bandRows, shingleCte, toks}

  private val mkey =
    s"md5(concat('${PipelineQueries.ShuffleSeed}', ':', CAST(doc_id AS VARCHAR)))"

  val oracles: Map[String, String] = Map(
    "q133_shard_balance" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($normToks) AS BIGINT) AS ntok
         |           FROM documents),
         |s AS (SELECT CAST(CAST(concat('0x', substr($mkey, 1, 8)) AS BIGINT)
         |             % ${PipelineQueries.NShards} AS BIGINT) AS shard, ntok
         |      FROM d),
         |per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |               CAST(sum(ntok) AS BIGINT) AS n_tokens
         |        FROM s GROUP BY shard),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total FROM per)
         |SELECT shard, n_docs, n_tokens,
         |       CAST(CASE WHEN t_total = 0 THEN 0
         |            ELSE (10000 * abs(${PipelineQueries.NShards} * n_tokens - t_total))
         |                 // t_total END AS BIGINT) AS dev_x10k
         |FROM per, t ORDER BY shard""".stripMargin,
    "q134_seasonal_baseline" ->
      s"""WITH c AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |             (epoch_ms(ts) // 3600000) % 24 AS hour, count(*) AS n
         |           FROM events GROUP BY 1, 2, 3),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY event_type, hour ORDER BY n, day) AS rk,
         |             count(*) OVER (PARTITION BY event_type, hour) AS cnt
         |      FROM c),
         |m AS (SELECT event_type, hour, n AS med_n FROM r WHERE rk = (cnt + 1) // 2)
         |SELECT c.event_type, CAST(c.day AS BIGINT) AS day,
         |       CAST(c.hour AS BIGINT) AS hour, CAST(c.n AS BIGINT) AS n,
         |       CAST(m.med_n AS BIGINT) AS med_n,
         |       CAST(c.n - m.med_n AS BIGINT) AS dev
         |FROM c JOIN m ON c.event_type = m.event_type AND c.hour = m.hour
         |ORDER BY c.event_type, day, hour""".stripMargin,
    "q135_cluster_keeper" ->
      s"""WITH RECURSIVE $shingleCte,
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows),
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id),
         |ql AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS ntok0,
         |              CAST(len($normToks) AS BIGINT) AS ntok,
         |              CAST(CASE WHEN len($toks) > 0
         |                   THEN floor(10000 * ${hitsSql("en")} / len($toks))
         |                   ELSE 0 END AS BIGINT) AS fluency_x10k
         |       FROM documents),
         |j AS (SELECT lab.component_id, lab.doc_id, ql.ntok, ql.fluency_x10k
         |      FROM lab JOIN ql ON lab.doc_id = ql.doc_id),
         |k AS (SELECT *, row_number() OVER (PARTITION BY component_id
         |            ORDER BY fluency_x10k DESC, doc_id) AS rk
         |      FROM j)
         |SELECT j.component_id,
         |       CAST(max(CASE WHEN k.rk = 1 THEN k.doc_id END) AS BIGINT) AS keeper_id,
         |       CAST(count(*) AS BIGINT) AS cluster_size,
         |       CAST(sum(j.ntok) AS BIGINT) AS total_tokens,
         |       CAST(max(CASE WHEN k.rk = 1 THEN k.ntok END) AS BIGINT) AS kept_tokens,
         |       CAST(sum(j.ntok) - max(CASE WHEN k.rk = 1 THEN k.ntok END) AS BIGINT)
         |         AS dropped_tokens
         |FROM j JOIN k ON j.component_id = k.component_id AND j.doc_id = k.doc_id
         |GROUP BY j.component_id ORDER BY j.component_id""".stripMargin
  )
}
