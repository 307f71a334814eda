package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.ops.{Relational, Sharding}

/** Round-3 training-pipeline + relational surface: deterministic corpus
  * sharding, embedding compression, mixture weighting, semi/anti joins,
  * pivot, inter-event window analytics, binned range join, and a mergeable
  * distinct sketch. Same conventions as [[DataPrepQueries]]: integer
  * quantization everywhere, md5 as the only cross-engine hash, columns
  * aliased identically in the Spark plan and the DuckDB oracle.
  */
object PipelineQueries {

  // shared knobs — referenced by both the Spark queries and the SQL oracles
  val ShuffleSeed = "ep1"
  val NShards = 8
  val MixtureCap = 100L
  val DayMs = 86400000L
  val FollowWindowMs = 3600000L
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** X43 — deterministic corpus shuffle + shard assignment: reproducible
    * pseudo-random training order (md5 key, two-phase global position) and
    * uniform shard id, one range shuffle total. */
  def q54_corpus_shuffle(spark: SparkSession, dir: String): DataFrame =
    Sharding.deterministicShuffle(
      Tables.documents(spark, dir).select("doc_id"),
      col("doc_id"), ShuffleSeed, NShards)
      .select(col("doc_id"), col("shuffle_key"), col("shard"), col("global_pos"))
      .orderBy("global_pos")

  /** X44 — int8 embedding quantization (one row per (vec, dim) so the
    * result is array-representation-free for the oracle hash): scale = max
    * |element| of the 1e-3-quantized vector, q8 = floor(127·x/scale).
    * Computed by the fused [[graft.expressions.Int8QuantizeVec]] scalar —
    * the HOF composition (`int8Quantize(quantize(v), qmaxAbs(...))`) is an
    * optimizer trap: the filter InferFiltersFromGenerate pushes below the
    * explode inlines the qscale aggregate into the per-element lambda,
    * re-evaluating the whole interpreted subtree per element (measured
    * ~2 s of q55's runtime at sf0.1 for 2 000 vectors). Same floor/double
    * arithmetic, spec-pinned equal; oracle unchanged. */
  def q55_embedding_quantize(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        call_function(graft.expressions.GraftFunctions.Int8QuantizeName,
          col("embedding")).as("f"))
      .select(col("vec_id"), col("f.qscale").as("qscale"),
        posexplode(col("f.q8")).as(Seq("pos", "q")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("q"), col("qscale"))
      .orderBy("vec_id", "dim")
  }

  /** X45 — source mixture weighting: per-source doc counts capped at
    * `MixtureCap`, normalized to integer weights — the sampling table a
    * trainer uses to balance over-represented sources (cap = downsample,
    * repeat_x100 > 100 = upsample headroom). One tiny aggregate (rows =
    * #sources), broadcast total. */
  def q56_source_mixture(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_capped", least(col("n_docs"), lit(MixtureCap)))
    val total = bySource.agg(sum("n_capped").as("total_capped"))
    bySource.crossJoin(broadcast(total))
      .withColumn("weight_x10k",
        floor(lit(10000L) * col("n_capped") / col("total_capped")).cast("long"))
      .withColumn("repeat_x100",
        floor(lit(100L) * lit(MixtureCap) / col("n_docs")).cast("long"))
      .select("source", "n_docs", "n_capped", "weight_x10k", "repeat_x100")
      .orderBy("source")
  }

  /** X46 — semi/anti-join surface: per market segment, customers WITH at
    * least one order (LEFT SEMI — no fan-out, the existence question) and
    * WITHOUT any (LEFT ANTI). Both are one hash shuffle on the key; the
    * orders side reduces to its join key only (column-pruned scan). */
  def q57_semi_anti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ordKeys = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    val withO = cust.join(ordKeys, Seq("c_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutO = cust.join(ordKeys, Seq("c_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        (coalesce(col("n_with_orders"), lit(0L)) +
          coalesce(col("n_without_orders"), lit(0L))).as("n_customers"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }

  /** X47 — pivot (long → wide): daily event counts, one column per event
    * type. The explicit value list keeps the schema static (no extra pass
    * to discover values) and the pivot is map-side partial-aggregated —
    * one shuffle of #days × #types cells. */
  def q58_daily_pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day_ms", expr(s"ts_ms div ${DayMs}L * ${DayMs}L"))
      .groupBy("day_ms").pivot("event_type", EventTypes).agg(count(lit(1)))
      .select(col("day_ms") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("day_ms")

  /** X48 — inter-event gap analytics (lag window): per user, the
    * time-between-events distribution — session-health numbers a funnel
    * report sits on. ONE shuffle on user_id; the lag window and the
    * per-user reduce share that partitioning. Ties on ts are sequenced by
    * event_id (same tie contract as the funnel), which leaves the GAP
    * values deterministic. */
  def q59_event_gaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"))
      .withColumn("gap_ms", col("ts_ms") - lag("ts_ms", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_ms")).as("n_gaps"),
        coalesce(sum("gap_ms"), lit(0L)).as("sum_gap_ms"),
        coalesce(max("gap_ms"), lit(0L)).as("max_gap_ms"),
        coalesce(min("gap_ms"), lit(0L)).as("min_gap_ms"))
      .orderBy("user_id")
  }

  /** X49 — binned range join: follow-on activity within 1h of each signup
    * (count + spend), via [[Relational.binnedRangeJoin]] — an EQUI-join on
    * (user, time-bucket) instead of the broadcast-nested-loop a raw
    * inequality join plans. Every signup matches at least itself, so the
    * aggregate needs no left join. */
  def q60_signup_follow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsCents(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_ms").as("s_ts"), col("event_id").as("s_event_id"))
    val follows = ev.select(col("user_id"), col("ts_ms").as("f_ts"), col("value_c"))
    Relational.binnedRangeJoin(signups, follows, "user_id", "s_ts", "f_ts", FollowWindowMs)
      .groupBy("s_event_id")
      .agg(count(lit(1)).as("n_events_1h"), sum("value_c").as("value_sum_c"))
      .orderBy("s_event_id")
  }

  /** X50 — mergeable distinct-count sketch (Apache DataSketches HLL via
    * Spark's `hll_sketch_agg`): approximate distinct users per event type.
    * The sketch is an algebraic partial aggregate — per-partition sketches
    * merge associatively, so the shuffle carries one sketch per (type,
    * task), not the user ids; at 100 TB this (not exact count-distinct's
    * full shuffle of the key set) is how corpus-wide cardinality reports
    * run. The output carries the EXACT distinct count alongside and
    * reduces the sketch estimate to its error-contract verdict
    * (`sketch_within_5pct`): DuckDB cannot replay DataSketches HLL
    * bit-for-bit, but it CAN assert the contract — the oracle expects 1,
    * so a sketch drifting past 5% flips the column and fails the hash
    * match. PipelineSpec additionally pins the raw estimate and the
    * partial-merge equality. */
  def q61_distinct_sketch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("__approx"),
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        (abs(col("__approx") - col("n_users")) * lit(20L) <= col("n_users"))
          .cast("int").as("sketch_within_5pct"))
      .orderBy("event_type")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_corpus_shuffle" -> q54_corpus_shuffle,
    "q55_embedding_quantize" -> q55_embedding_quantize,
    "q56_source_mixture" -> q56_source_mixture,
    "q57_semi_anti" -> q57_semi_anti,
    "q58_daily_pivot" -> q58_daily_pivot,
    "q59_event_gaps" -> q59_event_gaps,
    "q60_signup_follow" -> q60_signup_follow,
    "q61_distinct_sketch" -> q61_distinct_sketch
  )

  private val mkey = s"md5(concat('$ShuffleSeed', ':', CAST(doc_id AS VARCHAR)))"

  val oracles: Map[String, String] = Map(
    "q54_corpus_shuffle" ->
      s"""SELECT doc_id, $mkey AS shuffle_key,
         |       CAST(CAST(concat('0x', substr($mkey, 1, 8)) AS BIGINT) % $NShards AS BIGINT) AS shard,
         |       row_number() OVER (ORDER BY $mkey) AS global_pos
         |FROM documents ORDER BY global_pos""".stripMargin,
    "q55_embedding_quantize" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vq
         |  FROM embeddings),
         |s AS (
         |  SELECT vec_id, vq,
         |         CAST(list_max(list_transform(vq, x -> abs(x))) AS BIGINT) AS qscale
         |  FROM q)
         |SELECT vec_id,
         |       CAST(unnest(generate_series(1, len(vq))) AS BIGINT) AS dim,
         |       unnest(list_transform(vq, x ->
         |         CAST(CASE WHEN qscale > 0 THEN floor(x * 127 / qscale) ELSE 0 END AS BIGINT))) AS q,
         |       qscale
         |FROM s ORDER BY vec_id, dim""".stripMargin,
    "q56_source_mixture" ->
      s"""WITH b AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(least(count(*), $MixtureCap) AS BIGINT) AS n_capped
         |  FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(n_capped) AS BIGINT) AS total_capped FROM b)
         |SELECT source, n_docs, n_capped,
         |       CAST(floor(10000 * n_capped / total_capped) AS BIGINT) AS weight_x10k,
         |       CAST(floor(100 * $MixtureCap / n_docs) AS BIGINT) AS repeat_x100
         |FROM b, t ORDER BY source""".stripMargin,
    "q57_semi_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
        |       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
        |FROM customer c GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q58_daily_pivot" ->
      s"""SELECT (epoch_ms(ts) // $DayMs) * $DayMs AS day_ms,
         |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
         |FROM events GROUP BY day_ms ORDER BY day_ms""".stripMargin,
    "q59_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms,
        |         epoch_ms(ts) - lag(epoch_ms(ts)) OVER
        |           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |       count(gap_ms) AS n_gaps,
        |       CAST(coalesce(sum(gap_ms), 0) AS BIGINT) AS sum_gap_ms,
        |       CAST(coalesce(max(gap_ms), 0) AS BIGINT) AS max_gap_ms,
        |       CAST(coalesce(min(gap_ms), 0) AS BIGINT) AS min_gap_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q60_signup_follow" ->
      s"""SELECT s.event_id AS s_event_id, count(*) AS n_events_1h,
         |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_sum_c
         |FROM events s JOIN events e
         |  ON e.user_id = s.user_id
         | AND epoch_ms(e.ts) >= epoch_ms(s.ts)
         | AND epoch_ms(e.ts) < epoch_ms(s.ts) + $FollowWindowMs
         |WHERE s.event_type = 'signup'
         |GROUP BY s.event_id ORDER BY s_event_id""".stripMargin,
    // q61: the exact companion columns are replayed exactly; the sketch
    // column is its error-contract verdict — the oracle asserts 1, so a
    // drifting sketch fails the driver's hash match
    "q61_distinct_sketch" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       count(*) AS n_events,
        |       CAST(1 AS INT) AS sketch_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
