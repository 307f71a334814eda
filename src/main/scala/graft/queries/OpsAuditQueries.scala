package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-13c operational/audit operators: join-key skew audit
  * (the pre-flight read before choosing broadcast/salt/AQE levers for a
  * big join — X30's salted join needs to know WHICH keys are hot and how
  * hot), deterministic priority sampling (weighted sampling without
  * replacement via the Duffield–Lund–Thorup priority scheme, hash-derandomized
  * so every engine/retry draws the same sample), and semi-structured
  * JSON payload extraction (the schema-on-read field pull every event
  * pipeline does before it can aggregate).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object OpsAuditQueries {

  /** Skew audit: report the `SkewTopK` heaviest join keys. */
  val SkewTopK = 10
  /** Parallelism the salt recommendation targets (the session's shuffle
    * width; a cluster run passes its own). */
  val SkewTasks = 32L
  /** Priority sampling: sample size and seed. */
  val PriorityK = 50
  val PrioritySeed = 57L

  /** X155 — join-key skew audit over `orders.o_custkey`: per-key row
    * counts reduced to the `SkewTopK` heaviest keys with their share of
    * the table (×10⁶), their ratio to the mean key load (×1000), and a
    * salt factor — how many of the `SkewTasks` shuffle partitions this
    * key alone would fill, i.e. the replication X30's salted join should
    * use for it. The read-before-you-join companion of the salt/AQE
    * levers: a key with salt_factor 1 is harmless, one at 8 needs
    * salting or AQE skew-split.
    *
    * Scale: one partial-aggregated shuffle on the key, a 1-row totals
    * broadcast, top-k via TakeOrderedAndProject — no global sort. */
  def q148_skew_audit(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(SkewTopK)
    top.crossJoin(broadcast(totals))
      .withColumn("share_x1e6", expr("(1000000 * cnt) div n_rows"))
      .withColumn("skew_x1k", expr("(cnt * n_keys * 1000) div n_rows"))
      .withColumn("salt_factor",
        expr(s"greatest(1L, cnt div greatest(1L, n_rows div $SkewTasks))"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))).cast("long"))
      .select("rank", "key", "cnt", "share_x1e6", "skew_x1k", "salt_factor")
      .orderBy("rank")
  }

  /** X156 — deterministic priority sampling: weighted sampling without
    * replacement (weight = `n_chars`) via the priority scheme — each doc
    * draws `u` from its md5 (a uniform 32-bit integer, so every engine,
    * retry, and re-run draws the SAME sample), priority = ⌊w·2³² / u⌋,
    * keep the `PriorityK` largest priorities. Long docs are
    * proportionally more likely to survive, yet the sample is a pure
    * function of (seed, doc_id, weight) — the reproducibility contract
    * RNG-based weighted reservoirs can't give a distributed pipeline.
    *
    * Scale: a pure scalar map pass + TakeOrderedAndProject top-k (per-
    * partition heaps, no global sort), exactly the q51/q54 hash-
    * determinism discipline with weights attached. */
  def q149_priority_sample(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("weight"))
      .withColumn("u",
        conv(substring(md5(concat(lit(s"$PrioritySeed:"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long") + 1L)
      // shared guarded formula (round-11 envelope sweep): weight ≥ 2³¹
      // would overflow the ·2³² scale and silently corrupt the top-k
      .withColumn("priority", expr(
        "CASE WHEN weight < 0 OR weight >= 2147483648 " +
        "THEN CAST(raise_error(concat('q149: weight outside the [0, 2^31) envelope: ', " +
        "CAST(weight AS STRING))) AS BIGINT) " +
        "ELSE (weight * 4294967296) div u END"))
    val top = scored.orderBy(col("priority").desc, col("doc_id")).limit(PriorityK)
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("priority").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "weight", "priority")
      .orderBy("rank")
  }

  /** X157 — semi-structured JSON payload extraction: pull the typed
    * field `props.$.k` out of the JSON payload column and aggregate it
    * per event type — count/coverage/sum/min/max/distinct. The
    * schema-on-read step every event pipeline fronts its analytics
    * with; extraction is a codegen'd scalar pass (`get_json_object`),
    * the aggregate one partial-aggregated shuffle on the type. At scale
    * the extraction cost is the reason to land parsed columns once
    * (schema-first X52 ingest), and this operator is the probe that
    * tells you which fields earn that column. */
  def q150_payload_extract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")

  /** X344 — ANALYZE-style column statistics profile of the fact table:
    * per column (long form) the row count, exact distinct count, null
    * count, and min/max — the statistics a cost-based optimizer feeds
    * on (join reorder, broadcast thresholds, selectivity estimates).
    * Non-integer columns are canonicalized first (money → cents,
    * timestamps → epoch ms) so min/max stringify identically in any
    * engine; at corpus scale the exact NDVs swap for the X50 HLL sketch
    * — the report schema is unchanged.
    *
    * Scale shape: one NARROW two-phase aggregate per column — group on
    * the value (map-side partial combine collapses each partition to
    * its distinct values), then a second aggregate reads NDV, nulls,
    * min/max, and the row count off the |values|-sized group table.
    * (A single 9-distinct aggregate is the tempting one-pass form, but
    * Catalyst plans it as an Expand — every row replicated once per
    * distinct column, all columns carried — measured 15 s at sf0.1
    * where the narrow per-column passes take well under a second.) */
  def q313_column_stats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber").cast("long").as("l_linenumber"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ext_c"),
      col("l_returnflag"), col("l_linestatus"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("shipdate_ms"))
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "qty_c", "ext_c", "l_returnflag", "l_linestatus", "shipdate_ms")
    cols.map { c =>
      li.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum("cnt").as("n_rows"),
          sum(col("v").isNotNull.cast("long")).as("n_distinct"),
          sum(when(col("v").isNull, col("cnt")).otherwise(lit(0L))).as("n_null"),
          min(col("v")).cast("string").as("min_v"),
          max(col("v")).cast("string").as("max_v"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_distinct"),
          col("n_null"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _).orderBy("column_name")
  }

  /** X345 — zone-map pruning audit: treating each calendar day as a
    * storage zone (the X63 layout), the per-zone min/max of the value
    * column decide which zones a predicate can skip WITHOUT reading
    * them. The report is the data-layout effectiveness check behind
    * min/max-based file skipping (parquet row groups, Iceberg/Delta
    * zone maps): `pruned = 1` zones never leave the manifest. */
  val ZonePredicateC = 9000L
  def q314_zonemap_audit(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsCents(spark, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        min("value_c").as("min_c"), max("value_c").as("max_c"))
      .withColumn("pruned",
        (col("max_c") < lit(ZonePredicateC)).cast("long"))
      .orderBy("day")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q313_column_stats" -> q313_column_stats,
    "q314_zonemap_audit" -> q314_zonemap_audit,
    "q148_skew_audit" -> q148_skew_audit,
    "q149_priority_sample" -> q149_priority_sample,
    "q150_payload_extract" -> q150_payload_extract
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q313_column_stats" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "qty_c", "ext_c", "l_returnflag", "l_linestatus", "shipdate_ms")
      val arms = cols.map { c =>
        s"""SELECT '$c' AS column_name, (SELECT count(*) FROM li) AS n_rows,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |       CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v
           |FROM li""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH li AS (
         |  SELECT l_orderkey, l_partkey, l_suppkey,
         |         CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_c,
         |         l_returnflag, l_linestatus,
         |         epoch_ms(l_shipdate) AS shipdate_ms
         |  FROM lineitem)
         |$arms
         |ORDER BY column_name""".stripMargin
    },
    "q314_zonemap_audit" ->
      s"""SELECT CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
         |       count(*) AS n_rows,
         |       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
         |       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c,
         |       CAST(CASE WHEN max(CAST(round(value * 100) AS BIGINT)) < $ZonePredicateC
         |                 THEN 1 ELSE 0 END AS BIGINT) AS pruned
         |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "q148_skew_audit" ->
      s"""WITH c AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS cnt
         |           FROM orders GROUP BY o_custkey),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |             CAST(sum(cnt) AS BIGINT) AS n_rows FROM c),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rank
         |      FROM c)
         |SELECT rank, key, cnt,
         |       CAST((1000000 * cnt) // t.n_rows AS BIGINT) AS share_x1e6,
         |       CAST((cnt * t.n_keys * 1000) // t.n_rows AS BIGINT) AS skew_x1k,
         |       CAST(greatest(1, cnt // greatest(1, t.n_rows // $SkewTasks)) AS BIGINT)
         |         AS salt_factor
         |FROM r CROSS JOIN t WHERE rank <= $SkewTopK ORDER BY rank""".stripMargin,
    "q149_priority_sample" ->
      s"""WITH s AS (
         |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         |         CAST(concat('0x', substr(md5(concat('$PrioritySeed', ':',
         |              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1 AS u
         |  FROM documents),
         |p AS (SELECT doc_id, weight, CAST((weight * 4294967296) // u AS BIGINT) AS priority
         |      FROM s),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT)
         |             AS rank FROM p)
         |SELECT rank, doc_id, weight, priority
         |FROM r WHERE rank <= $PriorityK ORDER BY rank""".stripMargin,
    "q150_payload_extract" ->
      """SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(k) AS BIGINT) AS n_with_k,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k,
        |       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
