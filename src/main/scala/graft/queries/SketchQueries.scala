package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-5 wave-15b frequency-summary operators: a fully RELATIONAL
  * count–min sketch (mergeable frequency estimation whose cells are plain
  * rows — the third mergeable-sketch family next to q61's HLL and q67's
  * quantile sketch) and the Simpson/Herfindahl vocabulary-concentration
  * index (the diversity complement of q121's type-token ratio).
  *
  * Oracle conventions as the sibling modules: md5 is the only cross-engine
  * hash, exact integers end-to-end, identical aliases both sides.
  */
object SketchQueries {

  /** Count–min geometry: depth (independent hash rows) × width (buckets).
    * Width 256 keeps the whole sketch ≤ 1024 rows — a broadcastable
    * summary of an arbitrarily large token stream. */
  val CmsDepth = 4
  val CmsWidth = 256L

  /** How many heavy tokens to probe against the sketch. */
  val CmsProbes = 8

  /** X172 — relational count–min sketch: every token occurrence hashes
    * into `CmsDepth` (row, bucket) cells (bucket = md5("r:token") — the
    * house md5-derived hash, replayable in the oracle), the sketch is the
    * (row, bucket) → count table, and a token's frequency estimate is the
    * MINIMUM of its `CmsDepth` cells. Probes are the corpus's `CmsProbes`
    * heaviest tokens (count desc, token asc); per probe the query emits
    * exact count, sketch estimate, the overshoot, and the deterministic
    * CMS contract verdict `est ≥ exact` (a count–min sketch can only
    * OVER-estimate — collisions add, never subtract).
    *
    * Why it earns a row next to q61/q67: the cells partial-aggregate
    * map-side and merge by plain addition, so the shuffle carries ≤
    * depth·width rows per task regardless of corpus size, and two
    * corpora's sketches union by summing cells — the mergeability
    * contract that lets a 1000-executor run estimate any token's
    * frequency from a 1024-row artifact instead of a vocabulary-sized
    * table. Scale: one token pass with a ×depth literal fan-out, one
    * (row, bucket)-keyed aggregate; the probe side is 8 rows joined
    * against a broadcast sketch.
    */
  def q162_countmin_sketch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(wsTokens(normalizeText(col("text")))).as("token"))
    val cells = graft.ops.CountMin.cells(toks, "token", CmsDepth, CmsWidth)
    val probes = toks.groupBy("token")
      .agg(count(lit(1)).cast("long").as("exact"))
      .orderBy(col("exact").desc, col("token"))
      .limit(CmsProbes)
    graft.ops.CountMin.estimate(cells, probes, CmsDepth, CmsWidth)
      .withColumn("overshoot", col("est") - col("exact"))
      .withColumn("ok", (col("est") >= col("exact")).cast("int"))
      .select("token", "exact", "est", "overshoot", "ok")
      .orderBy("token")
  }

  /** X174 — vocabulary concentration per source: Simpson/Herfindahl index
    * ×10⁶ (`⌊10⁶·Σc²/N²⌋` — the probability two random token draws
    * coincide; rational, so no-log integer-exact where Shannon entropy is
    * not), top-term share ×10⁴, distinct types and token mass. The
    * diversity read q121's per-doc TTR cannot give: a source can have
    * high per-doc TTR yet be corpus-level degenerate (every doc a
    * permutation of the same 50 words). Floor division composes
    * (⌊⌊x/a⌋/b⌋ = ⌊x/ab⌋), so the ×10⁶ scaling divides by N twice and
    * stays in BIGINT for any Σc² ≤ 9·10¹²; at true corpus scale the
    * multiply switches to DECIMAL(38) — the formula is unchanged.
    *
    * Scale: one token pass → (source, token) partial-aggregated counts →
    * |sources|-row reduce. Nothing quadratic, no windows.
    */
  def q164_vocab_concentration(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy("source")
      // Σc² accumulates in DECIMAL(38,0): a skewed vocabulary drives a
      // single c toward the group's token count, so the BIGINT square
      // dies at ~3e9 tokens per source (round-9 envelope audit). The
      // reported sum_c2 column keeps its BIGINT contract (its own
      // envelope); the ×1e6 metric derives from the wide sum.
      .agg(sum("c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("__sum_c2_d"),
        max("c").cast("long").as("max_c"))
      .withColumn("sum_c2", expr("CAST(__sum_c2_d AS BIGINT)"))
      .withColumn("simpson_x1m",
        expr("CAST(((1000000 * __sum_c2_d) div n_tokens) div n_tokens AS BIGINT)"))
      .drop("__sum_c2_d")
      .withColumn("top_share_x10k", expr("(10000 * max_c) div n_tokens"))
      .select("source", "n_tokens", "n_types", "simpson_x1m", "top_share_x10k")
      .orderBy("source")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_countmin_sketch" -> q162_countmin_sketch,
    "q164_vocab_concentration" -> q164_vocab_concentration
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  val oracles: Map[String, String] = Map(
    "q162_countmin_sketch" ->
      s"""WITH tk AS (SELECT unnest($normToks) AS token FROM documents),
         |cells AS (
         |  SELECT r, CAST(concat('0x', substr(md5(concat(r, ':', token)), 1, 4))
         |              AS BIGINT) % $CmsWidth AS bucket,
         |         CAST(count(*) AS BIGINT) AS cell
         |  FROM tk, (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS r)
         |  GROUP BY 1, 2),
         |probes AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS exact
         |  FROM tk GROUP BY token
         |  ORDER BY exact DESC, token LIMIT $CmsProbes),
         |pb AS (
         |  SELECT p.token, p.exact, rs.r,
         |         CAST(concat('0x', substr(md5(concat(rs.r, ':', p.token)), 1, 4))
         |           AS BIGINT) % $CmsWidth AS bucket
         |  FROM probes p
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS r) rs),
         |est AS (
         |  SELECT pb.token, pb.exact, min(c.cell) AS est
         |  FROM pb JOIN cells c ON c.r = pb.r AND c.bucket = pb.bucket
         |  GROUP BY 1, 2)
         |SELECT token, exact, CAST(est AS BIGINT) AS est,
         |       CAST(est - exact AS BIGINT) AS overshoot,
         |       CAST(CASE WHEN est >= exact THEN 1 ELSE 0 END AS INT) AS ok
         |FROM est ORDER BY token""".stripMargin,
    "q164_vocab_concentration" ->
      s"""WITH tk AS (SELECT source, unnest($normToks) AS token FROM documents),
         |tc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
         |       FROM tk GROUP BY source, token),
         |s AS (SELECT source,
         |             CAST(sum(c) AS BIGINT) AS n_tokens,
         |             CAST(count(*) AS BIGINT) AS n_types,
         |             CAST(sum(c * c) AS BIGINT) AS sum_c2,
         |             CAST(max(c) AS BIGINT) AS max_c
         |      FROM tc GROUP BY source)
         |SELECT source, n_tokens, n_types,
         |       CAST(((1000000 * sum_c2) // n_tokens) // n_tokens AS BIGINT)
         |         AS simpson_x1m,
         |       CAST((10000 * max_c) // n_tokens AS BIGINT) AS top_share_x10k
         |FROM s ORDER BY source""".stripMargin
  )
}
