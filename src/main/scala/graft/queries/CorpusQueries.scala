package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.ops.{Dedup, Scrub}

/** Round-4 wave-2 corpus operators: DSIR-style importance weighting
  * (hashed n-gram target/source affinity — Xie et al. 2023's selection
  * signal as exact integer arithmetic), PII/pattern scrubbing
  * ([[graft.ops.Scrub]]), exact-substring duplicate spans
  * ([[graft.ops.Dedup.dupSpanStats]], the n-gram twin of Lee et al.
  * 2022), and Johnson–Lindenstrauss random projection (md5-sign matrix,
  * the embedding-compression pass before coarse ANN or clustering).
  * Same oracle conventions as the sibling modules: exact integers
  * end-to-end, md5 as the only cross-engine hash, identical aliases both
  * sides, ORDER BY a unique key.
  */
object CorpusQueries {

  // DSIR: hashed-unigram buckets, Laplace-smoothed integer ratio ×1000.
  val DsirBuckets = 4096
  val DsirTargetLang = "en"
  /** Selection bar: corpus mean affinity sits ≈432 ×1k on the testdata
    * (target share ≈44%); ≥433 keeps the above-average-affinity half. */
  val DsirBarX1k = 433L

  // Scrub rule chain for q102 — the three shipped PII rules plus a
  // corpus-term rule that actually fires on the testdata (so the oracle
  // exercises the rewrite, not just zero counts).
  val ScrubRules: Seq[Scrub.Rule] =
    Seq(Scrub.Email, Scrub.Ipv4, Scrub.Phone,
      Scrub.Rule("term", "\\bcustomer\\b", "<TERM>"))

  val SpanN = 8 // ExactSubstr window: repeats ≥ 8 tokens count as copied

  // Random projection: 64-dim quantized embeddings → 16 dims.
  val RpDims = 16
  val EmbDim = 64
  val RpSeed = "rp4"

  /** X106 — DSIR importance weights: per document, the mean
    * target-vs-corpus affinity of its hashed unigram buckets (×1000,
    * integer floor, +1-smoothed), target = the `DsirTargetLang` slice.
    * The integer-exact twin of DSIR's log-ratio importance weight (the
    * monotone ratio replaces the log; selection order is what matters).
    * Shape: one token→bucket pass feeds BOTH the (≤4096-row, broadcast)
    * bucket-ratio table and the per-doc bucket counts — two partial
    * aggregations and a broadcast join; nothing scales with corpus size
    * except the token pass. */
  def q101_dsir_weights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tb = docs.select(col("doc_id"), col("lang"),
      explode(wsTokens(normalizeText(col("text")))).as("token"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("token")), 1, 4), 16, 10).cast("long"),
          lit(DsirBuckets.toLong)).as("bucket"))
    val freq = tb.groupBy("bucket")
      .agg(count(lit(1)).as("sc"),
        sum((col("lang") === DsirTargetLang).cast("long")).as("tc"))
      .select(col("bucket"), expr("(1000 * (tc + 1)) div (sc + 1)").as("r_x1k"))
    val db = tb.groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
    val scored = db.join(broadcast(freq), "bucket")
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), sum(col("c") * col("r_x1k")).as("w_sum"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("w_sum"), lit(0L)).as("w_sum"))
      .withColumn("mean_x1k",
        expr("CASE WHEN n_tokens = 0 THEN 0L ELSE w_sum div n_tokens END"))
      .withColumn("selected", (col("mean_x1k") >= DsirBarX1k).cast("int"))
      .orderBy("doc_id")
  }

  /** X107 — PII/pattern scrub ([[Scrub.scrub]]): detection counts per
    * rule plus the rewritten text's length and md5 (the full clean text
    * is the operator's real output; the digest keeps the oracle row
    * narrow). Pure codegen'd map-side pass — no shuffle at any scale. */
  def q102_pii_scrub(spark: SparkSession, dir: String): DataFrame =
    Scrub.scrub(Tables.documents(spark, dir), ScrubRules)
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
        col("n_term"),
        length(col("clean_text")).cast("long").as("clean_len"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy("doc_id")

  /** X108 — exact-substring duplicate spans
    * ([[Dedup.dupSpanStats]]): per document, the fraction of token
    * positions covered by `SpanN`-grams shared with another document —
    * the span-level dedup signal (doc-level dedup keeps one copy of a
    * doc; this finds the copied PARAGRAPH inside otherwise-unique docs). */
  def q103_dup_spans(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupSpanStats(Tables.documents(spark, dir), SpanN)
      .orderBy("doc_id")

  /** X109 — Johnson–Lindenstrauss random projection: quantized 64-dim
    * embeddings → 16 signed-sum dimensions via the deterministic
    * [[md5SignMatrix]]. The compression pass before coarse clustering /
    * ANN when the full dimensionality is too wide to shuffle; long
    * output shape (vec_id, rp_dim, proj) keeps the oracle exact. The
    * matrix rides along as a 16-element array literal — posexplode is
    * narrow, so the whole operator is shuffle-free. */
  def q104_random_projection(spark: SparkSession, dir: String): DataFrame = {
    val mat = array(md5SignMatrix(RpSeed, RpDims, EmbDim)
      .map(row => typedLit(row)): _*)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("vq"))
      .select(col("vec_id"), col("vq"),
        posexplode(mat).as(Seq("rp_dim", "sv")))
      .select(col("vec_id"), col("rp_dim").cast("long").as("rp_dim"),
        qdot(col("vq"), col("sv")).as("proj"))
      .orderBy("vec_id", "rp_dim")
  }

  /** Token budget the temperature-scaled mixture allocates (q107). */
  val MixBudget = 1000000L

  /** X112 — temperature-scaled source mixture: per-source sampling
    * allocation ∝ n_tokens^α with α = 1/2 (UNIMAX-style temperature
    * sampling — upweights small sources against raw-proportional mixing
    * without the uniform extreme; `floor(sqrt)` is IEEE-correctly-rounded,
    * so the integer weight is engine-exact). Emits the per-source token
    * allocation under `MixBudget` and the implied epoch count ×1000 —
    * epochs > 1 flags sources the schedule would repeat. One corpus token
    * pass, a ≤|sources|-row aggregate, a 1-row broadcast total. */
  def q107_temperature_mixture(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .select(col("source"),
        size(wsTokens(normalizeText(col("text")))).cast("long").as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens"))).cast("long"))
    val tot = src.agg(sum("w").as("w_total"))
    src.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
        expr(s"($MixBudget * w) div w_total").as("alloc_tokens"))
      .withColumn("epochs_x1k", expr(
        "CASE WHEN n_tokens = 0 THEN 0L ELSE (1000 * alloc_tokens) div n_tokens END"))
      .orderBy("source")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_dsir_weights" -> q101_dsir_weights,
    "q102_pii_scrub" -> q102_pii_scrub,
    "q103_dup_spans" -> q103_dup_spans,
    "q104_random_projection" -> q104_random_projection,
    "q107_temperature_mixture" -> q107_temperature_mixture
  )

  // ---------------------------------------------------------------- oracles

  import AnalyticsQueries.{normToks, quantVec}

  private def scrubCountSql(r: Scrub.Rule): String =
    s"CAST(len(regexp_extract_all(text, '${r.pattern}')) AS BIGINT) AS n_${r.name}"

  private def scrubRewriteSql: String =
    ScrubRules.foldLeft("text") { (acc, r) =>
      s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')"
    }

  private[queries] def gramSql(n: Int): String =
    (0 until n).map(j => if (j == 0) "t[s]" else s"t[s+$j]").mkString(", ")

  val oracles: Map[String, String] = Map(
    "q101_dsir_weights" ->
      s"""WITH tk AS (SELECT doc_id, lang, unnest($normToks) AS token FROM documents),
         |tb AS (SELECT doc_id, lang,
         |              CAST(concat('0x', substr(md5(token), 1, 4)) AS BIGINT)
         |                % $DsirBuckets AS bucket
         |       FROM tk),
         |fr AS (SELECT bucket,
         |              CAST((1000 * (sum(CASE WHEN lang = '$DsirTargetLang'
         |                   THEN 1 ELSE 0 END) + 1)) // (count(*) + 1) AS BIGINT)
         |                AS r_x1k
         |       FROM tb GROUP BY bucket),
         |db AS (SELECT doc_id, bucket, count(*) AS c FROM tb GROUP BY doc_id, bucket),
         |sc AS (SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_tokens,
         |              CAST(sum(db.c * fr.r_x1k) AS BIGINT) AS w_sum
         |       FROM db JOIN fr USING (bucket) GROUP BY db.doc_id),
         |f AS (SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens,
         |             coalesce(sc.w_sum, 0) AS w_sum,
         |             CAST(CASE WHEN coalesce(sc.n_tokens, 0) = 0 THEN 0
         |                  ELSE sc.w_sum // sc.n_tokens END AS BIGINT) AS mean_x1k
         |      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
         |SELECT doc_id, n_tokens, w_sum, mean_x1k,
         |       CAST(CASE WHEN mean_x1k >= $DsirBarX1k THEN 1 ELSE 0 END AS INT)
         |         AS selected
         |FROM f ORDER BY doc_id""".stripMargin,
    "q102_pii_scrub" ->
      s"""SELECT doc_id,
         |       ${ScrubRules.map(scrubCountSql).mkString(",\n       ")},
         |       CAST(length($scrubRewriteSql) AS BIGINT) AS clean_len,
         |       md5($scrubRewriteSql) AS clean_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q103_dup_spans" ->
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |g AS (SELECT doc_id, s, concat_ws(' ', ${gramSql(SpanN)}) AS gram
         |      FROM (SELECT doc_id, t,
         |              unnest(CASE WHEN len(t) - ${SpanN - 1} <= 0 THEN []
         |                     ELSE generate_series(1, len(t) - ${SpanN - 1}) END) AS s
         |            FROM d)),
         |du AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         |h AS (SELECT g.doc_id, g.s FROM g JOIN du USING (gram)),
         |cv AS (SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_dup_grams,
         |              CAST(count(DISTINCT p) AS BIGINT) AS dup_tokens
         |       FROM (SELECT doc_id, s, unnest(generate_series(s, s + ${SpanN - 1})) AS p
         |             FROM h)
         |       GROUP BY doc_id),
         |nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM d)
         |SELECT nt.doc_id, nt.n_tokens,
         |       coalesce(cv.n_dup_grams, 0) AS n_dup_grams,
         |       coalesce(cv.dup_tokens, 0) AS dup_tokens,
         |       CAST(CASE WHEN nt.n_tokens = 0 THEN 0
         |            ELSE (1000 * coalesce(cv.dup_tokens, 0)) // nt.n_tokens
         |            END AS BIGINT) AS dup_frac_x1k
         |FROM nt LEFT JOIN cv USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q107_temperature_mixture" ->
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(len($normToks)) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY source),
         |w AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w FROM s),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM w)
         |SELECT source, n_docs, n_tokens, w,
         |       CAST(($MixBudget * w) // w_total AS BIGINT) AS alloc_tokens,
         |       CAST(CASE WHEN n_tokens = 0 THEN 0
         |            ELSE (1000 * (($MixBudget * w) // w_total)) // n_tokens
         |            END AS BIGINT) AS epochs_x1k
         |FROM w, t ORDER BY source""".stripMargin,
    "q104_random_projection" ->
      s"""WITH q AS (SELECT vec_id, $quantVec AS vq FROM embeddings),
         |sm AS (SELECT j, list_transform(generate_series(0, ${EmbDim - 1}), i ->
         |         CASE WHEN strpos('02468ace',
         |              substr(md5(concat('$RpSeed:', j, ':', i)), 1, 1)) > 0
         |              THEN 1 ELSE -1 END) AS sv
         |       FROM (SELECT unnest(generate_series(0, ${RpDims - 1})) AS j))
         |SELECT q.vec_id, CAST(sm.j AS BIGINT) AS rp_dim,
         |       CAST(list_sum(list_transform(generate_series(1, $EmbDim),
         |            i -> q.vq[i] * sm.sv[i])) AS BIGINT) AS proj
         |FROM q CROSS JOIN sm
         |ORDER BY q.vec_id, rp_dim""".stripMargin
  )
}
