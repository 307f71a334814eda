package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.{Dedup, Relational}

/** Round-4 wave-7 corpus-health operators: lexical diversity (type-token
  * ratio, hapax share), classifier-score calibration histogram, token-
  * frequency drift between corpus halves, sorted-neighborhood dedup
  * screening (the record-linkage blocking family), and the per-source
  * curation funnel (gate-by-gate loss accounting for the datasheet).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * md5 as the only cross-engine hash, identical aliases both sides,
  * ORDER BY a unique key. All integer divisions keep non-negative
  * operands so Spark `div` (truncate) == DuckDB `//` (floor).
  */
object DriftQueries {

  /** Calibration histogram: scores shifted non-negative by `CalShift`
    * then bucketed at `CalWidth`; the shift keeps the integer division
    * floor-vs-truncate agnostic. */
  val CalShift = 1000L
  val CalWidth = 20L
  /** Drift screen: tokens with fewer combined occurrences carry noise. */
  val DriftMinCount = 20L
  /** Sorted-neighborhood window: compare each doc to the next `SnWindow`
    * docs in simhash order. */
  val SnWindow = 4

  /** X126 — lexical diversity: per document, the type count, type-token
    * ratio ×10k, and hapax share ×10k (words occurring exactly once in the
    * doc) — the MTLD-family signal a quality gate reads to catch keyword
    * stuffing (TTR→0) and gibberish (TTR→10k on long docs). Shape: one
    * token explode → per-(doc, word) partial count → per-doc regroup; no
    * array_distinct (quadratic on wide arrays), no corpus-wide state. */
  def q121_lexical_diversity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perWord = docs
      .select(col("doc_id"), explode(wsTokens(normalizeText(col("text")))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val perDoc = perWord.groupBy("doc_id").agg(
      sum("c").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum((col("c") === 1).cast("long")).as("n_hapax"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .withColumn("ttr_x10k",
        expr("CASE WHEN n_tokens = 0 THEN 0L ELSE (10000 * n_types) div n_tokens END"))
      .withColumn("hapax_x10k",
        expr("CASE WHEN n_tokens = 0 THEN 0L ELSE (10000 * n_hapax) div n_tokens END"))
      .orderBy("doc_id")
  }

  /** X127 — classifier-score calibration histogram: q97's frozen-classifier
    * scores bucketed into fixed-width bins with per-bin counts and corpus
    * share ×10k — the calibration table read before trusting a quality
    * gate's threshold (is the mass near the decision boundary?). Rides
    * q97's scoring chain ([[TrainPrepQueries.classifierScores]]); the
    * histogram is a |bins|-sized aggregate + a 1-row broadcast total. */
  def q122_score_calibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
      .withColumn("bin", expr(s"(score + $CalShift) div $CalWidth"))
    val hist = scored.groupBy("bin").agg(count(lit(1)).as("n_docs"))
    val tot = hist.agg(sum("n_docs").as("n_total"))
    hist.crossJoin(broadcast(tot))
      .select(col("bin"),
        (col("bin") * CalWidth - CalShift).as("bin_lo"),
        col("n_docs"),
        expr("(10000 * n_docs) div n_total").as("share_x10k"))
      .orderBy("bin")
  }

  /** X128 — token-frequency drift between corpus halves (doc_id parity as
    * the deterministic split): per token above the combined-count floor,
    * occurrence rates per 10k tokens in each half and their absolute gap —
    * the distribution-shift monitor run between crawl snapshots or
    * pipeline versions (a token whose rate moved is a changed scraper, a
    * new spam campaign, or a filter regression). One token pass with the
    * half flag aggregated conditionally — a single vocabulary-keyed
    * shuffle and a 1-row broadcast of the two half totals. */
  def q123_token_drift(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select((col("doc_id") % 2 === 0).as("in_a"),
        explode(wsTokens(normalizeText(col("text")))).as("token"))
    val per = tk.groupBy("token").agg(
      sum(col("in_a").cast("long")).as("c_a"),
      sum((!col("in_a")).cast("long")).as("c_b"))
    val tot = per.agg(sum("c_a").as("t_a"), sum("c_b").as("t_b"))
    per.filter(col("c_a") + col("c_b") >= DriftMinCount)
      .crossJoin(broadcast(tot))
      .select(col("token"), col("c_a"), col("c_b"),
        expr("CASE WHEN t_a = 0 THEN 0L ELSE (10000 * c_a) div t_a END").as("rate_a_x10k"),
        expr("CASE WHEN t_b = 0 THEN 0L ELSE (10000 * c_b) div t_b END").as("rate_b_x10k"))
      .withColumn("drift_x10k", abs(col("rate_a_x10k") - col("rate_b_x10k")))
      .orderBy("token")
  }

  /** X129 — sorted-neighborhood dedup screen: docs ordered by simhash
    * (similar docs sort near each other), each compared to the next
    * `SnWindow` docs only — the record-linkage blocking family
    * (Hernández–Stolfo), the third candidate-generation strategy next to
    * LSH banding (q17) and pigeonhole segments (q19). Emits candidate
    * pairs with their Hamming distance. Shape: the global order index is
    * the two-phase [[Relational.globalIndex]] (no single-task window); the
    * window join is an integer band equijoin on the index gap — corpus
    * cost is `SnWindow` rows per doc, never pairs². */
  def q124_sorted_neighborhood(spark: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.simhash64(Tables.documents(spark, dir))
    val idx = Relational.globalIndex(sig, Seq(col("simhash"), col("id")), "idx")
    val gaps = (1 to SnWindow).map(lit(_))
    val probes = idx.select(col("id").as("id_b"), col("simhash").as("sim_b"),
        explode(array(gaps: _*)).as("gap"),
        col("idx").as("idx_b"))
      .withColumn("idx", col("idx_b") - col("gap"))
    idx.join(probes, "idx")
      .select(col("id").as("id_a"), col("id_b"), col("gap"),
        bit_count(col("simhash").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** X130 — per-source curation funnel: gate-by-gate survivor counts
    * (raw → language-identified → quality gate → near-dup loser removal)
    * with end-to-end retention ×10k — the loss-accounting table every
    * corpus datasheet publishes (where did my data go, and is one source
    * paying the whole dedup bill?). Gates reuse the shipped operators:
    * q12's language-ID, q26's quality predicate, q16's exact-Jaccard pair
    * set (the higher-id member of a pair is the loser a dedup pass
    * drops). All gate flags compute in ONE pass over the corpus; the
    * loser set is the q16 pair table's id_b projection (bounded by the
    * pair count), anti-joined in. */
  def q125_curation_funnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    val flagged = docs.select(col("doc_id") +: col("source") +: col("text") +: metrics: _*)
      .withColumn("g_lang", (langId(col("text")) =!= "und").cast("long"))
      .withColumn("g_quality",
        (col("g_lang") === 1 &&
          col("n_tokens") >= 10 && col("n_tokens") <= 500 &&
          col("stop_per_10k") <= 3000 &&
          col("mean_tok_len_x100") >= 200 && col("mean_tok_len_x100") <= 800)
          .cast("long"))
    val losers = Dedup.jaccardPairsPinned(spark, dir,
        n = DataPrepQueries.ShingleN,
        minJaccardX10k = DataPrepQueries.JaccardMinX10k,
        maxDf = DataPrepQueries.JaccardMaxDf)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_loser", lit(1L))
    flagged.join(losers, Seq("doc_id"), "left")
      .withColumn("g_dedup",
        (col("g_quality") === 1 && col("is_loser").isNull).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"), sum("g_lang").as("n_lang"),
        sum("g_quality").as("n_quality"), sum("g_dedup").as("n_final"))
      .withColumn("retained_x10k", expr("(10000 * n_final) div n_raw"))
      .orderBy("source")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_lexical_diversity" -> q121_lexical_diversity,
    "q122_score_calibration" -> q122_score_calibration,
    "q123_token_drift" -> q123_token_drift,
    "q124_sorted_neighborhood" -> q124_sorted_neighborhood,
    "q125_curation_funnel" -> q125_curation_funnel
  )

  // ---------------------------------------------------------------- oracles

  import AnalyticsQueries.normToks
  import DataPrepQueries.{hitsSql, shingleCte, simhashCte, toks}
  import TrainPrepQueries.clsChainSql

  /** q12's language CASE (first language in Stopwords order whose hit
    * count equals the per-doc best and is > 0, else 'und'). Shared with
    * q333's metadata-confusion oracle. */
  private[queries] def langCaseSql: String = {
    val hits = graft.functions.TextFunctions.Stopwords.map { case (l, _) =>
      s"${hitsSql(l)} AS s_$l"
    }.mkString(",\n       ")
    val best = graft.functions.TextFunctions.Stopwords
      .map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val pick = graft.functions.TextFunctions.Stopwords.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""lh AS (SELECT doc_id, $hits FROM documents),
       |lb AS (SELECT doc_id, $best AS best, * FROM lh),
       |lp AS (SELECT doc_id, CASE $pick ELSE 'und' END AS lang_pred FROM lb)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q121_lexical_diversity" ->
      s"""WITH tk AS (SELECT doc_id, unnest($normToks) AS w FROM documents),
         |pw AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY doc_id, w),
         |pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |              CAST(count(*) AS BIGINT) AS n_types,
         |              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |       FROM pw GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(pd.n_tokens, 0) AS n_tokens,
         |       coalesce(pd.n_types, 0) AS n_types,
         |       coalesce(pd.n_hapax, 0) AS n_hapax,
         |       CAST(CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0
         |            ELSE (10000 * pd.n_types) // pd.n_tokens END AS BIGINT) AS ttr_x10k,
         |       CAST(CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0
         |            ELSE (10000 * pd.n_hapax) // pd.n_tokens END AS BIGINT) AS hapax_x10k
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q122_score_calibration" ->
      s"""WITH $clsChainSql,
         |b AS (SELECT (score + $CalShift) // $CalWidth AS bin FROM sc),
         |h AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs FROM b GROUP BY bin),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM h)
         |SELECT CAST(bin AS BIGINT) AS bin,
         |       CAST(bin * $CalWidth - $CalShift AS BIGINT) AS bin_lo, n_docs,
         |       CAST((10000 * n_docs) // t.n_total AS BIGINT) AS share_x10k
         |FROM h, t ORDER BY bin""".stripMargin,
    "q123_token_drift" ->
      s"""WITH tk AS (SELECT doc_id % 2 = 0 AS in_a, unnest($normToks) AS token
         |            FROM documents),
         |per AS (SELECT token,
         |               CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |               CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
         |        FROM tk GROUP BY token),
         |t AS (SELECT CAST(sum(c_a) AS BIGINT) AS t_a,
         |             CAST(sum(c_b) AS BIGINT) AS t_b FROM per)
         |SELECT token, c_a, c_b,
         |       CAST(CASE WHEN t_a = 0 THEN 0 ELSE (10000 * c_a) // t_a END AS BIGINT)
         |         AS rate_a_x10k,
         |       CAST(CASE WHEN t_b = 0 THEN 0 ELSE (10000 * c_b) // t_b END AS BIGINT)
         |         AS rate_b_x10k,
         |       abs(CAST(CASE WHEN t_a = 0 THEN 0 ELSE (10000 * c_a) // t_a END AS BIGINT)
         |         - CAST(CASE WHEN t_b = 0 THEN 0 ELSE (10000 * c_b) // t_b END AS BIGINT))
         |         AS drift_x10k
         |FROM per, t WHERE c_a + c_b >= $DriftMinCount
         |ORDER BY token""".stripMargin,
    "q124_sorted_neighborhood" ->
      s"""WITH docs0 AS (SELECT * FROM documents),
         |$simhashCte,
         |o AS (SELECT id, simhash,
         |             CAST(row_number() OVER (ORDER BY simhash, id) AS BIGINT) AS idx
         |      FROM sig)
         |SELECT a.id AS id_a, b.id AS id_b, CAST(b.idx - a.idx AS BIGINT) AS gap,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM o a JOIN o b ON b.idx - a.idx BETWEEN 1 AND $SnWindow
         |ORDER BY id_a, id_b""".stripMargin,
    "q125_curation_funnel" ->
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
         |losers AS (
         |  SELECT DISTINCT i.id_b AS doc_id
         |  FROM inter i
         |  JOIN sizes sa ON sa.id = i.id_a
         |  JOIN sizes sb ON sb.id = i.id_b
         |  WHERE floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common))
         |        >= ${DataPrepQueries.JaccardMinX10k}),
         |$langCaseSql,
         |qm AS (SELECT doc_id,
         |         CAST(len($toks) AS BIGINT) AS n_tokens,
         |         CAST(CASE WHEN len($toks) > 0
         |              THEN floor(10000 * ${hitsSql("en")} / len($toks))
         |              ELSE 0 END AS BIGINT) AS stop_per_10k,
         |         CAST(CASE WHEN len($toks) > 0
         |              THEN floor(100 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks))
         |              ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |       FROM documents),
         |f AS (SELECT d.doc_id, d.source,
         |        CASE WHEN lp.lang_pred <> 'und' THEN 1 ELSE 0 END AS g_lang,
         |        CASE WHEN lp.lang_pred <> 'und'
         |             AND qm.n_tokens BETWEEN 10 AND 500
         |             AND qm.stop_per_10k <= 3000
         |             AND qm.mean_tok_len_x100 BETWEEN 200 AND 800
         |             THEN 1 ELSE 0 END AS g_quality,
         |        CASE WHEN lo.doc_id IS NULL THEN 0 ELSE 1 END AS is_loser
         |      FROM documents d
         |      JOIN lp ON d.doc_id = lp.doc_id
         |      JOIN qm ON d.doc_id = qm.doc_id
         |      LEFT JOIN losers lo ON d.doc_id = lo.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
         |       CAST(sum(g_lang) AS BIGINT) AS n_lang,
         |       CAST(sum(g_quality) AS BIGINT) AS n_quality,
         |       CAST(sum(CASE WHEN g_quality = 1 AND is_loser = 0 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_final,
         |       CAST((10000 * sum(CASE WHEN g_quality = 1 AND is_loser = 0
         |                        THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         |         AS retained_x10k
         |FROM f GROUP BY source ORDER BY source""".stripMargin
  )
}
