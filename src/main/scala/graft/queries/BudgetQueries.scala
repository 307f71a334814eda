package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-4 wave-12 budget/leakage operators: tokenizer economics per
  * source (bytes per token — what a source actually costs to train on),
  * context-window overflow accounting (chunks + padding waste at a fixed
  * context size), and the eval↔train leakage score (max shingle overlap
  * of each held-out doc against the training half — the continuous form
  * of q53's binary decontamination).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key. */
object BudgetQueries {

  /** Context size for overflow accounting (tokens per window). */
  val CtxTokens = 64L
  /** Leakage screen: flag held-out docs sharing at least this many
    * distinct `DataPrepQueries.ShingleN`-shingles with one training doc. */
  val LeakMinCommon = 10L

  /** X145 — tokenizer economics: per source, UTF-8-ish byte mass, BPE-ish
    * and whitespace token counts, and bytes-per-BPE-token ×1000 — the
    * cost-of-training view (a source whose bytes/token ratio is low is
    * markup/code-heavy; one with a high ratio is long-word natural text;
    * the budget planner reads this next to the q107 mixture). One
    * codegen'd map pass + a |sources|-row aggregate. */
  def q139_tokenizer_economics(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), length(col("text")).cast("long").as("bytes"),
        tokenCountBpe(col("text")).cast("long").as("bpe"),
        tokenCountWs(col("text")).cast("long").as("ws"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("bytes").as("n_bytes"),
        sum("bpe").as("n_tokens_bpe"), sum("ws").as("n_tokens_ws"))
      .withColumn("bytes_per_bpe_x1k",
        expr("CASE WHEN n_tokens_bpe = 0 THEN 0L ELSE (1000 * n_bytes) div n_tokens_bpe END"))
      .orderBy("source")

  /** X146 — context-window overflow accounting: per source at a fixed
    * `CtxTokens` context, the chunk count (⌈ntok/C⌉ per doc) and the
    * padding waste of the final partial chunks — pad share ×10k of the
    * padded token budget. The capacity-planning twin of q34's packing
    * (packing REDUCES this waste; this measures what naive per-doc
    * chunking would cost). One token-count pass, integer ceiling via
    * (n + C − 1) div C, a |sources|-row aggregate. */
  def q140_context_overflow(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        size(wsTokens(normalizeText(col("text")))).cast("long").as("ntok"))
      .withColumn("chunks", expr(s"(ntok + ${CtxTokens - 1}) div $CtxTokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
        sum("chunks").as("n_chunks"))
      .withColumn("pad_tokens", col("n_chunks") * CtxTokens - col("n_tokens"))
      .withColumn("pad_frac_x10k", expr(
        s"CASE WHEN n_chunks = 0 THEN 0L ELSE (10000 * pad_tokens) div (n_chunks * $CtxTokens) END"))
      .orderBy("source")

  /** X147 — eval↔train leakage score: for every odd-half (held-out) doc,
    * the maximum distinct-shingle intersection against any single
    * even-half (training) doc, with the argmax doc and the flag at
    * `LeakMinCommon` — the continuous leakage signal behind q53's binary
    * decontamination verdict (HOW leaked, and to which doc, not just
    * whether). Distinct (doc, shingle) pass split by parity, one shingle
    * equijoin (df-capped by construction: shingles are distinct per doc,
    * the training side bounded like q16's inverted index), per-eval-doc
    * argmax via max-of-struct partial aggregate — no corpus window. */
  def q141_leakage_score(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = docs
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("__t"))
      .select(col("doc_id"),
        explode(shinglesFromTokens(col("__t"), DataPrepQueries.ShingleN)).as("shingle"))
    val ev = sh.filter(col("doc_id") % 2 === 1)
    val tr = sh.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val inter = ev.join(tr, "shingle")
      .groupBy(col("doc_id"), col("train_id"))
      .agg(count(lit(1)).as("n_common"))
      .groupBy("doc_id")
      .agg(max(struct(col("n_common").as("c"), (-col("train_id")).as("nt"))).as("m"))
      .select(col("doc_id"), col("m.c").as("n_common"), (-col("m.nt")).as("best_train_id"))
    docs.select("doc_id").filter(col("doc_id") % 2 === 1)
      .join(inter, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        col("best_train_id"),
        (coalesce(col("n_common"), lit(0L)) >= LeakMinCommon).cast("int").as("leaked"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_tokenizer_economics" -> q139_tokenizer_economics,
    "q140_context_overflow" -> q140_context_overflow,
    "q141_leakage_score" -> q141_leakage_score
  )

  // ---------------------------------------------------------------- oracles

  import AnalyticsQueries.normToks
  import DataPrepQueries.shingleCte

  val oracles: Map[String, String] = Map(
    "q139_tokenizer_economics" ->
      s"""WITH d AS (SELECT source, CAST(length(text) AS BIGINT) AS bytes,
         |             CAST(len(regexp_extract_all(text,
         |                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe,
         |             CAST(len($normToks) AS BIGINT) AS ws
         |           FROM documents),
         |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(bytes) AS BIGINT) AS n_bytes,
         |             CAST(sum(bpe) AS BIGINT) AS n_tokens_bpe,
         |             CAST(sum(ws) AS BIGINT) AS n_tokens_ws
         |      FROM d GROUP BY source)
         |SELECT *, CAST(CASE WHEN n_tokens_bpe = 0 THEN 0
         |            ELSE (1000 * n_bytes) // n_tokens_bpe END AS BIGINT)
         |         AS bytes_per_bpe_x1k
         |FROM p ORDER BY source""".stripMargin,
    "q140_context_overflow" ->
      s"""WITH d AS (SELECT source, CAST(len($normToks) AS BIGINT) AS ntok
         |           FROM documents),
         |c AS (SELECT source, ntok, (ntok + ${CtxTokens - 1}) // $CtxTokens AS chunks
         |      FROM d),
         |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |             CAST(sum(chunks) AS BIGINT) AS n_chunks
         |      FROM c GROUP BY source)
         |SELECT *, CAST(n_chunks * $CtxTokens - n_tokens AS BIGINT) AS pad_tokens,
         |       CAST(CASE WHEN n_chunks = 0 THEN 0
         |            ELSE (10000 * (n_chunks * $CtxTokens - n_tokens))
         |                 // (n_chunks * $CtxTokens) END AS BIGINT) AS pad_frac_x10k
         |FROM p ORDER BY source""".stripMargin,
    "q141_leakage_score" ->
      s"""WITH $shingleCte,
         |ev AS (SELECT id, shingle FROM sh WHERE id % 2 = 1),
         |tr AS (SELECT id AS train_id, shingle FROM sh WHERE id % 2 = 0),
         |i AS (SELECT ev.id AS doc_id, tr.train_id, count(*) AS n_common
         |      FROM ev JOIN tr USING (shingle) GROUP BY ev.id, tr.train_id),
         |bst AS (SELECT doc_id, n_common, train_id AS best_train_id FROM (
         |          SELECT *, row_number() OVER (PARTITION BY doc_id
         |                 ORDER BY n_common DESC, train_id) AS rk FROM i)
         |        WHERE rk = 1)
         |SELECT d.doc_id, CAST(coalesce(b.n_common, 0) AS BIGINT) AS n_common,
         |       CAST(b.best_train_id AS BIGINT) AS best_train_id,
         |       CAST(CASE WHEN coalesce(b.n_common, 0) >= $LeakMinCommon
         |            THEN 1 ELSE 0 END AS INT) AS leaked
         |FROM documents d LEFT JOIN bst b ON d.doc_id = b.doc_id
         |WHERE d.doc_id % 2 = 1
         |ORDER BY d.doc_id""".stripMargin
  )
}
