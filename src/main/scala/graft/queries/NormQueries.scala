package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-5 wave-14c score-normalization operators: within-source quantile
  * normalization (make one quality score comparable ACROSS sources whose
  * raw distributions differ — the gate that keeps a clean-prose source
  * from monopolizing the budget just because its raw scores run high),
  * and an integer readability/complexity profile (vowel-group syllable
  * proxy — the Flesch-family signal without floats).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key. */
object NormQueries {

  /** Complexity flag threshold: syllables-per-word ×100 above this reads
    * as dense/technical text. */
  val ComplexSylX100 = 180L

  /** X164 — within-source quantile normalization: each doc's en-stopword
    * fluency (the q13/q127 signal) mapped to its percentile INSIDE its
    * own source — `pct_x10k = ⌊10⁴·(rank−1)/(n−1)⌋` (ties → doc_id; a
    * single-doc source pins to 0). Raw scores are incomparable across
    * sources (a forum dump and an encyclopedia have different score
    * distributions); percentiles are the standard calibration-free fix,
    * and the within-source window means a corpus-wide gate at
    * "pct ≥ 5000" keeps the best HALF OF EACH SOURCE rather than the
    * highest-raw-score sources wholesale (the q127 Borda blend is the
    * cross-signal sibling; this is the cross-source one).
    *
    * Scale: one scalar metric pass + ONE source-partitioned rank window
    * (parallel across sources; per-source counts ride the same window,
    * no second shuffle). */
  def q155_quantile_norm(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(tokenCountWs(col("text")) > 0,
          floor(lit(10000L) * stopwordHits(col("text"), "en") / tokenCountWs(col("text"))))
          .otherwise(0L).cast("long").as("fluency_x10k"))
    val w = Window.partitionBy("source")
    scored
      .withColumn("rk",
        row_number().over(w.orderBy(col("fluency_x10k"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w).cast("long"))
      .withColumn("pct_x10k",
        expr("CASE WHEN n <= 1 THEN 0L ELSE (10000 * (rk - 1)) div (n - 1) END"))
      .select("doc_id", "source", "fluency_x10k", "pct_x10k")
      .orderBy("doc_id")
  }

  /** X168 — integer readability profile: per doc, syllables-per-word
    * ×100 (syllable proxy = maximal vowel groups — the classic
    * float-free stand-in for the Flesch/SMOG family), letters-per-word
    * ×100, and the dense-text flag at `ComplexSylX100`. The curation
    * read that separates technical/jargon-heavy text from plain prose
    * INDEPENDENTLY of length or stopword mix (q13 measures fluency;
    * this measures density — a physics paper is fluent AND dense).
    * Pure codegen'd regexp map pass, zero shuffles before the output
    * sort. */
  def q159_readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCountWs(col("text")).cast("long").as("n_words"),
        regexp_count(lower(col("text")), lit("[aeiou]+")).cast("long").as("n_syl"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("n_letters"))
      .withColumn("syl_per_word_x100",
        expr("CASE WHEN n_words = 0 THEN 0L ELSE (100 * n_syl) div n_words END"))
      .withColumn("letters_per_word_x100",
        expr("CASE WHEN n_words = 0 THEN 0L ELSE (100 * n_letters) div n_words END"))
      .withColumn("dense", (col("syl_per_word_x100") > ComplexSylX100).cast("int"))
      .select("doc_id", "source", "n_words", "n_syl", "syl_per_word_x100",
        "letters_per_word_x100", "dense")
      .orderBy("doc_id")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_quantile_norm" -> q155_quantile_norm,
    "q159_readability" -> q159_readability
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{hitsSql, toks}

  val oracles: Map[String, String] = Map(
    "q155_quantile_norm" ->
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |         CAST(CASE WHEN len($toks) > 0
         |              THEN floor(10000 * ${hitsSql("en")} / len($toks))
         |              ELSE 0 END AS BIGINT) AS fluency_x10k
         |  FROM documents),
         |r AS (SELECT *,
         |             CAST(row_number() OVER (PARTITION BY source
         |                  ORDER BY fluency_x10k, doc_id) AS BIGINT) AS rk,
         |             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |      FROM f)
         |SELECT doc_id, source, fluency_x10k,
         |       CAST(CASE WHEN n <= 1 THEN 0
         |            ELSE (10000 * (rk - 1)) // (n - 1) END AS BIGINT) AS pct_x10k
         |FROM r ORDER BY doc_id""".stripMargin,
    "q159_readability" ->
      s"""WITH m AS (
         |  SELECT doc_id, source,
         |         CAST(len($toks) AS BIGINT) AS n_words,
         |         CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_syl,
         |         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_letters
         |  FROM documents)
         |SELECT doc_id, source, n_words, n_syl,
         |       CAST(CASE WHEN n_words = 0 THEN 0
         |            ELSE (100 * n_syl) // n_words END AS BIGINT) AS syl_per_word_x100,
         |       CAST(CASE WHEN n_words = 0 THEN 0
         |            ELSE (100 * n_letters) // n_words END AS BIGINT) AS letters_per_word_x100,
         |       CAST(CASE WHEN (CASE WHEN n_words = 0 THEN 0
         |                       ELSE (100 * n_syl) // n_words END) > $ComplexSylX100
         |            THEN 1 ELSE 0 END AS INT) AS dense
         |FROM m ORDER BY doc_id""".stripMargin
  )
}
