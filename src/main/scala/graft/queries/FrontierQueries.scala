package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-63:
  *
  *  - Pareto skyline (q321): the multi-objective selection primitive —
  *    documents maximal in (classifier quality, brevity); no scalar
  *    weighting (q127's rank ensemble) can produce the frontier, and
  *    every weighting's optimum LIES on it. Computed scale-safely: a
  *    per-length maximum (one partial-aggregated pass) feeds a
  *    |lengths|-bounded running-max frame broadcast back — the
  *    O(n log n) sweep-line skyline, never the NOT-EXISTS n² scan the
  *    oracle uses;
  *  - trie-depth profile (q322): distinct-prefix counts per depth over
  *    the vocabulary + branching factor ×100 — the index-sizing curve
  *    behind the X221 autocomplete trie (how many nodes per level a
  *    prefix index materializes).
  */
object FrontierQueries {

  /** X352 — 2-D Pareto skyline on (score max, n_tokens min). A doc is
    * dominated iff some doc is strictly shorter with ≥ score, or ≤
    * length with > score — tested against two running maxima read off
    * the per-length max table (m₁ = best score among strictly shorter,
    * m₂ = best score at own length): frontier ⇔ score > m₁ AND score ≥
    * m₂-of-own-length. Ties on both axes stay on the frontier. */
  def q321_pareto_skyline(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select("doc_id")
      .join(TrainPrepQueries.classifierScores(spark, dir), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val perLen = scored.groupBy("n_tokens").agg(max("score").as("len_max"))
    // |distinct lengths|-bounded frame — the corpus is never windowed
    val m1 = perLen.withColumn("m1",
      max("len_max").over(Window.orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)))
    scored.join(broadcast(m1), "n_tokens")
      .filter((col("m1").isNull || col("score") > col("m1")) &&
        col("score") >= col("len_max"))
      .select("doc_id", "n_tokens", "score")
      .orderBy("n_tokens", "doc_id")
  }

  /** X353 — trie-depth profile of the vocabulary: distinct prefixes at
    * depths 1..[[TrieMaxDepth]] (tokens shorter than d contribute their
    * full form — a terminal node) + branching ×100 vs the previous
    * level. */
  val TrieMaxDepth = 6
  def q322_trie_profile(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(wsTokens(col("text"))).as("t")).distinct()
    val depths = (1 to TrieMaxDepth).map { d =>
      vocab.select(substring(col("t"), 1, d).as("p")).distinct()
        .agg(count(lit(1)).as("n_prefixes"))
        .select(lit(d.toLong).as("depth"), col("n_prefixes"))
    }.reduce(_ unionByName _)
    depths.withColumn("prev",
        lag("n_prefixes", 1).over(Window.orderBy("depth")))
      .withColumn("branching_x100",
        when(col("prev").isNull, lit(100L))
          .otherwise(expr("(100 * n_prefixes) div prev")))
      .select("depth", "n_prefixes", "branching_x100")
      .orderBy("depth")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q321_pareto_skyline" -> q321_pareto_skyline,
    "q322_trie_profile" -> q322_trie_profile
  )

  import DataPrepQueries.toks

  val oracles: Map[String, String] = Map(
    "q321_pareto_skyline" ->
      s"""WITH ${TrainPrepQueries.clsChainSql},
         |d AS (SELECT doc_id, n_tokens, score FROM sc)
         |SELECT d.doc_id, d.n_tokens, d.score
         |FROM d
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM d e
         |  WHERE e.n_tokens <= d.n_tokens AND e.score >= d.score
         |    AND (e.n_tokens < d.n_tokens OR e.score > d.score))
         |ORDER BY d.n_tokens, d.doc_id""".stripMargin,
    "q322_trie_profile" -> {
      val arms = (1 to TrieMaxDepth).map { d =>
        s"""SELECT CAST($d AS BIGINT) AS depth,
           |       (SELECT count(DISTINCT substr(t, 1, $d)) FROM vocab) AS n_prefixes""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH vocab AS (
         |  SELECT DISTINCT unnest($toks) AS t FROM documents),
         |lv AS ($arms)
         |SELECT depth, n_prefixes,
         |       CAST(CASE WHEN lag(n_prefixes) OVER (ORDER BY depth) IS NULL THEN 100
         |            ELSE (100 * n_prefixes) // lag(n_prefixes) OVER (ORDER BY depth)
         |            END AS BIGINT) AS branching_x100
         |FROM lv ORDER BY depth""".stripMargin
    }
  )
}
