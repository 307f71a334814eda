package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** Round-5 wave-15c text-structure operators: RAKE keyword extraction
  * (stopword-delimited candidate phrases scored by word degree/frequency —
  * the unsupervised corpus-description artifact) and intra-document
  * sentence dedup (the C4-style repeated-sentence signal at the grain
  * q86's fixed chunks and q103's cross-doc grams both miss).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a deterministic key.
  */
object KeywordQueries {

  /** RAKE candidate phrases longer than this are discarded (runaway runs
    * in stopword-free text are not keyphrases). */
  val MaxPhraseLen = 4

  /** Keyphrases reported. */
  val TopPhrases = 25

  /** X175 — RAKE keyword extraction (Rose et al. 2010, integer-exact):
    * candidate phrases are maximal runs of non-stopword tokens (split on
    * the en stoplist, capped at [[MaxPhraseLen]] words); per word,
    * freq = occurrences across all phrase occurrences and deg = total
    * words of those phrases; word score = ⌊1000·deg/freq⌋ (degree over
    * frequency — long-phrase membership up-weights); phrase score = Σ of
    * its words' scores (with multiplicity). Emits the [[TopPhrases]] top
    * keyphrases by (score desc, phrase asc) with occurrence counts — the
    * corpus-descriptor table a datasheet (q92) links next to its volume
    * numbers.
    *
    * Scale: run detection is a doc-partitioned island window (pos −
    * row_number, parallel across docs — the q136 pattern); word stats are
    * a vocabulary-keyed partial aggregate over DISTINCT phrases weighted
    * by occurrence counts (never the corpus rows again); the final rank
    * is TakeOrderedAndProject over the phrase table. No corpus window,
    * nothing quadratic.
    */
  def q165_rake_keywords(spark: SparkSession, dir: String): DataFrame = {
    val stops = TextFunctions.Stopwords.toMap.apply("en")
    // Run detection WITHOUT the token explode + per-doc window + struct
    // collect of earlier rounds (measured 3.1× DuckDB at sf0.1): a
    // stopword-delimited phrase is computable per ROW — mark stop/empty
    // tokens with a sentinel (\\u0001 — can't occur in normalized text:
    // ASCII punctuation is stripped, and the corpus is plain text), join,
    // split on sentinel runs. One narrow map-only scan feeding one
    // groupBy; the corpus never hits a window sort or a collect_list.
    val D = "\u0001"
    val stopList = stops.map(s => s"'$s'").mkString(", ")
    val phrOcc = Tables.documents(spark, dir)
      .select(wsTokens(normalizeText(col("text"))).as("t"))
      .select(explode(expr(
        s"filter(split(concat_ws(' ', transform(t, x -> IF(length(x) = 0 OR x IN ($stopList), '$D', x))), '[$D ]*$D[$D ]*'), p -> p <> '')"))
        .as("phrase"))
      .filter(size(split(col("phrase"), " ")).between(1, MaxPhraseLen))
      .groupBy("phrase")
      .agg(count(lit(1)).cast("long").as("n_occ"))
    // NOT cached (round-9 A/B at sf0.1, min of 3: uncached 0.86 s vs
    // cached 1.22 s): the word-score aggregate and the scoring join
    // both sit on phrOcc's groupBy(phrase) exchange, which ReuseExchange
    // computes once — the corpus pass does NOT run twice uncached, and
    // the cache only added materialization.
    // distinct phrase → its word multiset (plen = words per occurrence)
    val pw = phrOcc
      .withColumn("plen", size(split(col("phrase"), " ")).cast("long"))
      .withColumn("word", explode(split(col("phrase"), " ")))
    val wordScore = pw.groupBy("word")
      .agg(sum("n_occ").cast("long").as("freq"),
        sum(col("n_occ") * col("plen")).cast("long").as("deg"))
      .withColumn("wscore", expr("(1000 * deg) div freq"))
    pw.join(wordScore.select("word", "wscore"), Seq("word"))
      .groupBy("phrase", "n_occ")
      .agg(sum("wscore").cast("long").as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(TopPhrases)
      .select("phrase", "n_occ", "score")
  }

  /** X176 — intra-document sentence dedup: sentences (split on [.!?]+,
    * whitespace-normalized, lowercased) repeated WITHIN the same document
    * — boilerplate templating and copy-paste padding that per-doc gram
    * ratios (q35) dilute and cross-doc screens (q103) ignore by
    * construction. Per doc: sentence count, repeats (occurrences whose
    * identical normalized sentence appeared earlier in the doc), and the
    * repeat share ×10⁴ — the C4 "discard duplicate sentences" rule as a
    * measured signal. Docs with no sentences (empty text) emit nothing,
    * both engines.
    *
    * Scale: one split pass; the repeat flag is a (doc, sentence)-keyed
    * row_number — partitioned finer than per-doc, so giant docs don't
    * serialize; per-doc reduce shares the doc key. Nothing quadratic.
    */
  def q166_sentence_dedup(spark: SparkSession, dir: String): DataFrame = {
    val sent = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), "[.!?]+")).as(Seq("pos", "s")))
      .withColumn("sn", trim(regexp_replace(lower(col("s")), "\\s+", " ")))
      .filter(length(col("sn")) > 0)
    val w = Window.partitionBy("doc_id", "sn").orderBy("pos")
    sent
      .withColumn("dup", (row_number().over(w) > 1).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_sent"),
        sum("dup").cast("long").as("n_repeat"))
      .withColumn("repeat_share_x10k", expr("(10000 * n_repeat) div n_sent"))
      .select("doc_id", "n_sent", "n_repeat", "repeat_share_x10k")
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_rake_keywords" -> q165_rake_keywords,
    "q166_sentence_dedup" -> q166_sentence_dedup
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  private def stopListSql: String =
    TextFunctions.Stopwords.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "q165_rake_keywords" ->
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |pos AS (
         |  SELECT doc_id, i AS pos, t[i] AS token
         |  FROM (SELECT doc_id, t,
         |               unnest(CASE WHEN len(t) = 0 THEN []
         |                      ELSE generate_series(1, len(t)) END) AS i
         |        FROM d)
         |  WHERE len(t[i]) > 0 AND NOT list_contains($stopListSql, t[i])),
         |isl AS (SELECT doc_id, pos, token,
         |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |        FROM pos),
         |phr AS (SELECT doc_id, isl,
         |               string_agg(token, ' ' ORDER BY pos) AS phrase,
         |               CAST(count(*) AS BIGINT) AS plen
         |        FROM isl GROUP BY doc_id, isl),
         |occ AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
         |               CAST(min(plen) AS BIGINT) AS plen
         |        FROM phr WHERE plen BETWEEN 1 AND $MaxPhraseLen GROUP BY phrase),
         |pw AS (SELECT phrase, n_occ, plen, unnest(string_split(phrase, ' ')) AS word
         |       FROM occ),
         |ws AS (SELECT word, CAST(sum(n_occ) AS BIGINT) AS freq,
         |              CAST(sum(n_occ * plen) AS BIGINT) AS deg
         |       FROM pw GROUP BY word),
         |scored AS (
         |  SELECT pw.phrase, pw.n_occ,
         |         CAST(sum((1000 * ws.deg) // ws.freq) AS BIGINT) AS score
         |  FROM pw JOIN ws ON ws.word = pw.word
         |  GROUP BY pw.phrase, pw.n_occ)
         |SELECT phrase, n_occ, score FROM scored
         |ORDER BY score DESC, phrase LIMIT $TopPhrases""".stripMargin,
    "q166_sentence_dedup" ->
      """WITH sp AS (SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS ss
        |            FROM documents),
        |sent AS (
        |  SELECT doc_id, pos, sn FROM (
        |    SELECT doc_id, i AS pos,
        |           trim(regexp_replace(lower(ss[i]), '\s+', ' ', 'g')) AS sn
        |    FROM (SELECT doc_id, ss,
        |                 unnest(CASE WHEN len(ss) = 0 THEN []
        |                        ELSE generate_series(1, len(ss)) END) AS i
        |          FROM sp))
        |  WHERE len(sn) > 0),
        |flagged AS (
        |  SELECT doc_id,
        |         CASE WHEN row_number() OVER (PARTITION BY doc_id, sn ORDER BY pos) > 1
        |              THEN 1 ELSE 0 END AS dup
        |  FROM sent)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_sent,
        |       CAST(sum(dup) AS BIGINT) AS n_repeat,
        |       CAST((10000 * sum(dup)) // count(*) AS BIGINT) AS repeat_share_x10k
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
