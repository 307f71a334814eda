package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.Ann

/** Round-4 wave-6 pattern operators: market-basket association mining over
  * user-day event baskets (support/confidence/lift, all ×10k/×1k
  * integers), the event-type Markov transition matrix, the IVF recall
  * sweep ([[Ann.recallSweep]] — "what nProbe do I need" as a query), and
  * KWIC concordance extraction (the retrieval/debugging view of a corpus).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key.
  */
object PatternQueries {

  val DayMs = 86400000L
  /** Basket-pair support floor (baskets containing both items). */
  val BasketMinSupport = 50L
  /** KWIC probe terms (chosen from the corpus head vocabulary) and the
    * context half-width in tokens. */
  val ConcordTerms = Seq("customer", "join")
  val ConcordWidth = 3

  /** X122 — market-basket association pairs: baskets = (user, UTC day),
    * items = distinct event types in the basket; for every unordered item
    * pair, support/confidence/lift as exact integers — the association-
    * rule screen over behavioral logs (which actions co-occur within a
    * user-day). Scale shape: the basket self-join fans out ≤ |itemset|²
    * per basket (items are DISTINCT per basket, |itemset| is the
    * event-type vocabulary — bounded, never corpus²); item totals and the
    * basket count are vocabulary-/1-row-sized broadcasts. */
  def q117_basket_pairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_ms div $DayMs").as("d"), col("event_type"))
      .distinct()
    val items = e.groupBy("event_type").agg(count(lit(1)).as("n_item"))
    val baskets = e.select("user_id", "d").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = e.select(col("user_id"), col("d"), col("event_type").as("item_a"))
      .join(e.select(col("user_id"), col("d"), col("event_type").as("item_b")),
        Seq("user_id", "d"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= BasketMinSupport)
    pairs
      .join(items.select(col("event_type").as("item_a"), col("n_item").as("n_a")), "item_a")
      .join(items.select(col("event_type").as("item_b"), col("n_item").as("n_b")), "item_b")
      .crossJoin(broadcast(baskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_baskets"),
        expr("(10000 * n_ab) div n_baskets").as("support_x10k"),
        expr("(1000 * n_ab) div n_a").as("conf_ab_x1k"),
        // DECIMAL(38,0): n_ab·n_baskets overflows BIGINT once both pass
        // ~3e9 baskets (round-9 envelope audit)
        expr("CAST((1000 * CAST(n_ab AS DECIMAL(38,0)) * n_baskets) div (n_a * n_b) AS BIGINT)").as("lift_x1k"))
      .orderBy("item_a", "item_b")
  }

  /** X123 — event-type Markov transition matrix: per user, consecutive
    * event pairs in (ts, event_id) order; per (from, to) cell, the count
    * and the row-conditional probability ×1000 — the session-model /
    * next-action baseline over behavioral logs. One lag window partitioned
    * by user (parallel across users at any scale), a |types|²-bounded
    * aggregate, and a |types|-row broadcast for the row totals. */
  def q118_transition_matrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = trans.groupBy("from_type").agg(sum("n_trans").as("n_from"))
    trans.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"),
        expr("(1000 * n_trans) div n_from").as("prob_x1k"))
      .orderBy("from_type", "to_type")
  }

  /** X124 — IVF recall sweep ([[Ann.recallSweep]]): exact recall@k against
    * the brute-force ground truth at probe depths 1/2/4/8, same geometry
    * and constants as the q31 production index. The index-tuning query a
    * corpus-scale ANN deployment runs before fixing nProbe. */
  def q119_ann_recall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Ann.recallSweep(
      emb.filter(pmod(col("vec_id"), lit(DataPrepQueries.AnnQueryMod)) === 0), emb,
      DataPrepQueries.AnnK, nCentroids = DataPrepQueries.IvfCentroids,
      probeDepths = Seq(1, 2, 4, 8), trainRounds = DataPrepQueries.IvfTrainRounds)
  }

  /** X125 — KWIC concordance: every occurrence of the probe terms with its
    * ±`ConcordWidth`-token context window — the qualitative-inspection /
    * retrieval-debugging view (what does "customer" actually look like in
    * this corpus?). One narrow posexplode pass, filter on the (tiny,
    * broadcast-literal) term set, context sliced from the already-bound
    * token array — no joins, no corpus shuffle beyond the output sort. */
  def q120_concordance(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("t"))
    tk.select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("pos0", "term")))
      .filter(col("term").isin(ConcordTerms.map(lit): _*))
      .withColumn("pos", (col("pos0") + 1).cast("long"))
      .withColumn("ctx_start", greatest(lit(1), col("pos") - ConcordWidth))
      .withColumn("ctx_end", least(size(col("t")).cast("long"), col("pos") + ConcordWidth))
      .select(col("doc_id"), col("term"), col("pos"),
        concat_ws(" ", slice(col("t"), col("ctx_start"),
          (col("ctx_end") - col("ctx_start") + 1).cast("int"))).as("context"))
      .orderBy("term", "doc_id", "pos")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_basket_pairs" -> q117_basket_pairs,
    "q118_transition_matrix" -> q118_transition_matrix,
    "q119_ann_recall" -> q119_ann_recall,
    "q120_concordance" -> q120_concordance
  )

  // ---------------------------------------------------------------- oracles

  import AnalyticsQueries.normToks
  import DataPrepQueries.{lloydCentSql, quantVec}

  val oracles: Map[String, String] = Map(
    "q117_basket_pairs" ->
      s"""WITH e AS (SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS d, event_type
         |           FROM events),
         |items AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
         |          FROM e GROUP BY event_type),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
         |       FROM (SELECT DISTINCT user_id, d FROM e)),
         |p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
         |             CAST(count(*) AS BIGINT) AS n_ab
         |      FROM e a JOIN e b ON a.user_id = b.user_id AND a.d = b.d
         |                AND a.event_type < b.event_type
         |      GROUP BY a.event_type, b.event_type
         |      HAVING count(*) >= $BasketMinSupport)
         |SELECT p.item_a, p.item_b, p.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
         |       nb.n_baskets,
         |       CAST((10000 * p.n_ab) // nb.n_baskets AS BIGINT) AS support_x10k,
         |       CAST((1000 * p.n_ab) // ia.n_item AS BIGINT) AS conf_ab_x1k,
         |       CAST((1000 * p.n_ab * nb.n_baskets) // (ia.n_item * ib.n_item) AS BIGINT)
         |         AS lift_x1k
         |FROM p JOIN items ia ON p.item_a = ia.event_type
         |       JOIN items ib ON p.item_b = ib.event_type, nb
         |ORDER BY item_a, item_b""".stripMargin,
    "q118_transition_matrix" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
         |l AS (SELECT event_type AS to_type,
         |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id)
         |               AS from_type
         |      FROM e),
         |t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
         |      FROM l WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
         |ft AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
         |       FROM t GROUP BY from_type)
         |SELECT t.from_type, t.to_type, t.n_trans, ft.n_from,
         |       CAST((1000 * t.n_trans) // ft.n_from AS BIGINT) AS prob_x1k
         |FROM t JOIN ft USING (from_type)
         |ORDER BY from_type, to_type""".stripMargin,
    "q119_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, $quantVec AS qv FROM embeddings),
         |${lloydCentSql(DataPrepQueries.IvfCentroids, DataPrepQueries.IvfTrainRounds)},
         |ca AS (
         |  SELECT v.vec_id AS neighbor_id, v.qv AS cv, c.cent_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(v.qv)), i -> v.qv[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM v, cent c),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY cdot DESC, cent_id ASC) AS rn FROM ca),
         |assigned AS (SELECT neighbor_id, cv, cent_id AS bucket FROM ar WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, qv FROM v
         |       WHERE vec_id % ${DataPrepQueries.AnnQueryMod} = 0),
         |qa AS (
         |  SELECT q.query_id, q.qv, c.cent_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM qs q, cent c),
         |qr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id ASC) AS pr FROM qa),
         |cand AS (
         |  SELECT p.query_id, a.neighbor_id, p.pr,
         |         CAST(list_sum(list_transform(generate_series(1, len(p.qv)), i -> p.qv[i] * a.cv[i])) AS BIGINT) AS dot
         |  FROM qr p JOIN assigned a ON p.cent_id = a.bucket
         |  WHERE p.query_id <> a.neighbor_id),
         |bs AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * v.qv[i])) AS BIGINT) AS dot
         |  FROM qs q JOIN v ON q.query_id <> v.vec_id),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
         |    FROM bs) WHERE rank <= ${DataPrepQueries.AnnK}),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_brute FROM brute),
         |sweep AS (
         |  ${Seq(1, 2, 4, 8).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe, CAST(count(*) AS BIGINT) AS hits
           |  FROM (SELECT query_id, neighbor_id FROM (
           |          SELECT query_id, neighbor_id,
           |                 row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
           |          FROM cand WHERE pr <= $np) WHERE rank <= ${DataPrepQueries.AnnK}) i
           |  JOIN brute USING (query_id, neighbor_id)""".stripMargin
      }.mkString("\n  UNION ALL\n  ")})
         |SELECT nprobe, hits, nb.n_brute,
         |       CAST(CASE WHEN nb.n_brute = 0 THEN 0
         |            ELSE (1000 * hits) // nb.n_brute END AS BIGINT) AS recall_x1k
         |FROM sweep, nb ORDER BY nprobe""".stripMargin,
    "q120_concordance" ->
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |p AS (SELECT doc_id, t,
         |             unnest(CASE WHEN len(t) = 0 THEN []
         |                    ELSE generate_series(1, len(t)) END) AS pos
         |      FROM d)
         |SELECT doc_id, t[pos] AS term, CAST(pos AS BIGINT) AS pos,
         |       array_to_string(list_slice(t, greatest(1, pos - $ConcordWidth),
         |                                  least(len(t), pos + $ConcordWidth)), ' ')
         |         AS context
         |FROM p
         |WHERE t[pos] IN (${ConcordTerms.map(t => s"'$t'").mkString(", ")})
         |ORDER BY term, doc_id, pos""".stripMargin
  )
}
