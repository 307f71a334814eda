package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Ann, Relational}

/** Round-4 wave-9 flow operators: changelog compaction (state-change
  * dedup of an event stream), deterministic integer PageRank over the kNN
  * graph (embedding-space centrality — hub/outlier detection), and
  * session-path mining (the most common event-type journeys).
  *
  * Oracle conventions as the sibling modules: exact integers end-to-end,
  * identical aliases both sides, ORDER BY a unique key, non-negative
  * division operands (`div` == `//`).
  */
object FlowQueries {

  /** PageRank: unnormalized integer scale per node, damping 85/100,
    * `PrRounds` synchronous rounds. Dangling-node mass is dropped (the
    * ranking signal survives; exact both engines). */
  val PrScale = 1000000L
  val PrRounds = 3
  /** Session-path mining support floor. */
  val PathMinSessions = 5L

  /** X136 — changelog compaction: per user in (ts, event_id) order, keep
    * only the events where the type CHANGED from the previous event (the
    * state-transition compression of a status stream — the CDC-adjacent
    * "collapse heartbeats, keep edges" pass; the reference's view upsert
    * ladder is exactly this per-transaction). Emits the surviving events
    * with their change sequence number. Two windows, both partitioned by
    * user_id on the same keys — ONE shuffle (the SCD2/q62 shape). */
  def q130_changelog_compaction(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .withColumn("change_seq", row_number().over(w).cast("long"))
      .select("user_id", "ts_ms", "event_id", "event_type", "change_seq")
      .orderBy("user_id", "change_seq")
  }

  /** X137 — integer PageRank over the kNN graph: `PrRounds` synchronous
    * rounds of pr' = 15%·`PrScale` + 85%·Σ pr(u)/outdeg(u) over q91's
    * directed kNN edges, all in exact integer arithmetic — embedding-space
    * centrality (a hub sits in a dense semantic region; a node nobody
    * points at is an outlier, the retrieval-quality counterpart of the
    * q129 hygiene audit). Per round: one edge-keyed equijoin + one
    * dst-keyed partial aggregate — never materializes anything denser than
    * the edge list (the [[graft.ops.Graph]] posture). */
  def q131_pagerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val edges = OlapQueries.knnGraphPinned(spark, dir)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = emb.select(col("vec_id"))
    var pr = nodes.withColumn("pr", lit(PrScale))
    (1 to PrRounds).foreach { _ =>
      val contrib = edges.join(outdeg, "src")
        .join(pr.select(col("vec_id").as("src"), col("pr")), "src")
        .select(col("dst"), expr("(pr * 85) div (100 * outdeg)").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      pr = nodes.join(contrib.select(col("dst").as("vec_id"), col("in_mass")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(15L * PrScale / 100L) + coalesce(col("in_mass"), lit(0L))).as("pr"))
    }
    pr.orderBy("vec_id")
  }

  /** X138 — session-path mining: the event-type journey of every session
    * (q29's gap sessionization), aggregated to the common paths above the
    * support floor — the behavioral n-gram table (which flows dominate,
    * where do journeys fork). Per session the path is assembled from ONE
    * sorted collect per (user, session) group; the path table then
    * aggregates by the path string — session-count-sized, never
    * event-sized, past the first groupBy. */
  def q132_session_paths(spark: SparkSession, dir: String): DataFrame = {
    val sess = Relational.sessionize(Tables.events(spark, dir), Seq("user_id"),
      col("ts_ms"), col("event_id"), CdcQueries.SessionGapMs)
    val paths = sess.groupBy("user_id", "session_seq")
      .agg(sort_array(collect_list(
        struct(col("ts_ms"), col("event_id"), col("event_type")))).as("evs"))
      .select(
        array_join(transform(col("evs"), e => e.getField("event_type")), ">").as("path"),
        size(col("evs")).cast("long").as("n_events"))
    paths.groupBy("path", "n_events")
      .agg(count(lit(1)).as("n_sessions"))
      .filter(col("n_sessions") >= PathMinSessions)
      .orderBy("path")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_changelog_compaction" -> q130_changelog_compaction,
    "q131_pagerank" -> q131_pagerank,
    "q132_session_paths" -> q132_session_paths
  )

  // ---------------------------------------------------------------- oracles

  import OlapQueries.knnChainSql

  private def prRoundSql(i: Int): String =
    s"""c$i AS (SELECT e.dst, CAST(sum((p.pr * 85) // (100 * od.outdeg)) AS BIGINT) AS in_mass
       |        FROM edges e JOIN odeg od ON e.src = od.src
       |                     JOIN p${i - 1} p ON e.src = p.vec_id
       |        GROUP BY e.dst),
       |p$i AS (SELECT n.vec_id,
       |               CAST(${15L * PrScale / 100L} + coalesce(c$i.in_mass, 0) AS BIGINT) AS pr
       |        FROM nodes n LEFT JOIN c$i ON n.vec_id = c$i.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q130_changelog_compaction" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type
         |           FROM events),
         |l AS (SELECT *, lag(event_type) OVER
         |        (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
         |      FROM e),
         |k AS (SELECT user_id, ts_ms, event_id, event_type FROM l
         |      WHERE prev IS NULL OR prev <> event_type)
         |SELECT user_id, ts_ms, event_id, event_type,
         |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
         |            AS BIGINT) AS change_seq
         |FROM k ORDER BY user_id, change_seq""".stripMargin,
    "q131_pagerank" ->
      s"""WITH $knnChainSql,
         |edges AS (SELECT query_id AS src, neighbor_id AS dst
         |          FROM r WHERE rank <= ${OlapQueries.KnnK}),
         |odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
         |nodes AS (SELECT vec_id FROM embeddings),
         |p0 AS (SELECT vec_id, CAST($PrScale AS BIGINT) AS pr FROM nodes),
         |${(1 to PrRounds).map(prRoundSql).mkString(",\n")}
         |SELECT vec_id, pr FROM p$PrRounds ORDER BY vec_id""".stripMargin,
    "q132_session_paths" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
         |           FROM events),
         |g AS (
         |  SELECT *,
         |    CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
         |           OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
         |              > ${CdcQueries.SessionGapMs}
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM e),
         |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
         |            ORDER BY ts_ms, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         |      FROM g),
         |p AS (SELECT user_id, session_seq,
         |             string_agg(event_type, '>' ORDER BY ts_ms, event_id) AS path,
         |             CAST(count(*) AS BIGINT) AS n_events
         |      FROM s GROUP BY user_id, session_seq)
         |SELECT path, n_events, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM p GROUP BY path, n_events
         |HAVING count(*) >= $PathMinSessions
         |ORDER BY path""".stripMargin
  )
}
