package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Round-7 wave-43 explanation/tuning operators: near-duplicate
  * EXPLANATIONS (which shared shingles actually drove each top pair —
  * the evidence a dedup review reads before deleting anything) and the
  * session-gap sensitivity sweep (how the inactivity threshold changes
  * what a "session" is — the sessionization twin of q260's τ sweep).
  *
  * Oracle conventions as the sibling modules: exact integers,
  * identical aliases both sides, ORDER BY a unique key.
  */
object ExplainQueries {

  /** Pairs explained and evidence shingles per pair. */
  val ExplainPairs = 20
  val ExplainShingles = 5

  /** X291 — near-dup explanation: for the top-[[ExplainPairs]] Jaccard
    * pairs, the [[ExplainShingles]] RAREST shared shingles (corpus df
    * ascending — rare shared shingles are the discriminating evidence;
    * shared stopword grams explain nothing). This is the table a
    * human reviews before a dedup pass deletes: every deletion
    * decision gets named evidence instead of a similarity score.
    *
    * Scale: pairs come from the pinned intersection core (top-k cut),
    * shingle sets join per pair id (bounded by the pair cut), df is
    * the pinned shingle table aggregated once. */
  def q263_neardup_evidence(spark: SparkSession, dir: String): DataFrame = {
    import DataPrepQueries.{ShingleN, JaccardMaxDf, JaccardMinX10k}
    val pairs = Dedup.jaccardPairsPinned(spark, dir, ShingleN, JaccardMinX10k, JaccardMaxDf)
      .orderBy(col("jaccard_x10k").desc, col("id_a"), col("id_b"))
      .limit(ExplainPairs)
      .select("id_a", "id_b", "jaccard_x10k")
    val sh = Dedup.pinnedShingles(spark, dir, ShingleN)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val shared = pairs
      .join(sh.select(col("id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
    val w = Window.partitionBy("id_a", "id_b")
      .orderBy(col("df").asc, col("shingle").asc)
    shared.join(df, "shingle")
      .withColumn("evidence_rank", row_number().over(w).cast("long"))
      .filter(col("evidence_rank") <= ExplainShingles)
      .select(col("id_a"), col("id_b"), col("jaccard_x10k"),
        col("evidence_rank"), col("shingle"), col("df"))
      .orderBy("id_a", "id_b", "evidence_rank")
  }

  /** Inactivity gaps swept (minutes). */
  val GapSweepMin = Seq(10L, 30L, 60L)

  /** X292 — session-gap sensitivity: the event stream sessionized at
    * inactivity gaps of [[GapSweepMin]] minutes, reported as session
    * count, mean events per session (×100) and mean session duration
    * (seconds) — how the one sessionization knob reshapes every
    * downstream funnel/retention/attribution number. Split rule is
    * q41's exact contract (split only on diff > gap).
    *
    * Scale: per arm ONE user-partitioned pass (lag + running session
    * counter per user — the q41 discipline), a per-session aggregate,
    * a 1-row reduce. */
  def q264_session_gap_sweep(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts_ms"))
    val arms = GapSweepMin.map { gapMin =>
      val gapMs = gapMin * 60000L
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"))
      val sess = ev
        .withColumn("prev", lag(col("ts_ms"), 1).over(w))
        .withColumn("new_s",
          (col("prev").isNull || col("ts_ms") - col("prev") > gapMs).cast("long"))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_ev"),
          (max("ts_ms") - min("ts_ms")).as("dur_ms"))
      sess.agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("n_events"),
          sum("dur_ms").as("sum_dur_ms"))
        .select(lit(gapMin).as("gap_min"), col("n_sessions"),
          expr("(100 * n_events) div n_sessions").as("events_per_session_x100"),
          expr("(sum_dur_ms div 1000) div n_sessions").as("mean_duration_s"))
    }
    arms.reduce(_.unionByName(_)).orderBy("gap_min")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q263_neardup_evidence" -> q263_neardup_evidence,
    "q264_session_gap_sweep" -> q264_session_gap_sweep
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{shingleCte, JaccardMaxDf, JaccardMinX10k}

  private def gapArmSql(gapMin: Long): String =
    s"""SELECT CAST($gapMin AS BIGINT) AS gap_min, n_sessions,
       |       (100 * n_events) // n_sessions AS events_per_session_x100,
       |       (sum_dur_ms // 1000) // n_sessions AS mean_duration_s FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       |         CAST(sum(n_ev) AS BIGINT) AS n_events,
       |         CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms FROM (
       |    SELECT user_id, sid, count(*) AS n_ev,
       |           max(ts_ms) - min(ts_ms) AS dur_ms FROM (
       |      SELECT user_id, ts_ms,
       |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |      FROM (
       |        SELECT user_id, ts_ms,
       |               CASE WHEN prev IS NULL OR ts_ms - prev > ${gapMin * 60000L}
       |                    THEN 1 ELSE 0 END AS new_s
       |        FROM (SELECT user_id, epoch_ms(ts) AS ts_ms,
       |                     lag(epoch_ms(ts)) OVER (PARTITION BY user_id
       |                       ORDER BY epoch_ms(ts)) AS prev
       |              FROM events))) GROUP BY user_id, sid))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q263_neardup_evidence" ->
      s"""WITH $shingleCte,
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $JaccardMaxDf) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |pj AS (SELECT i.id_a, i.id_b,
         |              CAST(floor(10000 * i.n_common
         |                / (sa.set_size + sb.set_size - i.n_common)) AS BIGINT)
         |                AS jaccard_x10k
         |       FROM inter i JOIN sizes sa ON sa.id = i.id_a
         |            JOIN sizes sb ON sb.id = i.id_b
         |       WHERE floor(10000 * i.n_common
         |             / (sa.set_size + sb.set_size - i.n_common)) >= $JaccardMinX10k),
         |top AS (SELECT * FROM pj
         |        ORDER BY jaccard_x10k DESC, id_a, id_b LIMIT $ExplainPairs),
         |dfq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY shingle),
         |ev AS (SELECT t.id_a, t.id_b, t.jaccard_x10k, a.shingle, dfq.df,
         |              row_number() OVER (PARTITION BY t.id_a, t.id_b
         |                ORDER BY dfq.df ASC, a.shingle ASC) AS evidence_rank
         |       FROM top t
         |       JOIN sh a ON a.id = t.id_a
         |       JOIN sh b ON b.id = t.id_b AND b.shingle = a.shingle
         |       JOIN dfq ON dfq.shingle = a.shingle)
         |SELECT id_a, id_b, jaccard_x10k,
         |       CAST(evidence_rank AS BIGINT) AS evidence_rank, shingle, df
         |FROM ev WHERE evidence_rank <= $ExplainShingles
         |ORDER BY id_a, id_b, evidence_rank""".stripMargin,
    "q264_session_gap_sweep" ->
      GapSweepMin.map(gapArmSql).mkString("", "\nUNION ALL\n", "\nORDER BY gap_min")
  )
}
