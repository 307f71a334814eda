package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 wave-24 set-algebra / sequence-alignment operators: HLL
  * audience-overlap estimation (sketch set algebra — the pairwise
  * intersection a segmentation dashboard serves without ever joining
  * raw user sets) and LCS funnel conformance (how closely each user's
  * journey follows the canonical path — dynamic programming as an
  * in-plan fold).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object OverlapQueries {

  /** X216 — HLL audience-overlap matrix: for every event-type pair, the
    * distinct-user overlap |A∩B| — exactly (distinct (user, type) pass
    * + pair self-join, the ground truth) and by SKETCH SET ALGEBRA
    * (|A| + |B| − |A∪B| over mergeable per-type HLLs — inclusion-
    * exclusion, the only way sketches can intersect). The verdict pins
    * the estimate within 10% of the exact UNION (the scale the I-E
    * error is relative to — q61/q156/q180's error-contract pattern on a
    * second set operation). At corpus scale the |types| sketches are
    * the ONLY state the overlap dashboard needs: pairwise audience
    * questions never touch raw events again.
    *
    * Scale: one distinct (user, type) reduction; the exact pair join
    * shuffles user-keyed (types² bounded per user); sketch algebra is
    * |types|² KB-sized unions. */
  def q197_audience_overlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val exact = ut.toDF("user_id", "ta")
      .join(ut.toDF("user_id", "tb"), "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(countDistinct("user_id").cast("long").as("exact_inter"))
    val sizes = ut.groupBy(col("event_type"))
      .agg(countDistinct("user_id").cast("long").as("n"),
        expr("hll_sketch_agg(user_id)").as("sk"))
    val pairs = sizes.toDF("ta", "na", "ska")
      .crossJoin(sizes.toDF("tb", "nb", "skb"))
      .filter(col("ta") < col("tb"))
      .withColumn("est_union",
        expr("CAST(hll_sketch_estimate(hll_union(ska, skb)) AS BIGINT)"))
      .withColumn("est_inter",
        expr("CAST(hll_sketch_estimate(ska) AS BIGINT) " +
          "+ CAST(hll_sketch_estimate(skb) AS BIGINT) - est_union"))
    exact.join(pairs, Seq("ta", "tb"))
      .withColumn("exact_union", col("na") + col("nb") - col("exact_inter"))
      .withColumn("est_ok",
        (abs(col("est_inter") - col("exact_inter")) * 10 <= col("exact_union"))
          .cast("int"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        col("exact_inter"), col("exact_union"), col("est_ok"))
      .orderBy("type_a", "type_b")
  }

  /** Canonical funnel path for LCS conformance and the per-user
    * sequence cap (order-of-arrival prefix). */
  val CanonicalPath: Seq[String] = Seq("signup", "view", "click", "purchase")
  val LcsMaxSeq = 20

  /** X217 — LCS funnel conformance: per user, the longest common
    * subsequence between their first [[LcsMaxSeq]] events (event-time
    * order, event_id ties) and the canonical [[CanonicalPath]] — "how
    * much of the intended journey happened, in order, with anything in
    * between" (subsequence, not substring — the q39 MATCH_RECOGNIZE
    * funnel demands contiguous-ish stages; LCS scores partial
    * conformance). The classic DP row-update is order-dependent in BOTH
    * dimensions, so it runs as a NESTED in-plan fold: outer
    * `aggregate` over the user's token array, inner `aggregate` over
    * the 4 pattern positions threading the DP row (the q169/q174 fold
    * machinery, two deep); the oracle replays the identical recurrence
    * as a recursive CTE with a LIST-typed state column. Report: users
    * per LCS level.
    *
    * Scale: one sorted per-user collect (capped at [[LcsMaxSeq]]), the
    * fold is O(len·|path|) per user; the report is a ≤|path|+1-row
    * aggregate. */
  def q198_lcs_conformance(spark: SparkSession, dir: String): DataFrame = {
    val m = CanonicalPath.length
    val pat = array(CanonicalPath.map(lit): _*)
    val seqs = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(slice(transform(
        sort_array(collect_list(struct(col("ts_ms"), col("event_id"),
          col("event_type")))), x => x.getField("event_type")),
        1, LcsMaxSeq).as("toks"))
    val lcs = seqs
      .withColumn("pat", pat)
      .withColumn("row", expr(
        s"""aggregate(toks,
           |  array_repeat(CAST(0 AS BIGINT), ${m + 1}),
           |  (prev, tok) -> aggregate(sequence(1, $m),
           |    array(element_at(prev, 1)),
           |    (nw, j) -> concat(nw, array(
           |      CASE WHEN tok = element_at(pat, j)
           |           THEN element_at(prev, j) + 1
           |           ELSE greatest(element_at(prev, j + 1),
           |                         element_at(nw, j))
           |      END))))""".stripMargin))
      .select(col("user_id"), element_at(col("row"), m + 1).as("lcs_len"))
    lcs.groupBy("lcs_len")
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy("lcs_len")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_audience_overlap" -> q197_audience_overlap,
    "q198_lcs_conformance" -> q198_lcs_conformance
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q197_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut
        |       GROUP BY event_type),
        |ex AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |              CAST(count(*) AS BIGINT) AS exact_inter
        |       FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                          AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT ex.ta AS type_a, ex.tb AS type_b,
        |       sa.n AS n_a, sb.n AS n_b, ex.exact_inter,
        |       CAST(sa.n + sb.n - ex.exact_inter AS BIGINT) AS exact_union,
        |       CAST(1 AS INT) AS est_ok
        |FROM ex JOIN sz sa ON sa.event_type = ex.ta
        |        JOIN sz sb ON sb.event_type = ex.tb
        |ORDER BY type_a, type_b""".stripMargin,
    "q198_lcs_conformance" -> {
      val m = CanonicalPath.length
      // the DP row update unrolled per pattern position: d(j) references
      // d(j-1) inline (new[j] = tok==P[j] ? prev[j-1]+1 : max(prev[j], new[j-1]))
      def d(j: Int): String =
        if (j == 1) s"CASE WHEN toks[pos + 1] = '${CanonicalPath(0)}' THEN st[1] + 1 ELSE st[2] END"
        else s"CASE WHEN toks[pos + 1] = '${CanonicalPath(j - 1)}' THEN st[$j] + 1 ELSE greatest(st[${j + 1}], ${d(j - 1)}) END"
      val newRow = (1 to m).map(d).mkString("[CAST(0 AS BIGINT), ", ", ", "]")
      s"""WITH RECURSIVE seqs AS (
         |  SELECT user_id,
         |         (list(event_type ORDER BY epoch_ms(ts), event_id))[1:$LcsMaxSeq]
         |           AS toks
         |  FROM events GROUP BY user_id),
         |r AS (
         |  SELECT user_id, toks, 0 AS pos,
         |         CAST([${Seq.fill(m + 1)("0").mkString(", ")}] AS BIGINT[]) AS st
         |  FROM seqs
         |  UNION ALL
         |  SELECT user_id, toks, pos + 1, $newRow AS st
         |  FROM r WHERE pos < len(toks)),
         |fin AS (SELECT user_id, st[$m + 1] AS lcs_len FROM (
         |          SELECT user_id, st, pos,
         |                 row_number() OVER (PARTITION BY user_id
         |                   ORDER BY pos DESC) AS rn
         |          FROM r) WHERE rn = 1)
         |SELECT CAST(lcs_len AS BIGINT) AS lcs_len,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM fin GROUP BY lcs_len ORDER BY lcs_len""".stripMargin
    }
  )
}
