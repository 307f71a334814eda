package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Round-8 wave-53 post-hoc risk audits — three release-gate reports a
  * data platform runs before shipping a corpus or an index:
  *
  *  - k-anonymity / l-diversity (q299): how re-identifiable are rows
  *    under quasi-identifier grouping, and how diverse is the sensitive
  *    attribute within each group — the privacy-risk twin of q221's
  *    disparate-impact audit;
  *  - dominant principal direction (q300): two exact power-iteration
  *    rounds on the centered embedding covariance — the "all-but-the-top"
  *    anisotropy report (a dominant common direction degrades cosine
  *    retrieval; its coefficients say what to subtract);
  *  - time-decayed popularity (q301): half-life-weighted event volume
  *    via integer right-shifts (`c div 2^(age/half_life)`) — the
  *    freshness-weighted ranking a recency-biased sampler feeds on.
  *
  * Scale shapes: q299 is one grouped pass over the entity table
  * (|QI-cells| bounded); q300 is two corpus passes (Σ y(yᵀv) computed
  * as two chained |V|-row aggregates — the covariance matrix is NEVER
  * materialized); q301 is a day-grain aggregate + 1-row max broadcast.
  */
object RiskQueries {

  /** X328 — k-anonymity risk + l-diversity: quasi-identifiers
    * (nation, market segment), sensitive attribute = fixed-threshold
    * balance band. Buckets: k=1 unique rows (directly re-identifiable),
    * 2–4, 5–9, 10+. min_l = worst within-bucket sensitive diversity
    * (1 ⇒ homogeneity attack works even at k>1). */
  def q299_k_anonymity(spark: SparkSession, dir: String): DataFrame = {
    val sens = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nat"), col("c_mktsegment").as("seg"),
        when(col("c_acctbal") < 0.0, 0L)
          .when(col("c_acctbal") < 2500.0, 1L)
          .when(col("c_acctbal") < 5000.0, 2L).otherwise(3L).as("sv"))
    val g = sens.groupBy("nat", "seg")
      .agg(count(lit(1)).as("k"), countDistinct("sv").as("l"))
    val b = g.select(
      when(col("k") === 1L, 0L).when(col("k") < 5L, 1L)
        .when(col("k") < 10L, 2L).otherwise(3L).as("bucket"),
      col("k"), col("l"))
    val tot = b.agg(sum("k").as("n"))
    b.crossJoin(broadcast(tot))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_groups"), sum("k").as("n_rows"),
        expr("(10000 * sum(k)) div max(n)").as("share_x10k"),
        min("l").as("min_l"),
        expr("(100 * sum(l)) div count(*)").as("avg_l_x100"))
      .orderBy("bucket")
  }

  /** X329 — dominant principal direction by exact power iteration:
    * center the ×1000-quantized embeddings with integer floor means,
    * then two rounds of w ← Σᵢ yᵢ(yᵢᵀv) with v rescaled to max |1000|
    * by an IEEE-stable floor (the matrix-free covariance product: two
    * chained aggregates per round, no d×d matrix, no d² shuffle).
    * Sign convention follows the raw iteration from v⁰ = 1000·1. */
  def q300_principal_direction(spark: SparkSession, dir: String): DataFrame = {
    val y = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(quantize(col("embedding"))).as(Seq("d", "x")))
      .select(col("vec_id"), (col("d") + 1).cast("long").as("dim"), col("x"))
    val mu = y.groupBy("dim")
      .agg(floor(sum("x").cast("double") / count(lit(1))).cast("long").as("m"))
    val yc = y.join(broadcast(mu), "dim")
      .select(col("vec_id"), col("dim"), (col("x") - col("m")).as("y"))

    def iterate(v: DataFrame): DataFrame = {
      val proj = yc.join(broadcast(v), "dim")
        .groupBy("vec_id").agg(sum(col("y") * col("v")).as("s"))
      val w = yc.join(proj, "vec_id")
        .groupBy("dim").agg(sum(col("y") * col("s")).as("w"))
      val mw = w.agg(max(abs(col("w"))).as("mw"))
      w.crossJoin(broadcast(mw))
        .select(col("dim"),
          floor(lit(1000.0) * col("w") / col("mw")).cast("long").as("v"))
    }
    val v0 = mu.select(col("dim"), lit(1000L).as("v"))
    iterate(iterate(v0))
      .select(col("dim"), col("v").as("pc1_x1000"))
      .orderBy("dim")
  }

  /** X330 — time-decayed popularity: day-grain counts discounted by
    * integer right-shift per elapsed half-life
    * (`c div 2^((latest−day) div H)` — exact, no float decay), ranked.
    * Anchored to the data's own latest day, not wall-clock, so the
    * report is reproducible. */
  val HalfLifeDays = 7L
  def q301_decayed_popularity(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("c"))
    val mx = daily.agg(max("day").as("md"))
    daily.crossJoin(broadcast(mx))
      .groupBy("event_type")
      .agg(sum("c").as("raw"),
        sum(expr(s"c div shiftleft(CAST(1 AS BIGINT), CAST((md - day) div $HalfLifeDays AS INT))"))
          .as("decayed"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("decayed").desc, col("event_type").asc)).cast("long"))
      .orderBy("rnk")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q299_k_anonymity" -> q299_k_anonymity,
    "q300_principal_direction" -> q300_principal_direction,
    "q301_decayed_popularity" -> q301_decayed_popularity
  )

  val oracles: Map[String, String] = Map(
    "q299_k_anonymity" ->
      """WITH sens AS (
        |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |         CASE WHEN c_acctbal < 0 THEN 0 WHEN c_acctbal < 2500 THEN 1
        |              WHEN c_acctbal < 5000 THEN 2 ELSE 3 END AS sv
        |  FROM customer),
        |g AS (SELECT nat, seg, CAST(count(*) AS BIGINT) AS k,
        |             CAST(count(DISTINCT sv) AS BIGINT) AS l
        |      FROM sens GROUP BY nat, seg),
        |b AS (SELECT CASE WHEN k = 1 THEN 0 WHEN k < 5 THEN 1
        |                  WHEN k < 10 THEN 2 ELSE 3 END AS bucket, k, l
        |      FROM g),
        |tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM b)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_groups,
        |       CAST(sum(k) AS BIGINT) AS n_rows,
        |       CAST((10000 * sum(k)) // max(tot.n) AS BIGINT) AS share_x10k,
        |       CAST(min(l) AS BIGINT) AS min_l,
        |       CAST((100 * sum(l)) // count(*) AS BIGINT) AS avg_l_x100
        |FROM b, tot GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q300_principal_direction" ->
      s"""WITH vq AS (SELECT vec_id, ${DataPrepQueries.quantVec} AS qv FROM embeddings),
         |e AS (SELECT vec_id, CAST(unnest(generate_series(1, len(qv))) AS BIGINT) AS dim,
         |             unnest(qv) AS x
         |      FROM vq),
         |mu AS (SELECT dim, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS m
         |       FROM e GROUP BY dim),
         |y AS (SELECT e.vec_id, e.dim, e.x - mu.m AS y FROM e JOIN mu USING (dim)),
         |p1 AS (SELECT vec_id, CAST(sum(y * 1000) AS BIGINT) AS s FROM y GROUP BY vec_id),
         |w1 AS (SELECT y.dim, CAST(sum(y.y * p1.s) AS BIGINT) AS w
         |       FROM y JOIN p1 USING (vec_id) GROUP BY y.dim),
         |m1 AS (SELECT max(abs(w)) AS mw FROM w1),
         |v1 AS (SELECT dim, CAST(floor(1000.0 * w / mw) AS BIGINT) AS v FROM w1, m1),
         |p2 AS (SELECT y.vec_id, CAST(sum(y.y * v1.v) AS BIGINT) AS s
         |       FROM y JOIN v1 USING (dim) GROUP BY y.vec_id),
         |w2 AS (SELECT y.dim, CAST(sum(y.y * p2.s) AS BIGINT) AS w
         |       FROM y JOIN p2 USING (vec_id) GROUP BY y.dim),
         |m2 AS (SELECT max(abs(w)) AS mw FROM w2)
         |SELECT dim, CAST(floor(1000.0 * w / mw) AS BIGINT) AS pc1_x1000
         |FROM w2, m2 ORDER BY dim""".stripMargin,
    "q301_decayed_popularity" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY event_type, day),
         |mx AS (SELECT max(day) AS md FROM daily),
         |dec AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS raw,
         |               CAST(sum(c // (1 << CAST((mx.md - day) // $HalfLifeDays AS INTEGER)))
         |                 AS BIGINT) AS decayed
         |        FROM daily, mx GROUP BY event_type)
         |SELECT event_type, raw, decayed,
         |       CAST(row_number() OVER (ORDER BY decayed DESC, event_type) AS BIGINT) AS rnk
         |FROM dec ORDER BY rnk""".stripMargin
  )
}
