package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-56 corpus-forensics operators — provenance questions at
  * the SOURCE grain:
  *
  *  - stylometric distance (q306): Burrows-Delta-lite — per-source
  *    usage rates of the corpus-global head vocabulary, pairwise L1.
  *    Two sources with near-zero style distance are the same upstream
  *    crawl wearing different names (X303 compares WHICH words; this
  *    compares HOW MUCH the shared head words are used);
  *  - term adaptation (q307): Church-Gale burstiness — P(term recurs in
  *    a doc | it appears at all) as exact integer df₂/df₁. Topical
  *    terms adapt (recur); function words don't — the signal behind
  *    every burstiness-aware term weight;
  *  - deletion blast radius (q308): given a forget-set of users, the
  *    row counts every artifact must drop (events, orders, their
  *    lineitems, customer rows) — the GDPR erasure-scope report a
  *    platform runs BEFORE executing deletes.
  *
  * Scale shapes: q306/q307 are one token-explode pass each, then
  * head-vocabulary-bounded frames (M·|sources| and M rows); q308 is
  * per-artifact semi-join counts — the forget-set streams against each
  * fact once, orders→lineitem rides the existing orderkey equijoin.
  */
object StyleQueries {

  /** X337 — stylometric source distance. Head vocabulary = global
    * top-[[StyleTopM]] tokens (count desc, token asc); per-source rate
    * = ⌊10⁶·count/total⌋ with zero-fill for absent head terms; distance
    * = Σ|rate_a − rate_b| over the head, all source pairs. */
  val StyleTopM = 50
  def q306_stylometric_distance(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(wsTokens(col("text"))).as("t"))
    val top = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc).limit(StyleTopM)
      .select("t")
    val srcTot = tok.groupBy("source").agg(count(lit(1)).as("n"))
    val cnt = tok.join(broadcast(top), "t")
      .groupBy("source", "t").agg(count(lit(1)).as("cnt"))
    val rate = srcTot.crossJoin(broadcast(top))
      .join(cnt, Seq("source", "t"), "left")
      .select(col("source"), col("t"),
        expr("(1000000 * coalesce(cnt, 0)) div n").as("r"))
    rate.as("a")
      .join(rate.as("b"),
        col("a.t") === col("b.t") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(abs(col("a.r") - col("b.r"))).as("delta_l1"))
      .orderBy("source_a", "source_b")
  }

  /** X338 — term adaptation (Church-Gale burstiness) for the
    * top-[[AdaptTopM]] terms by total frequency: df₁ = docs containing
    * the term, df₂ = docs containing it at least twice,
    * adaptation ×10⁴ = ⌊10⁴·df₂/df₁⌋. */
  val AdaptTopM = 40
  def q307_term_adaptation(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    tc.groupBy("t")
      .agg(count(lit(1)).as("df1"),
        sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("df2"),
        sum("c").as("tf"))
      .orderBy(col("tf").desc, col("t").asc)
      .limit(AdaptTopM)
      .withColumn("adaptation_x10k", expr("(10000 * df2) div df1"))
      .select("t", "tf", "df1", "df2", "adaptation_x10k")
  }

  /** X339 — deletion blast radius: the per-artifact erasure scope of a
    * deterministic forget-set (users ≡ 3 mod 5). Each artifact row is
    * (rows to delete, artifact total, share ×10⁴); lineitem inherits
    * scope through its orders. The report is the dry-run a deletion
    * pipeline must show before destructive execution. */
  val ForgetMod = 5L
  val ForgetRem = 3L
  def q308_deletion_blast_radius(spark: SparkSession, dir: String): DataFrame = {
    val forget = Tables.events(spark, dir)
      .filter(pmod(col("user_id"), lit(ForgetMod)) === ForgetRem)
      .select(col("user_id").as("f_user")).distinct()

    def scoped(name: String, df: DataFrame, key: org.apache.spark.sql.Column,
        total: DataFrame): DataFrame = {
      val hit = df.join(broadcast(forget), key === col("f_user"), "left_semi")
        .agg(count(lit(1)).as("n_delete"))
      hit.crossJoin(total.agg(count(lit(1)).as("n_total")))
        .select(lit(name).as("artifact"), col("n_delete"), col("n_total"),
          expr("(10000 * n_delete) div n_total").as("share_x10k"))
    }
    val ev = Tables.events(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    val forgetOrders = ord
      .join(broadcast(forget), col("o_custkey") === col("f_user"), "left_semi")
      .select("o_orderkey")
    val liScoped = li.join(forgetOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n_delete"))
      .crossJoin(li.agg(count(lit(1)).as("n_total")))
      .select(lit("lineitem").as("artifact"), col("n_delete"), col("n_total"),
        expr("(10000 * n_delete) div n_total").as("share_x10k"))

    scoped("customer", cust, col("c_custkey"), cust)
      .unionByName(scoped("events", ev, col("user_id"), ev))
      .unionByName(liScoped)
      .unionByName(scoped("orders", ord, col("o_custkey"), ord))
      .orderBy("artifact")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q306_stylometric_distance" -> q306_stylometric_distance,
    "q307_term_adaptation" -> q307_term_adaptation,
    "q308_deletion_blast_radius" -> q308_deletion_blast_radius
  )

  import DataPrepQueries.toks

  val oracles: Map[String, String] = Map(
    "q306_stylometric_distance" ->
      s"""WITH tok AS (SELECT source, unnest($toks) AS t FROM documents),
         |top AS (SELECT t FROM (
         |          SELECT t, count(*) AS c FROM tok GROUP BY t
         |          ORDER BY c DESC, t ASC LIMIT $StyleTopM)),
         |src AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY source),
         |cnt AS (SELECT tok.source, tok.t, CAST(count(*) AS BIGINT) AS cnt
         |        FROM tok JOIN top ON top.t = tok.t
         |        GROUP BY tok.source, tok.t),
         |rate AS (SELECT s.source, top.t,
         |                CAST((1000000 * coalesce(cnt.cnt, 0)) // s.n AS BIGINT) AS r
         |         FROM src s CROSS JOIN top
         |         LEFT JOIN cnt ON cnt.source = s.source AND cnt.t = top.t)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(sum(abs(a.r - b.r)) AS BIGINT) AS delta_l1
         |FROM rate a JOIN rate b ON a.t = b.t AND a.source < b.source
         |GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,
    "q307_term_adaptation" ->
      s"""WITH tc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
         |            FROM (SELECT doc_id, unnest($toks) AS t FROM documents)
         |            GROUP BY doc_id, t),
         |df AS (SELECT t, count(*) AS df1,
         |              CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         |              CAST(sum(c) AS BIGINT) AS tf
         |       FROM tc GROUP BY t)
         |SELECT t, tf, df1, df2,
         |       CAST((10000 * df2) // df1 AS BIGINT) AS adaptation_x10k
         |FROM df ORDER BY tf DESC, t ASC LIMIT $AdaptTopM""".stripMargin,
    "q308_deletion_blast_radius" ->
      s"""WITH forget AS (SELECT DISTINCT user_id FROM events
         |                WHERE user_id % $ForgetMod = $ForgetRem),
         |fo AS (SELECT o_orderkey FROM orders o
         |       WHERE EXISTS (SELECT 1 FROM forget f WHERE f.user_id = o.o_custkey)),
         |rows AS (
         |  SELECT 'customer' AS artifact,
         |         (SELECT count(*) FROM customer c
         |          WHERE EXISTS (SELECT 1 FROM forget f WHERE f.user_id = c.c_custkey))
         |           AS n_delete,
         |         (SELECT count(*) FROM customer) AS n_total
         |  UNION ALL
         |  SELECT 'events',
         |         (SELECT count(*) FROM events e
         |          WHERE EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id)),
         |         (SELECT count(*) FROM events)
         |  UNION ALL
         |  SELECT 'lineitem',
         |         (SELECT count(*) FROM lineitem l
         |          WHERE EXISTS (SELECT 1 FROM fo WHERE fo.o_orderkey = l.l_orderkey)),
         |         (SELECT count(*) FROM lineitem)
         |  UNION ALL
         |  SELECT 'orders',
         |         (SELECT count(*) FROM orders o
         |          WHERE EXISTS (SELECT 1 FROM forget f WHERE f.user_id = o.o_custkey)),
         |         (SELECT count(*) FROM orders))
         |SELECT artifact, CAST(n_delete AS BIGINT) AS n_delete,
         |       CAST(n_total AS BIGINT) AS n_total,
         |       CAST((10000 * n_delete) // n_total AS BIGINT) AS share_x10k
         |FROM rows ORDER BY artifact""".stripMargin
  )
}
