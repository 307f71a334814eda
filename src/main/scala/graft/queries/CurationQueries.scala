package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Relational}

/** Round-3c curation surface: exact n-gram eval contamination, boilerplate
  * n-gram share, containment near-dup pairs, cohort retention, and the
  * window-free bounded-heap top-k per group. Same oracle conventions as the
  * sibling modules: integer quantization, identical aliases both sides,
  * ORDER BY a unique key.
  */
object CurationQueries {

  import DataPrepQueries.{ShingleN, JaccardMaxDf}

  /** Eval slice for the exact-overlap screen — same deterministic slice as
    * q53's band screen, so the two contamination reports are comparable. */
  val EvalMod = 20L
  val BoilerplateMinDf = 3
  val ContainMinX10k = 8000L
  val TopOrdersK = 3

  /** X72 — exact n-gram contamination: for every training doc, the count
    * and share of its distinct word-3-grams that appear in ANY eval-set
    * doc — the exact-match complement of q53's MinHash band screen (band
    * collisions catch near-dups probabilistically; the n-gram report is
    * the auditable exact-overlap number a decontamination writeup cites).
    * Eval n-grams are DISTINCT + broadcast (benchmark-sized ≪ corpus);
    * the corpus is screened in one pass. */
  def q73_exact_contamination(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactNgramOverlap(
      Tables.documents(spark, dir)
        .withColumn("is_eval", pmod(col("doc_id"), lit(EvalMod)) === 0),
      evalCol = "is_eval", n = ShingleN)
      .orderBy("doc_id")

  /** X73 — boilerplate n-gram share: a 3-gram present in ≥ `BoilerplateMinDf`
    * distinct docs is boilerplate (headers/templates/license blurbs); each
    * doc reports the boilerplate fraction of its distinct 3-grams — the
    * C4/RefinedWeb-style repeated-content filter signal. One df shuffle on
    * the shingle + one equijoin back + one per-doc aggregate. */
  def q74_boilerplate_share(spark: SparkSession, dir: String): DataFrame =
    Dedup.boilerplateShare(Tables.documents(spark, dir),
      minDf = BoilerplateMinDf, n = ShingleN)
      .orderBy("doc_id")

  /** X74 — cohort retention matrix: customers cohorted by first-order
    * month; each (cohort, month-offset) cell counts the cohort's customers
    * active that month, with the retention share — the product-analytics
    * staple over the TPC-H orders fact. Months are exact integers
    * (`year·12 + month − 1`), so no date arithmetic crosses engines.
    * Shape: distinct (customer, month) activity → per-customer min (cohort)
    * — both shuffles on the customer key, co-partitioned — then a cell
    * aggregate; cohort sizes are a tiny broadcast side. */
  def q75_retention_cohorts(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("ym"))
      .distinct()
    val cohort = activity.groupBy("o_custkey").agg(min("ym").as("cohort_ym"))
    val cells = activity.join(cohort, "o_custkey")
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("month_offset"))
      // activity is DISTINCT (customer, month), so count(*) counts customers
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohort.groupBy("cohort_ym").agg(count(lit(1)).as("n_cohort"))
    cells.join(broadcast(sizes), "cohort_ym")
      .select(col("cohort_ym"), col("month_offset"), col("n_active"), col("n_cohort"),
        floor(lit(10000L) * col("n_active") / col("n_cohort")).cast("long")
          .as("retention_x10k"))
      .orderBy("cohort_ym", "month_offset")
  }

  /** X75 — containment near-dup pairs: `|A∩B| / min(|A|,|B|)` over the
    * df-capped inverted index — catches a short doc embedded in a long one
    * (containment ≈ 1) that symmetric Jaccard (÷ union) misses entirely.
    * Same sub-quadratic candidate generation as q16. */
  def q76_containment_pairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairsPinned(spark, dir,
      n = ShingleN, minContainX10k = ContainMinX10k, maxDf = JaccardMaxDf)
      .orderBy("id_a", "id_b")

  /** X76 — top-k per group WITHOUT a window: each customer's 3 largest
    * orders via the bounded-heap aggregate ([[Relational.topKPerGroup]]).
    * The `row_number` window form sorts every customer's full order set;
    * the heap forwards ≤ k rows per (customer, task) map-side — the same
    * VERDICT-r1 scale fix as ANN ranking, packaged as a general relational
    * operator. Tie-break (total DESC, orderkey ASC) matches the oracle's
    * window ORDER BY exactly. */
  def q77_top_orders_per_cust(spark: SparkSession, dir: String): DataFrame =
    Relational.topKPerGroup(
      Tables.orders(spark, dir)
        .select(col("o_custkey"),
          col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_c")),
      groupCols = Seq("o_custkey"), ordCol = "total_c", idCol = "o_orderkey",
      k = TopOrdersK)
      .select("o_custkey", "rank", "o_orderkey", "total_c")
      .orderBy("o_custkey", "rank")

  /** X78 — NATIVE as-of join (custom LogicalPlan + Strategy + SparkPlan,
    * [[graft.plans.AsOfJoinStrategy]]): q28's purchase←latest-click
    * attribution through the merge-walk physical operator instead of the
    * union+running-window encoding — one exchange per side, each side
    * sorted (key, ts) within partitions, a linear merge per partition, no
    * blended table and no window state. Tie semantics identical to q28
    * (same-ts click qualifies; highest click id wins), so the oracle is
    * the same window SQL. */
  def q78_asof_native(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_ms").as("asof_click_ts"),
        col("event_id").as("asof_click_id"))
    graft.plans.AsOfJoinStrategy.asofJoin(purchases, clicks,
      leftKey = "user_id", leftTs = "ts_ms",
      rightKey = "c_user", rightTs = "asof_click_ts", rightTie = "asof_click_id")
      .select("event_id", "user_id", "ts_ms", "asof_click_id", "asof_click_ts")
      .orderBy("event_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_asof_native" -> q78_asof_native,
    "q73_exact_contamination" -> q73_exact_contamination,
    "q74_boilerplate_share" -> q74_boilerplate_share,
    "q75_retention_cohorts" -> q75_retention_cohorts,
    "q76_containment_pairs" -> q76_containment_pairs,
    "q77_top_orders_per_cust" -> q77_top_orders_per_cust
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q78_asof_native" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |s AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, is_purchase, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_ms END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, is_purchase, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_ts
        |  FROM e)
        |SELECT event_id, user_id, ts_ms, asof_click_id, asof_click_ts
        |FROM s WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q73_exact_contamination" ->
      s"""WITH ${DataPrepQueries.shingleCte},
         |tagged AS (SELECT id, shingle, (id % $EvalMod = 0) AS ev FROM sh),
         |eg AS (SELECT DISTINCT shingle FROM tagged WHERE ev),
         |tr AS (SELECT id, shingle FROM tagged WHERE NOT ev),
         |tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_ngrams FROM tr GROUP BY id),
         |shd AS (SELECT tr.id, CAST(count(*) AS BIGINT) AS n_shared
         |        FROM tr JOIN eg USING (shingle) GROUP BY tr.id)
         |SELECT tot.id AS doc_id, tot.n_ngrams,
         |       CAST(coalesce(shd.n_shared, 0) AS BIGINT) AS n_shared,
         |       CAST(floor(10000 * coalesce(shd.n_shared, 0) / tot.n_ngrams) AS BIGINT)
         |         AS shared_x10k,
         |       CAST(coalesce(shd.n_shared, 0) > 0 AS INT) AS contaminated
         |FROM tot LEFT JOIN shd ON tot.id = shd.id
         |ORDER BY doc_id""".stripMargin,
    "q74_boilerplate_share" ->
      s"""WITH ${DataPrepQueries.shingleCte},
         |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
         |hot AS (SELECT shingle FROM df WHERE df >= $BoilerplateMinDf),
         |tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_ngrams FROM sh GROUP BY id),
         |b AS (SELECT sh.id, CAST(count(*) AS BIGINT) AS n_boilerplate
         |      FROM sh JOIN hot USING (shingle) GROUP BY sh.id)
         |SELECT tot.id AS doc_id, tot.n_ngrams,
         |       CAST(coalesce(b.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
         |       CAST(floor(10000 * coalesce(b.n_boilerplate, 0) / tot.n_ngrams) AS BIGINT)
         |         AS boilerplate_x10k
         |FROM tot LEFT JOIN b ON tot.id = b.id
         |ORDER BY doc_id""".stripMargin,
    "q75_retention_cohorts" ->
      """WITH a AS (
        |  SELECT DISTINCT o_custkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS ym
        |  FROM orders),
        |c AS (SELECT o_custkey, min(ym) AS cohort_ym FROM a GROUP BY o_custkey),
        |cell AS (
        |  SELECT c.cohort_ym, a.ym - c.cohort_ym AS month_offset,
        |         CAST(count(*) AS BIGINT) AS n_active
        |  FROM a JOIN c USING (o_custkey)
        |  GROUP BY c.cohort_ym, month_offset),
        |s AS (SELECT cohort_ym, CAST(count(*) AS BIGINT) AS n_cohort FROM c GROUP BY cohort_ym)
        |SELECT cell.cohort_ym, cell.month_offset, cell.n_active, s.n_cohort,
        |       CAST(floor(10000 * cell.n_active / s.n_cohort) AS BIGINT) AS retention_x10k
        |FROM cell JOIN s USING (cohort_ym)
        |ORDER BY cohort_ym, month_offset""".stripMargin,
    "q76_containment_pairs" ->
      s"""WITH ${DataPrepQueries.shingleCte},
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $JaccardMaxDf) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id)
         |SELECT i.id_a, i.id_b, i.n_common, sa.set_size AS size_a, sb.set_size AS size_b,
         |       CAST(floor(10000 * i.n_common / least(sa.set_size, sb.set_size)) AS BIGINT)
         |         AS containment_x10k
         |FROM inter i
         |JOIN sizes sa ON sa.id = i.id_a
         |JOIN sizes sb ON sb.id = i.id_b
         |WHERE floor(10000 * i.n_common / least(sa.set_size, sb.set_size)) >= $ContainMinX10k
         |ORDER BY id_a, id_b""".stripMargin,
    "q77_top_orders_per_cust" ->
      s"""WITH o AS (
         |  SELECT o_custkey, o_orderkey,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
         |  FROM orders),
         |r AS (
         |  SELECT o_custkey, o_orderkey, total_c,
         |         CAST(row_number() OVER
         |           (PARTITION BY o_custkey ORDER BY total_c DESC, o_orderkey) AS BIGINT)
         |           AS rank
         |  FROM o)
         |SELECT o_custkey, rank, o_orderkey, total_c
         |FROM r WHERE rank <= $TopOrdersK
         |ORDER BY o_custkey, rank""".stripMargin
  )
}
