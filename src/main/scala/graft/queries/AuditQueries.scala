package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational

/** Round-7 wave-38 audit operators: revenue concentration
  * (Lorenz deciles + exact integer Gini — the inequality read of the
  * customer base), kNN hubness (the in-degree pathology audit every
  * ANN deployment needs), int8 quantization-error accounting (the
  * honesty check on q55's compression), and a two-round token-budget
  * waterfill allocator (per-source sampling plan with deficit
  * redistribution — what q56's capped weights hand-wave).
  *
  * Oracle conventions as the sibling modules: exact integers, floor
  * division where operands may be negative, identical aliases both
  * sides, ORDER BY a unique key.
  */
object AuditQueries {

  /** X272 — revenue concentration: customers ranked by total order
    * revenue (cents; customers without orders count as zero — the
    * honest inequality base), reported as Lorenz deciles (cumulative
    * revenue share ×10⁴) with the EXACT integer Gini coefficient
    * `(2·Σ rank·x − (n+1)·Σx)·10⁶ div (n·Σx)` — the concentration
    * read behind every "top decile drives the business" claim, and
    * the q205 cumulative-gains machinery pointed at money instead of
    * model scores.
    *
    * Scale: one fact aggregate to |customers| rows, one two-phase
    * global rank (never a single-task window), a 10-row decile
    * aggregate + 10-row cumulative window. */
  def q248_revenue_gini(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("rev_c")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(coalesce(sum("rev_c"), lit(0L)).as("rev_c"))
    val ranked = Relational.globalIndex(
      rev, Seq(col("rev_c").asc, col("c_custkey").asc), "rank")
    val tot = ranked.agg(count(lit(1)).as("n"), sum("rev_c").as("sum_rev"),
      sum(col("rank") * col("rev_c")).as("sum_rank_rev"))
    // the ×10⁶ numerator would overflow BIGINT (Σrank·x ~ n²·x̄/2), so
    // the quotient goes through the floor-double idiom — the same IEEE
    // operation sequence on both engines, deterministic cross-engine
    val gini = tot.select(col("n"), col("sum_rev"),
      expr("CASE WHEN n * sum_rev = 0 THEN 0L ELSE CAST(floor(1000000.0 " +
        "* (2 * sum_rank_rev - (n + 1) * sum_rev) / (n * sum_rev)) AS BIGINT) END")
        .as("gini_x1m"))
    val dec = ranked.crossJoin(broadcast(gini))
      .withColumn("decile", expr("((rank - 1) * 10) div n"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("rev_c").as("rev_c"),
        max("sum_rev").as("sum_rev"), max("gini_x1m").as("gini_x1m"))
    val w = Window.partitionBy(pmod(col("decile"), lit(1)))
      .orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.withColumn("cum_rev_c", sum("rev_c").over(w))
      .select(col("decile"), col("n_customers"), col("rev_c"), col("cum_rev_c"),
        expr("CASE WHEN sum_rev = 0 THEN 0L " +
          "ELSE (10000 * cum_rev_c) div sum_rev END").as("cum_share_x10k"),
        col("gini_x1m"))
      .orderBy("decile")
  }

  /** X273 — kNN hubness audit: the in-degree distribution of the q91
    * kNN graph, INCLUDING the never-retrieved zero-degree vectors —
    * high-hubness nodes appear in everyone's neighbor list (the known
    * high-dim ANN pathology that silently skews label propagation
    * q108, link prediction q178 and dedup rerank), and the
    * zero-degree mass is the "unreachable by similarity" share.
    *
    * Scale: one aggregate over the pinned graph's edges, a left join
    * from the id spine for zeros, an |in-degree domain|-row histogram. */
  def q249_knn_hubness(spark: SparkSession, dir: String): DataFrame = {
    val deg = OlapQueries.knnGraphPinned(spark, dir)
      .groupBy(col("neighbor_id").as("vec_id"))
      .agg(count(lit(1)).as("d"))
    val all = Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(deg, Seq("vec_id"), "left")
      .na.fill(0L, Seq("d"))
    val tot = all.agg(count(lit(1)).as("n_vectors"))
    all.groupBy(col("d").as("in_degree"))
      .agg(count(lit(1)).as("n_vectors"))
      .crossJoin(broadcast(tot.select(col("n_vectors").as("n_total"))))
      .select(col("in_degree"), col("n_vectors"),
        expr("(10000 * n_vectors) div n_total").as("share_x10k"))
      .orderBy("in_degree")
  }

  /** X274 — int8 quantization-error audit: per vector, the absolute
    * reconstruction error of q55's int8 scheme against the ×1k
    * integer reference (`err_i = |vq_i − floor(q_i·qscale/127)|`,
    * summed and maxed per vector) — the accounting that decides
    * whether 4× vector compression is free or is quietly moving
    * neighbors across rerank thresholds. Reconstruction uses floor
    * (q_i is signed), matching both engines bit-for-bit.
    *
    * Scale: pure per-row lambda arithmetic on the vector column (the
    * fused q55 expression + one zip_with), zero joins, zero shuffles
    * before the final sort. */
  def q250_quant_error(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    import graft.functions.VectorFunctions.quantize
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("vq"),
        call_function(graft.expressions.GraftFunctions.Int8QuantizeName,
          col("embedding")).as("f"))
      .select(col("vec_id"), col("f.qscale").as("qscale"),
        zip_with(col("vq"), col("f.q8"), (v, q) =>
          abs(v - floor(q * col("f.qscale") / lit(127.0)).cast("long")))
          .as("errs"))
      .select(col("vec_id"), col("qscale"),
        size(col("errs")).cast("long").as("n_dims"),
        coalesce(aggregate(col("errs"), lit(0L), (acc, x) => acc + x), lit(0L))
          .as("sum_abs_err"),
        coalesce(array_max(col("errs")), lit(0L)).as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** Waterfill token budget (docs). */
  val WaterfillBudget = 2000L

  /** X275 — two-round budget waterfill: an equal per-source target,
    * then one redistribution round pushing the undersupplied sources'
    * leftover into sources with headroom, proportionally to that
    * headroom (integer floor — the conservative allocator that never
    * overshoots the budget). This is the sampling PLAN q56's weights
    * and q113's curriculum assume someone already computed: how many
    * docs to actually take from each source when some sources cannot
    * fill their share.
    *
    * Scale: two |sources|-row aggregates with broadcast totals —
    * metadata-sized end to end. */
  def q251_budget_waterfill(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val nSrc = src.agg(count(lit(1)).as("n_sources"))
    val first = src.crossJoin(broadcast(nSrc))
      .withColumn("target_n", expr(s"$WaterfillBudget div n_sources"))
      .withColumn("first_n", least(col("n_docs"), col("target_n")))
      .withColumn("headroom", col("n_docs") - col("first_n"))
    val pool = first.agg(
      (lit(WaterfillBudget) - sum("first_n")).as("leftover"),
      sum("headroom").as("total_headroom"))
    first.crossJoin(broadcast(pool))
      .withColumn("extra_n",
        expr("CASE WHEN total_headroom = 0 THEN 0L " +
          "ELSE least(headroom, (leftover * headroom) div total_headroom) END"))
      .select(col("source"), col("n_docs"), col("target_n"), col("first_n"),
        col("extra_n"), (col("first_n") + col("extra_n")).as("final_n"))
      .orderBy("source")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_revenue_gini" -> q248_revenue_gini,
    "q249_knn_hubness" -> q249_knn_hubness,
    "q250_quant_error" -> q250_quant_error,
    "q251_budget_waterfill" -> q251_budget_waterfill
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q248_revenue_gini" ->
      s"""WITH rev AS (
         |  SELECT c.c_custkey,
         |         CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
         |           AS BIGINT) AS rev_c
         |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
         |  GROUP BY c.c_custkey),
         |rk AS (SELECT c_custkey, rev_c,
         |              CAST(row_number() OVER (ORDER BY rev_c, c_custkey) AS BIGINT)
         |                AS rank
         |       FROM rev),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(rev_c) AS BIGINT) AS sum_rev,
         |               CAST(sum(rank * rev_c) AS BIGINT) AS sum_rank_rev
         |        FROM rk),
         |g AS (SELECT n, sum_rev,
         |             CASE WHEN n * sum_rev = 0 THEN 0
         |                  ELSE CAST(floor(1000000.0
         |                       * (2 * sum_rank_rev - (n + 1) * sum_rev)
         |                       / (n * sum_rev)) AS BIGINT) END AS gini_x1m
         |      FROM tot),
         |dec AS (SELECT ((rk.rank - 1) * 10) // g.n AS decile,
         |               CAST(count(*) AS BIGINT) AS n_customers,
         |               CAST(sum(rk.rev_c) AS BIGINT) AS rev_c,
         |               CAST(max(g.sum_rev) AS BIGINT) AS sum_rev,
         |               CAST(max(g.gini_x1m) AS BIGINT) AS gini_x1m
         |        FROM rk, g GROUP BY decile)
         |SELECT CAST(decile AS BIGINT) AS decile, n_customers, rev_c,
         |       CAST(sum(rev_c) OVER (ORDER BY decile
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum_rev_c,
         |       CAST(CASE WHEN sum_rev = 0 THEN 0
         |            ELSE (10000 * sum(rev_c) OVER (ORDER BY decile
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // sum_rev
         |            END AS BIGINT) AS cum_share_x10k,
         |       gini_x1m
         |FROM dec ORDER BY decile""".stripMargin,
    "q249_knn_hubness" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id FROM r WHERE rank <= ${OlapQueries.KnnK}),
         |deg AS (SELECT neighbor_id AS vec_id, CAST(count(*) AS BIGINT) AS d
         |        FROM knn GROUP BY neighbor_id),
         |alln AS (SELECT e.vec_id, coalesce(deg.d, 0) AS d
         |         FROM embeddings e LEFT JOIN deg USING (vec_id)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM alln)
         |SELECT CAST(d AS BIGINT) AS in_degree,
         |       CAST(count(*) AS BIGINT) AS n_vectors,
         |       CAST((10000 * count(*)) // tot.n_total AS BIGINT) AS share_x10k
         |FROM alln, tot GROUP BY d, tot.n_total ORDER BY in_degree""".stripMargin,
    "q250_quant_error" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vq
         |  FROM embeddings),
         |s AS (
         |  SELECT vec_id, vq,
         |         CAST(list_max(list_transform(vq, x -> abs(x))) AS BIGINT) AS qscale
         |  FROM q),
         |e AS (
         |  SELECT vec_id, qscale,
         |         list_transform(generate_series(1, len(vq)), i ->
         |           abs(vq[i] - CAST(floor(
         |             (CASE WHEN qscale > 0 THEN CAST(floor(vq[i] * 127 / qscale) AS BIGINT)
         |                   ELSE 0 END) * qscale / 127) AS BIGINT))) AS errs
         |  FROM s)
         |SELECT vec_id, qscale, CAST(len(errs) AS BIGINT) AS n_dims,
         |       CAST(coalesce(list_sum(errs), 0) AS BIGINT) AS sum_abs_err,
         |       CAST(coalesce(list_max(errs), 0) AS BIGINT) AS max_abs_err
         |FROM e ORDER BY vec_id""".stripMargin,
    "q251_budget_waterfill" ->
      s"""WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |             FROM documents GROUP BY source),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM src),
         |f AS (SELECT src.source, src.n_docs,
         |             $WaterfillBudget // ns.n_sources AS target_n,
         |             least(src.n_docs, $WaterfillBudget // ns.n_sources) AS first_n,
         |             src.n_docs - least(src.n_docs, $WaterfillBudget // ns.n_sources)
         |               AS headroom
         |      FROM src, ns),
         |pool AS (SELECT $WaterfillBudget - CAST(sum(first_n) AS BIGINT) AS leftover,
         |                CAST(sum(headroom) AS BIGINT) AS total_headroom
         |         FROM f)
         |SELECT f.source, f.n_docs, CAST(f.target_n AS BIGINT) AS target_n,
         |       CAST(f.first_n AS BIGINT) AS first_n,
         |       CAST(CASE WHEN pool.total_headroom = 0 THEN 0
         |            ELSE least(f.headroom,
         |                       (pool.leftover * f.headroom) // pool.total_headroom)
         |            END AS BIGINT) AS extra_n,
         |       CAST(f.first_n + CASE WHEN pool.total_headroom = 0 THEN 0
         |            ELSE least(f.headroom,
         |                       (pool.leftover * f.headroom) // pool.total_headroom)
         |            END AS BIGINT) AS final_n
         |FROM f, pool ORDER BY f.source""".stripMargin
  )
}
