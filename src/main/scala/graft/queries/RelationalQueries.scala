package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** General OLAP queries over the TPC-H-shaped testdata tables — the
  * join/aggregate surface of an analytics engine (star joins with
  * broadcast dims, grouped pricing aggregates, skew-safe big joins).
  * All money math is integer (cents / basis points, `floor` division), so
  * every query is hash-exact against the DuckDB oracle.
  *
  * Scale shapes: q42 is one partial-aggregated shuffle over the fact
  * table; q43/q44 are star joins — fact table streams, dimension sides
  * broadcast (plan-pinned in PlanSpec); q45 exercises the explicit
  * salting lever for skewed join keys ([[graft.ops.Relational.saltedJoin]]).
  */
object RelationalQueries {

  /** lineitem with exact integer money projections:
    * cents for prices/quantities, basis points (1e-4) for rates;
    * disc_price_c = floor(ext_c·(10000−disc_bp)/10000),
    * charge_c = floor(disc_price_c·(10000+tax_bp)/10000). */
  private def lineitemCents(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("qty_c", expr("CAST(round(l_quantity * 100) AS BIGINT)"))
      .withColumn("ext_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .withColumn("disc_bp", expr("CAST(round(l_discount * 10000) AS BIGINT)"))
      .withColumn("tax_bp", expr("CAST(round(l_tax * 10000) AS BIGINT)"))
      .withColumn("disc_price_c",
        floor(col("ext_c") * (lit(10000L) - col("disc_bp")) / lit(10000L)).cast("long"))
      .withColumn("charge_c",
        floor(col("disc_price_c") * (lit(10000L) + col("tax_bp")) / lit(10000L)).cast("long"))

  private val liCentsSql =
    """SELECT l.*,
      |       CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |       CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_c,
      |       CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
      |       CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp,
      |       CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                  * (10000 - CAST(round(l_discount * 10000) AS BIGINT)) / 10000) AS BIGINT)
      |         AS disc_price_c
      |FROM lineitem l""".stripMargin

  /** Pricing summary (TPC-H Q1 shape): grouped integer aggregates over the
    * fact table — one shuffle, full partial aggregation. */
  val PricingCutoff = "2001-09-01 00:00:00"
  def q42_pricing_summary(spark: SparkSession, dir: String): DataFrame =
    lineitemCents(spark, dir)
      .filter(col("l_shipdate") <= lit(PricingCutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty_c").as("sum_qty_c"),
        sum("ext_c").as("sum_base_c"),
        sum("disc_price_c").as("sum_disc_c"),
        sum("charge_c").as("sum_charge_c"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty_c", floor(col("sum_qty_c") / col("n_rows")).cast("long"))
      .withColumn("avg_base_c", floor(col("sum_base_c") / col("n_rows")).cast("long"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top revenue orders (TPC-H Q3 shape): star join — customer segment
    * filter (broadcast dim) ⋈ orders ⋈ lineitem, grouped revenue, top 10.
    * The ranking is a bounded `orderBy.limit`, which Spark executes as
    * TakeOrderedAndProject — per-partition top-k, no global sort. */
  val Q43Segment = "BUILDING"
  val Q43Date = "1998-01-01 00:00:00"
  val Q43TopN = 10
  def q43_top_orders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === Q43Segment).select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(Q43Date).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        // parquet timestamps arrive as TIMESTAMP_NTZ; session TZ is UTC,
        // so the cast makes unix_millis == DuckDB's epoch_ms
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
    val li = lineitemCents(spark, dir)
      .filter(col("l_shipdate") > lit(Q43Date).cast("timestamp"))
      .select("l_orderkey", "disc_price_c")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate_ms", "o_orderpriority")
      .agg(sum("disc_price_c").as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("l_orderkey").asc)
      .limit(Q43TopN)
  }

  /** Regional supplier volume (TPC-H Q5 shape): six-way star join with
    * all dimension sides broadcast; revenue where the supplying and
    * ordering nation coincide. */
  val Q44Region = "ASIA"
  val Q44From = "1996-01-01 00:00:00"
  val Q44To = "1998-01-01 00:00:00"
  def q44_region_volume(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === Q44Region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(Q44From).cast("timestamp") &&
        col("o_orderdate") < lit(Q44To).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = lineitemCents(spark, dir).select("l_orderkey", "l_suppkey", "disc_price_c")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("disc_price_c").as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("n_name").asc)
  }

  /** X308 — bilateral volume matrix (TPC-H Q7 shape): discounted
    * revenue flowing supplier-nation → customer-nation per order year,
    * CROSS-nation flows only — the shape whose signature is joining the
    * SAME dimension twice under different roles (nation as shipper,
    * nation as buyer) plus an inequality between the two role keys.
    *
    * Scale: lineitem ⋈ orders shuffles on the order key once; every
    * dimension (customer, supplier, nation×2) broadcasts; the output is
    * |nations|²·|years|-bounded. */
  def q279_trade_matrix(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("yr"))
    val li = lineitemCents(spark, dir).select("l_orderkey", "l_suppkey", "disc_price_c")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .join(broadcast(nat.toDF("s_nationkey", "supp_nation")), "s_nationkey")
      .join(broadcast(nat.toDF("c_nationkey", "cust_nation")), "c_nationkey")
      .groupBy("supp_nation", "cust_nation", "yr")
      .agg(count(lit(1)).as("n_items"), sum("disc_price_c").as("revenue_c"))
      .orderBy("supp_nation", "cust_nation", "yr")
  }

  /** Skewed join through the explicit salting lever: events fact ⋈
    * customer on user_id with an 8-way salt, then segment rollup. The
    * salted plan is value-identical to the plain join (RelationalSpec
    * pins equality); at scale it splits each hot key across 8 tasks. */
  val SaltWays = 8
  def q45_skew_join_agg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsCents(spark, dir).select(col("user_id"), col("value_c"), col("event_id"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.ops.Relational.saltedJoin(ev, cust, "user_id", col("event_id"), SaltWays)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum("value_c").as("value_sum_c"))
      .orderBy("c_mktsegment")
  }

  /** Multi-dimensional rollup (GROUPING SETS machinery): pricing totals at
    * (returnflag, linestatus), per-returnflag subtotal, and grand total in
    * ONE pass — Spark expands the sets map-side, still partial-aggregated.
    * `grouping_id` disambiguates NULL-as-subtotal from NULL data. */
  def q47_rollup_pricing(spark: SparkSession, dir: String): DataFrame =
    lineitemCents(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum("disc_price_c").as("sum_disc_c"),
        count(lit(1)).as("n_rows"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)

  /** Exact median (per-group): both engines sort-and-interpolate exactly;
    * integer cents make the only possible fractions .0/.5, exact in a
    * double. Medians don't partial-aggregate — at 100 TB per-group sorts
    * are the cost, which the (few) groups here parallelize over; for
    * corpus-wide percentiles at scale, switch to a mergeable sketch. */
  def q48_median_value(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsCents(spark, dir)
      .groupBy("event_type")
      .agg(
        percentile(col("value_c"), lit(0.5)).as("median_value_c"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Fixed-width histogram of document lengths — the corpus length-
    * distribution report of a curation pipeline. Pure integer bucketing,
    * one partial-aggregated shuffle over ~n_buckets rows. */
  val HistBucket = 50L
  def q49_length_histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket_lo", (floor(col("n_chars") / lit(HistBucket)) * lit(HistBucket)).cast("long"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("bucket_lo")

  /** Promotion revenue share (TPC-H Q14 shape): fact ⋈ broadcast part dim
    * with a conditional aggregate; the ratio is integer-quantized. */
  val Q50From = "1997-01-01 00:00:00"
  val Q50To = "1998-01-01 00:00:00"
  def q50_promo_revenue(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitemCents(spark, dir)
      .filter(col("l_shipdate") >= lit(Q50From).cast("timestamp") &&
        col("l_shipdate") < lit(Q50To).cast("timestamp"))
      .select("l_partkey", "disc_price_c")
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("disc_price_c")).otherwise(lit(0L)))
          .as("promo_c"),
        sum(col("disc_price_c")).as("total_c"))
      .withColumn("promo_share_x10k",
        floor(lit(10000L) * col("promo_c") / col("total_c")).cast("long"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_pricing_summary" -> q42_pricing_summary,
    "q43_top_orders" -> q43_top_orders,
    "q44_region_volume" -> q44_region_volume,
    "q45_skew_join_agg" -> q45_skew_join_agg,
    "q47_rollup_pricing" -> q47_rollup_pricing,
    "q48_median_value" -> q48_median_value,
    "q49_length_histogram" -> q49_length_histogram,
    "q50_promo_revenue" -> q50_promo_revenue,
    "q279_trade_matrix" -> q279_trade_matrix
  )

  val oracles: Map[String, String] = Map(
    "q279_trade_matrix" ->
      s"""WITH li AS ($liCentsSql),
         |j AS (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |             CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         |             li.disc_price_c
         |      FROM li
         |      JOIN orders o ON li.l_orderkey = o.o_orderkey
         |      JOIN customer c ON o.o_custkey = c.c_custkey
         |      JOIN supplier s ON li.l_suppkey = s.s_suppkey
         |      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |      WHERE c.c_nationkey <> s.s_nationkey)
         |SELECT supp_nation, cust_nation, yr,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(sum(disc_price_c) AS BIGINT) AS revenue_c
         |FROM j GROUP BY supp_nation, cust_nation, yr
         |ORDER BY supp_nation, cust_nation, yr""".stripMargin,
    "q42_pricing_summary" ->
      s"""WITH li AS (
         |  SELECT *, CAST(floor(disc_price_c * (10000 + tax_bp) / 10000) AS BIGINT) AS charge_c
         |  FROM ($liCentsSql)),
         |g AS (
         |  SELECT l_returnflag, l_linestatus,
         |         CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
         |         CAST(sum(ext_c) AS BIGINT) AS sum_base_c,
         |         CAST(sum(disc_price_c) AS BIGINT) AS sum_disc_c,
         |         CAST(sum(charge_c) AS BIGINT) AS sum_charge_c,
         |         count(*) AS n_rows
         |  FROM li WHERE l_shipdate <= TIMESTAMP '$PricingCutoff'
         |  GROUP BY l_returnflag, l_linestatus)
         |SELECT *, CAST(floor(sum_qty_c / n_rows) AS BIGINT) AS avg_qty_c,
         |       CAST(floor(sum_base_c / n_rows) AS BIGINT) AS avg_base_c
         |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q43_top_orders" ->
      s"""WITH li AS ($liCentsSql)
         |SELECT l.l_orderkey, epoch_ms(o.o_orderdate) AS o_orderdate_ms, o.o_orderpriority,
         |       CAST(sum(l.disc_price_c) AS BIGINT) AS revenue_c
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN li l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = '$Q43Segment'
         |  AND o.o_orderdate < TIMESTAMP '$Q43Date'
         |  AND l.l_shipdate > TIMESTAMP '$Q43Date'
         |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
         |ORDER BY revenue_c DESC, l.l_orderkey ASC LIMIT $Q43TopN""".stripMargin,
    "q44_region_volume" ->
      s"""WITH li AS ($liCentsSql)
         |SELECT n.n_name, CAST(sum(l.disc_price_c) AS BIGINT) AS revenue_c
         |FROM region r
         |JOIN nation n ON n.n_regionkey = r.r_regionkey
         |JOIN supplier s ON s.s_nationkey = n.n_nationkey
         |JOIN li l ON l.l_suppkey = s.s_suppkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
         |WHERE r.r_name = '$Q44Region'
         |  AND o.o_orderdate >= TIMESTAMP '$Q44From'
         |  AND o.o_orderdate < TIMESTAMP '$Q44To'
         |GROUP BY n.n_name ORDER BY revenue_c DESC, n.n_name ASC""".stripMargin,
    "q45_skew_join_agg" ->
      """SELECT c.c_mktsegment, count(*) AS n_events,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_sum_c
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q47_rollup_pricing" ->
      s"""WITH li AS ($liCentsSql)
         |SELECT l_returnflag, l_linestatus,
         |       CAST(sum(disc_price_c) AS BIGINT) AS sum_disc_c,
         |       count(*) AS n_rows,
         |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
         |FROM li GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin,
    "q48_median_value" ->
      """SELECT event_type,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS median_value_c,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_length_histogram" ->
      s"""SELECT CAST(floor(n_chars / $HistBucket) * $HistBucket AS BIGINT) AS bucket_lo,
         |       count(*) AS n_docs,
         |       CAST(min(n_chars) AS BIGINT) AS min_chars,
         |       CAST(max(n_chars) AS BIGINT) AS max_chars
         |FROM documents GROUP BY bucket_lo ORDER BY bucket_lo""".stripMargin,
    "q50_promo_revenue" ->
      s"""WITH li AS ($liCentsSql)
         |SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN l.disc_price_c ELSE 0 END) AS BIGINT) AS promo_c,
         |       CAST(sum(l.disc_price_c) AS BIGINT) AS total_c,
         |       CAST(floor(10000 * sum(CASE WHEN p.p_type = 'PROMO' THEN l.disc_price_c ELSE 0 END)
         |                  / sum(l.disc_price_c)) AS BIGINT) AS promo_share_x10k
         |FROM li l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE l.l_shipdate >= TIMESTAMP '$Q50From' AND l.l_shipdate < TIMESTAMP '$Q50To'""".stripMargin
  )
}
