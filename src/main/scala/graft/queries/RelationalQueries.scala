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

  /** X310 — late-shipment priority report (TPC-H Q4 shape): orders in a
    * window having at least one line shipped more than `LateDays` after
    * the order date, counted per priority. The signature is the
    * fact-to-fact LEFT SEMI join with a cross-side predicate: Spark keeps
    * it one orderkey shuffle and the semi form never materializes the
    * (order × matching-lines) blowup — at 100 TB the semi-join is the
    * difference between |orders| and |lineitem| intermediate rows.
    * (Testdata has no commit/receipt dates; lateness is ship − order.) */
  val Q281From = "1996-01-01 00:00:00"
  val Q281To = "1997-01-01 00:00:00"
  val LateDays = 60
  def q281_late_priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(Q281From).cast("timestamp") &&
        col("o_orderdate") < lit(Q281To).cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr(s"INTERVAL $LateDays DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** X311 — small-quantity order revenue (TPC-H Q17 shape): lines of one
    * brand whose quantity is below 1/5 of that part's mean line quantity.
    * The signature is the fact self-aggregation JOIN-BACK: aggregate the
    * fact per part, rejoin to the same (pre-filtered) fact rows. Exact
    * integer form of `qty < avg/5`: `5·qty_c·n < sum_qty_c` — no float
    * average anywhere. Scale: the broadcast brand filter prunes the fact
    * before both the aggregate and the join-back, and both shuffles hash
    * the same `l_partkey` key (the second reuses the first's exchange
    * under AQE). */
  val Q282Brand = "Brand#23"
  def q282_small_qty_revenue(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === Q282Brand).select("p_partkey")
    val li = lineitemCents(spark, dir).select("l_partkey", "qty_c", "ext_c")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "qty_c", "ext_c")
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty_c").as("sum_qty_c"), count(lit(1)).as("n_lines"))
      .withColumnRenamed("l_partkey", "agg_partkey")
    li.join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(lit(5L) * col("qty_c") * col("n_lines") < col("sum_qty_c"))
      .agg(count(lit(1)).as("n_small_lines"), sum("ext_c").as("small_rev_c"))
  }

  /** X312 — waiting-supplier attribution (TPC-H Q21 shape): suppliers who
    * were the SOLE late shipper on finished multi-supplier orders. TPC-H
    * phrases this as EXISTS + NOT EXISTS self-joins on lineitem; the
    * Spark-first form collapses all three correlated scans into ONE
    * per-(order, supplier) aggregate and one per-order aggregate — the
    * fact is read once and shuffled once on the order key. `the_supp` is
    * well-defined exactly when n_late = 1, which the filter guarantees.
    * (Lateness = shipped > `Q283LateDays` after order date.) */
  val Q283LateDays = 90
  val Q283TopN = 10
  def q283_waiting_supplier(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        when(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $Q283LateDays DAY"),
          lit(1L)).otherwise(lit(0L)))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("late").as("supp_late"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("supp_late").as("n_late"),
        max(when(col("supp_late") === 1L, col("l_suppkey"))).as("the_supp"))
      .filter(col("n_supp") >= 2L && col("n_late") === 1L)
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    perOrder.groupBy("the_supp")
      .agg(count(lit(1)).as("n_wait"))
      .join(broadcast(supp), col("the_supp") === col("s_suppkey"))
      .select("s_name", "n_wait")
      .orderBy(col("n_wait").desc, col("s_name").asc)
      .limit(Q283TopN)
  }

  /** X313 — idle high-balance customers (TPC-H Q22 shape): positive-
    * balance customers above the GLOBAL mean balance with no recent
    * orders, rolled up by nation. The signature is the broadcast global
    * scalar (one-row aggregate cross-joined in) feeding a LEFT ANTI join
    * against the filtered fact. Exact integer form of `bal > avg`:
    * `bal_c·n > sum_c`. Scale: the scalar is one row; the anti-join
    * shuffles only customers vs the date-pruned order keys. */
  val Q284Recent = "2000-07-01 00:00:00"
  def q284_idle_rich_customers(spark: SparkSession, dir: String): DataFrame = {
    val pos = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
    val g = pos.agg(sum("bal_c").as("tot_bal"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(Q284Recent).cast("timestamp"))
      .select("o_custkey")
    pos.crossJoin(broadcast(g))
      .filter(col("bal_c") * col("n_pos") > col("tot_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_cust"), sum("bal_c").as("tot_bal_c"))
      .orderBy("nationkey")
  }

  /** X314 — disjunctive bracket join (TPC-H Q19 shape): revenue from
    * three OR'd (brand, size-range, quantity-range) brackets. The
    * signature is the disjunction of conjunctions layered on an equi-join:
    * Catalyst must keep the `p_partkey` equality as the (broadcast) join
    * key and evaluate the OR as a post-join filter — a naive engine
    * degrades to a cross product. Quantities are integral in the data, so
    * the double BETWEENs are exact on both engines. */
  def q285_bracket_join(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val li = lineitemCents(spark, dir).select("l_partkey", "l_quantity", "ext_c")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 35)))
      .agg(count(lit(1)).as("n_lines"), sum("ext_c").as("bracket_rev_c"))
  }

  /** X315 — part revenue concentration (TPC-H Q11 shape): parts whose
    * revenue exceeds 1.25× the mean per-part revenue, with their global
    * share. The signature is the aggregate-then-HAVING-vs-global-scalar:
    * one fact aggregate, a one-row total broadcast back, an exact
    * integer threshold (`rev·n_parts·4 > 5·total`). Scale: the fact
    * shuffles once on the part key; the scalar comparison is map-side. */
  def q286_part_concentration(spark: SparkSession, dir: String): DataFrame = {
    val perPart = lineitemCents(spark, dir)
      .groupBy("l_partkey").agg(sum("ext_c").as("rev_c"))
    val g = perPart.agg(sum("rev_c").as("tot_c"), count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(g))
      .filter(col("rev_c") * col("n_parts") * lit(4L) > lit(5L) * col("tot_c"))
      .withColumn("share_x10k", floor(lit(10000L) * col("rev_c") / col("tot_c")).cast("long"))
      .select("l_partkey", "rev_c", "share_x10k")
      .orderBy(col("rev_c").desc, col("l_partkey").asc)
  }

  /** X333 — discount-band revenue probe (TPC-H Q6 shape): the canonical
    * pushdown benchmark — three conjunctive scan predicates and a pure
    * scalar aggregate, NO join, NO group: the whole query is one
    * map-side pass whose selectivity lives in `PushedFilters`. Revenue
    * term floor(ext_c·disc_bp/10⁴) is per-row integer. */
  val Q302From = "1997-01-01 00:00:00"
  val Q302To = "1998-01-01 00:00:00"
  def q302_discount_band(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(Q302From).cast("timestamp") &&
        col("l_shipdate") < lit(Q302To).cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24.0)
      .select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ext_c"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("disc_bp"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("(ext_c * disc_bp) div 10000")).as("discount_rev_c"))

  /** X334 — returned-item top customers (TPC-H Q10 shape): revenue of
    * RETURNED lines in a half-year window attributed to customers,
    * top-[[Q303TopN]] — the churn-candidate report. Star shape: the
    * filtered fact streams once; customer and nation broadcast; the
    * ranking is TakeOrdered (per-partition top-k), never a global sort. */
  val Q303From = "1997-01-01 00:00:00"
  val Q303To = "1997-07-01 00:00:00"
  val Q303TopN = 20
  def q303_returned_customers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(Q303From).cast("timestamp") &&
        col("o_orderdate") < lit(Q303To).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = lineitemCents(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "disc_price_c")
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum("disc_price_c").as("lost_rev_c"), count(lit(1)).as("n_lines"))
      .orderBy(col("lost_rev_c").desc, col("c_custkey").asc)
      .limit(Q303TopN)
  }

  /** X335 — late-shipment priority split (TPC-H Q12 shape): for lines
    * shipped more than [[LateDays]] past the order date, the
    * high-vs-low order-priority conditional counts per return flag —
    * the two-conditional-aggregates-per-group signature (one fact join,
    * the CASE pair folds map-side). */
  def q304_late_priority_split(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate", "l_returnflag")
    li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $LateDays DAY"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** X336 — dominant-share suppliers (TPC-H Q20 shape, adapted to the
    * schema): suppliers shipping more than 1/5 of some part's total
    * quantity — the nested aggregate-derived semi-join signature
    * (per-(supplier, part) aggregate compared against the per-part
    * rollup OF THAT SAME aggregate, then collapsed to the supplier
    * grain). Exact integer share test `5·sq > tq`; the second rollup
    * reuses the first's partkey exchange. */
  def q305_dominant_suppliers(spark: SparkSession, dir: String): DataFrame = {
    val sp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("qty_c").as("sq"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    // part total as a part-keyed WINDOW over the (supp, part) aggregate
    // (round 12): the former agg + self-join consumed sp twice — AQE
    // re-executed the lineitem aggregate once per consuming stage — and
    // paid a second exchange for the join. The window partition is
    // suppliers-per-part-bounded (never corpus-wide); same integers.
    sp.withColumn("tq", sum("sq").over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
      .filter(lit(5L) * col("sq") > col("tq"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_dominant_parts"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "n_dominant_parts")
      .orderBy("s_name")
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
    "q279_trade_matrix" -> q279_trade_matrix,
    "q281_late_priority" -> q281_late_priority,
    "q282_small_qty_revenue" -> q282_small_qty_revenue,
    "q283_waiting_supplier" -> q283_waiting_supplier,
    "q284_idle_rich_customers" -> q284_idle_rich_customers,
    "q285_bracket_join" -> q285_bracket_join,
    "q286_part_concentration" -> q286_part_concentration,
    "q302_discount_band" -> q302_discount_band,
    "q303_returned_customers" -> q303_returned_customers,
    "q304_late_priority_split" -> q304_late_priority_split,
    "q305_dominant_suppliers" -> q305_dominant_suppliers
  )

  val oracles: Map[String, String] = Map(
    "q302_discount_band" ->
      s"""SELECT count(*) AS n_lines,
         |       CAST(sum((CAST(round(l_extendedprice * 100) AS BIGINT)
         |                 * CAST(round(l_discount * 10000) AS BIGINT)) // 10000)
         |         AS BIGINT) AS discount_rev_c
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '$Q302From'
         |  AND l_shipdate < TIMESTAMP '$Q302To'
         |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q303_returned_customers" ->
      s"""WITH li AS ($liCentsSql)
         |SELECT c.c_custkey, c.c_name, n.n_name,
         |       CAST(sum(l.disc_price_c) AS BIGINT) AS lost_rev_c,
         |       count(*) AS n_lines
         |FROM li l
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n ON n.n_nationkey = c.c_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '$Q303From'
         |  AND o.o_orderdate < TIMESTAMP '$Q303To'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY lost_rev_c DESC, c.c_custkey ASC LIMIT $Q303TopN""".stripMargin,
    "q304_late_priority_split" ->
      s"""SELECT l.l_returnflag,
         |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         |WHERE l.l_shipdate > o.o_orderdate + INTERVAL $LateDays DAY
         |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "q305_dominant_suppliers" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem GROUP BY l_suppkey, l_partkey),
        |pt AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq FROM sp GROUP BY l_partkey)
        |SELECT s.s_name, count(*) AS n_dominant_parts
        |FROM sp JOIN pt USING (l_partkey)
        |JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        |WHERE 5 * sp.sq > pt.tq
        |GROUP BY s.s_name ORDER BY s.s_name""".stripMargin,
    "q281_late_priority" ->
      s"""SELECT o.o_orderpriority, count(*) AS n_orders
         |FROM orders o
         |WHERE o.o_orderdate >= TIMESTAMP '$Q281From'
         |  AND o.o_orderdate < TIMESTAMP '$Q281To'
         |  AND EXISTS (SELECT 1 FROM lineitem l
         |              WHERE l.l_orderkey = o.o_orderkey
         |                AND l.l_shipdate > o.o_orderdate + INTERVAL $LateDays DAY)
         |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q282_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l.l_partkey,
         |         CAST(round(l.l_quantity * 100) AS BIGINT) AS qty_c,
         |         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS ext_c
         |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE p.p_brand = '$Q282Brand'),
         |pa AS (SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
         |              count(*) AS n_lines
         |       FROM li GROUP BY l_partkey)
         |SELECT count(*) AS n_small_lines,
         |       CAST(sum(li.ext_c) AS BIGINT) AS small_rev_c
         |FROM li JOIN pa USING (l_partkey)
         |WHERE 5 * li.qty_c * pa.n_lines < pa.sum_qty_c""".stripMargin,
    "q283_waiting_supplier" ->
      s"""WITH ps AS (
         |  SELECT l.l_orderkey, l.l_suppkey,
         |         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL $Q283LateDays DAY
         |                  THEN 1 ELSE 0 END) AS supp_late
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE o.o_orderstatus = 'F'
         |  GROUP BY l.l_orderkey, l.l_suppkey),
         |og AS (
         |  SELECT l_orderkey, count(*) AS n_supp, sum(supp_late) AS n_late,
         |         max(CASE WHEN supp_late = 1 THEN l_suppkey END) AS the_supp
         |  FROM ps GROUP BY l_orderkey)
         |SELECT s.s_name, count(*) AS n_wait
         |FROM og JOIN supplier s ON s.s_suppkey = og.the_supp
         |WHERE og.n_supp >= 2 AND og.n_late = 1
         |GROUP BY s.s_name
         |ORDER BY n_wait DESC, s.s_name ASC LIMIT $Q283TopN""".stripMargin,
    "q284_idle_rich_customers" ->
      s"""WITH pos AS (
         |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
         |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
         |  FROM customer WHERE c_acctbal > 0),
         |g AS (SELECT CAST(sum(bal_c) AS BIGINT) AS tot_bal, count(*) AS n_pos FROM pos)
         |SELECT pos.nationkey, count(*) AS n_cust,
         |       CAST(sum(pos.bal_c) AS BIGINT) AS tot_bal_c
         |FROM pos, g
         |WHERE pos.bal_c * g.n_pos > g.tot_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = pos.c_custkey
         |                    AND o.o_orderdate >= TIMESTAMP '$Q284Recent')
         |GROUP BY pos.nationkey ORDER BY pos.nationkey""".stripMargin,
    "q285_bracket_join" ->
      """SELECT count(*) AS n_lines,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS bracket_rev_c
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
        |       AND l.l_quantity BETWEEN 20 AND 35)""".stripMargin,
    "q286_part_concentration" ->
      """WITH pa AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY l_partkey),
        |g AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c, count(*) AS n_parts FROM pa)
        |SELECT pa.l_partkey, pa.rev_c,
        |       CAST(floor(10000 * pa.rev_c / g.tot_c) AS BIGINT) AS share_x10k
        |FROM pa, g
        |WHERE pa.rev_c * g.n_parts * 4 > 5 * g.tot_c
        |ORDER BY pa.rev_c DESC, pa.l_partkey ASC""".stripMargin,
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
