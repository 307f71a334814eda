package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-62 pre-flight decision reports:
  *
  *  - join-cardinality preflight (q319): the EXACT output row count of
  *    a candidate equi-join, computed WITHOUT running it —
  *    Σ_k cntA(k)·cntB(k) over the key-count tables. The "will this
  *    join explode" check a pipeline runs before an 8-hour job; the
  *    fanout ratio names many-to-many blowups (X155 audits one side's
  *    skew; this prices the product);
  *  - A/B experiment report (q320): deterministic hash-parity arm
  *    assignment, per-arm conversion, uplift ×10⁴, and the 2×2
  *    chi-squared statistic — the experimentation readout (X204 tests
  *    independence of observed categories; this builds the experiment
  *    end-to-end, assignment included).
  *
  * Scale shapes: q319 is one partial-aggregated key-count per side +
  * a key equijoin of the COUNT tables (|keys| rows, not |rows|); q320
  * is one user-grain aggregate + a 2-row rollup.
  */
object PreflightQueries {

  /** X350 — join-cardinality preflight for three candidate joins. For
    * each, exact |A ⋈ B| = Σ_k cntA·cntB and fanout ×100 vs the larger
    * input — computed on key-count tables only. */
  def q319_join_preflight(spark: SparkSession, dir: String): DataFrame = {
    def preflight(name: String, a: DataFrame, ak: String,
        b: DataFrame, bk: String): DataFrame = {
      val ca = a.groupBy(col(ak).as("k")).agg(count(lit(1)).as("ca"))
      val cb = b.groupBy(col(bk).as("k")).agg(count(lit(1)).as("cb"))
      val tot = ca.join(cb, "k")
        .agg(sum(col("ca") * col("cb")).as("join_rows"))
      val na = a.agg(count(lit(1)).as("n_a"))
      val nb = b.agg(count(lit(1)).as("n_b"))
      tot.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
        .select(lit(name).as("join_name"), col("n_a"), col("n_b"),
          coalesce(col("join_rows"), lit(0L)).as("join_rows"),
          expr("(100 * coalesce(join_rows, 0)) div greatest(n_a, n_b)")
            .as("fanout_x100"))
    }
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    preflight("events_customer", ev, "user_id", cust, "c_custkey")
      .unionByName(preflight("events_events_user", ev, "user_id", ev, "user_id"))
      .unionByName(preflight("lineitem_orders", li, "l_orderkey", ord, "o_orderkey"))
      .orderBy("join_name")
  }

  /** X351 — A/B experiment report: arm = md5-parity of the user id
    * (deterministic, balanced), conversion = at least
    * [[ConvMinPurchases]] purchase events (the per-user median, so
    * neither arm saturates). Uplift ×10⁴ on exact integer rates; the
    * 2×2 chi-squared ×1000 via the standard n(ad−bc)² / (row·col
    * margins) identity — exact-integer numerator, one IEEE-stable
    * floor, zero-margin guarded. */
  val ConvMinPurchases = 14L
  def q320_ab_experiment(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("long")).as("np"))
      .withColumn("conv", (col("np") >= ConvMinPurchases).cast("long"))
      .withColumn("arm",
        when(substring(md5(concat_ws(":", lit("ab8"), col("user_id"))), 1, 1) >= "8",
          lit("b")).otherwise(lit("a")))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
    val wide = arms.groupBy()
      .pivot("arm", Seq("a", "b"))
      .agg(first("n_users").as("users"), first("n_conv").as("conv"))
      .select(col("a_users").as("n_a"), col("a_conv").as("conv_a"),
        col("b_users").as("n_b"), col("b_conv").as("conv_b"))
    wide
      .withColumn("rate_a_x10k", expr("(10000 * conv_a) div n_a"))
      .withColumn("rate_b_x10k", expr("(10000 * conv_b) div n_b"))
      .withColumn("uplift_x10k", col("rate_b_x10k") - col("rate_a_x10k"))
      .withColumn("den",
        col("n_a") * col("n_b") * (col("conv_a") + col("conv_b"))
          * (col("n_a") + col("n_b") - col("conv_a") - col("conv_b")))
      .withColumn("chi2_x1000", when(col("den") === 0L, lit(0L))
        .otherwise(floor(lit(1000.0) *
        (col("n_a") + col("n_b"))
        * (col("conv_a") * (col("n_b") - col("conv_b"))
          - col("conv_b") * (col("n_a") - col("conv_a")))
        * (col("conv_a") * (col("n_b") - col("conv_b"))
          - col("conv_b") * (col("n_a") - col("conv_a")))
        / col("den")).cast("long")))
      .select("n_a", "conv_a", "n_b", "conv_b",
        "rate_a_x10k", "rate_b_x10k", "uplift_x10k", "chi2_x1000")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q319_join_preflight" -> q319_join_preflight,
    "q320_ab_experiment" -> q320_ab_experiment
  )

  val oracles: Map[String, String] = Map(
    "q319_join_preflight" -> {
      def arm(name: String, a: String, ak: String, b: String, bk: String) =
        s"""SELECT '$name' AS join_name,
           |       (SELECT count(*) FROM $a) AS n_a,
           |       (SELECT count(*) FROM $b) AS n_b,
           |       CAST(coalesce((
           |         SELECT sum(ca.c * cb.c) FROM
           |           (SELECT $ak AS k, count(*) AS c FROM $a GROUP BY $ak) ca
           |           JOIN (SELECT $bk AS k, count(*) AS c FROM $b GROUP BY $bk) cb
           |           USING (k)), 0) AS BIGINT) AS join_rows""".stripMargin
      val arms = Seq(
        arm("events_customer", "events", "user_id", "customer", "c_custkey"),
        arm("events_events_user", "events", "user_id", "events", "user_id"),
        arm("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"))
        .mkString("\nUNION ALL ")
      s"""SELECT join_name, n_a, n_b, join_rows,
         |       CAST((100 * join_rows) // greatest(n_a, n_b) AS BIGINT) AS fanout_x100
         |FROM ($arms) ORDER BY join_name""".stripMargin
    },
    "q320_ab_experiment" ->
      """WITH users AS (
        |  SELECT user_id,
        |         CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |                        >= 14 THEN 1 ELSE 0 END AS BIGINT) AS conv,
        |         CASE WHEN substr(md5(concat('ab8', ':', CAST(user_id AS VARCHAR))), 1, 1)
        |                   >= '8' THEN 'b' ELSE 'a' END AS arm
        |  FROM events GROUP BY user_id),
        |w AS (SELECT
        |  CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |  CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |FROM users)
        |SELECT n_a, conv_a, n_b, conv_b,
        |       CAST((10000 * conv_a) // n_a AS BIGINT) AS rate_a_x10k,
        |       CAST((10000 * conv_b) // n_b AS BIGINT) AS rate_b_x10k,
        |       CAST((10000 * conv_b) // n_b - (10000 * conv_a) // n_a AS BIGINT)
        |         AS uplift_x10k,
        |       CAST(CASE WHEN n_a * n_b * (conv_a + conv_b)
        |                      * (n_a + n_b - conv_a - conv_b) = 0 THEN 0
        |            ELSE floor(1000.0 * (n_a + n_b)
        |            * (conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a))
        |            * (conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a))
        |            / (n_a * n_b * (conv_a + conv_b)
        |               * (n_a + n_b - conv_a - conv_b))) END AS BIGINT) AS chi2_x1000
        |FROM w""".stripMargin
  )
}
