package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-61 storage-codec advisors — the layout decisions a
  * 100 TB table format makes per column, computed from the data itself
  * (the column-store companion of X345's zone maps):
  *
  *  - dictionary-encoding advisor (q317): exact NDV → code width →
  *    modeled dictionary bytes vs raw bytes per column. Low-cardinality
  *    columns (flags, enums) compress ~8×; key columns don't — the
  *    report says which is which BEFORE a rewrite;
  *  - RLE / sortedness advisor (q318): run counts of each column under
  *    the table's physical (ts, id) order — computed scale-safely as
  *    within-zone runs (day-partitioned windows) minus cross-zone
  *    stitches (a |days|-row frame), NEVER a single global window over
  *    corpus rows. A column with few runs begs run-length encoding; a
  *    column with runs ≈ rows is order-hostile and wants the X88
  *    Z-order treatment.
  */
object CodecQueries {

  /** X348 — dictionary-encoding advisor. Code width =
    * `len(bin(ndv−1))` bits (exact, no float log); modeled sizes:
    * raw = Σ value bytes (strings: length; int64 keys: 8), dict =
    * Σ distinct-value bytes + n·⌈bits/8⌉. */
  def q317_dictionary_advisor(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def strCol(name: String): DataFrame = {
      // dictionary value-store size two-phase: distinct THEN sum(length)
      // — never a collected value list
      val dict = li.select(col(name)).distinct()
        .agg(sum(length(col(name)).cast("long")).as("dict_value_bytes"))
      li.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(name)).as("ndv"),
        sum(length(col(name)).cast("long")).as("raw_bytes"))
        .crossJoin(broadcast(dict))
        .select(lit(name).as("column_name"), col("n_rows"), col("ndv"),
          col("raw_bytes"), col("dict_value_bytes"))
    }
    def keyCol(name: String): DataFrame =
      li.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(name)).as("ndv"))
        .select(lit(name).as("column_name"), col("n_rows"), col("ndv"),
          (col("n_rows") * 8L).as("raw_bytes"), (col("ndv") * 8L).as("dict_value_bytes"))
    Seq(strCol("l_returnflag"), strCol("l_linestatus"),
        keyCol("l_orderkey"), keyCol("l_suppkey"))
      .reduce(_ unionByName _)
      .withColumn("code_bits", length(bin(col("ndv") - 1L)).cast("long"))
      .withColumn("dict_bytes",
        col("dict_value_bytes") + col("n_rows") * ((col("code_bits") + 7L) / 8L).cast("long"))
      .withColumn("ratio_x100", expr("(100 * dict_bytes) div raw_bytes"))
      .select("column_name", "n_rows", "ndv", "code_bits",
        "raw_bytes", "dict_bytes", "ratio_x100")
      .orderBy("column_name")
  }

  /** X349 — RLE / sortedness advisor under the (ts, id) physical order.
    * Scale-safe two-phase run count: within each day zone a
    * day-partitioned lag window counts value changes; consecutive-day
    * stitches (last of zone d == first of zone d+1) merge runs across
    * the boundary — the global window never exists. */
  def q318_rle_advisor(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts_ms"), col("event_id"),
        expr("ts_ms div 86400000").as("day"),
        col("event_type"), col("user_id").cast("string").as("user_id"))
    def runsFor(name: String): DataFrame = {
      val w = Window.partitionBy("day").orderBy("ts_ms", "event_id")
      val marked = ev.withColumn("prev", lag(col(name), 1).over(w))
      val perDay = marked.groupBy("day")
        .agg(count(lit(1)).as("n"),
          (sum((col("prev").isNull || col("prev") =!= col(name)).cast("long")))
            .as("runs_in_day"))
      val edge = Window.partitionBy("day").orderBy(col("ts_ms").asc, col("event_id").asc)
      val edgeD = Window.partitionBy("day").orderBy(col("ts_ms").desc, col("event_id").desc)
      val firsts = ev.withColumn("rn", row_number().over(edge)).filter(col("rn") === 1)
        .select(col("day"), col(name).as("first_v"))
      val lasts = ev.withColumn("rn", row_number().over(edgeD)).filter(col("rn") === 1)
        .select(col("day"), col(name).as("last_v"))
      // |days|-row frame: stitch zones whose boundary values match AND
      // whose days are consecutive
      val stitch = lasts.select((col("day") + 1L).as("day"), col("last_v"))
        .join(firsts, "day")
        .agg(sum((col("last_v") === col("first_v")).cast("long")).as("n_stitch"))
      perDay.agg(sum("n").as("n_rows"), sum("runs_in_day").as("zone_runs"))
        .crossJoin(stitch)
        .select(lit(name).as("column_name"), col("n_rows"),
          (col("zone_runs") - coalesce(col("n_stitch"), lit(0L))).as("n_runs"))
    }
    runsFor("event_type").unionByName(runsFor("user_id"))
      .withColumn("runs_per_100", expr("(100 * n_runs) div n_rows"))
      .orderBy("column_name")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q317_dictionary_advisor" -> q317_dictionary_advisor,
    "q318_rle_advisor" -> q318_rle_advisor
  )

  val oracles: Map[String, String] = Map(
    "q317_dictionary_advisor" -> {
      def strArm(name: String) =
        s"""SELECT '$name' AS column_name, count(*) AS n_rows,
           |       count(DISTINCT $name) AS ndv,
           |       CAST(sum(length($name)) AS BIGINT) AS raw_bytes,
           |       (SELECT CAST(sum(length(v)) AS BIGINT) FROM
           |          (SELECT DISTINCT $name AS v FROM lineitem)) AS dict_value_bytes
           |FROM lineitem""".stripMargin
      def keyArm(name: String) =
        s"""SELECT '$name', count(*), count(DISTINCT $name),
           |       CAST(count(*) * 8 AS BIGINT),
           |       CAST(count(DISTINCT $name) * 8 AS BIGINT)
           |FROM lineitem""".stripMargin
      val arms = Seq(strArm("l_returnflag"), strArm("l_linestatus"),
        keyArm("l_orderkey"), keyArm("l_suppkey")).mkString("\nUNION ALL ")
      s"""WITH base AS ($arms)
         |SELECT column_name, n_rows, ndv,
         |       CAST(length(bin(ndv - 1)) AS BIGINT) AS code_bits,
         |       raw_bytes,
         |       CAST(dict_value_bytes
         |            + n_rows * ((length(bin(ndv - 1)) + 7) // 8) AS BIGINT) AS dict_bytes,
         |       CAST((100 * (dict_value_bytes
         |            + n_rows * ((length(bin(ndv - 1)) + 7) // 8))) // raw_bytes AS BIGINT)
         |         AS ratio_x100
         |FROM base ORDER BY column_name""".stripMargin
    },
    "q318_rle_advisor" -> {
      def arm(name: String, proj: String) =
        s"""SELECT '$name' AS column_name, n_rows, n_runs FROM (
           |  WITH ev AS (SELECT CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_id,
           |                     CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
           |                     $proj AS v
           |              FROM events),
           |  mk AS (SELECT *, lag(v) OVER (PARTITION BY day ORDER BY ts_ms, event_id)
           |                   AS prev FROM ev),
           |  pd AS (SELECT day, count(*) AS n,
           |                CAST(sum(CASE WHEN prev IS NULL OR prev <> v
           |                              THEN 1 ELSE 0 END) AS BIGINT) AS runs_in_day
           |         FROM mk GROUP BY day),
           |  fst AS (SELECT day, v AS first_v FROM (
           |            SELECT *, row_number() OVER (PARTITION BY day
           |                     ORDER BY ts_ms, event_id) AS rn FROM ev) WHERE rn = 1),
           |  lst AS (SELECT day, v AS last_v FROM (
           |            SELECT *, row_number() OVER (PARTITION BY day
           |                     ORDER BY ts_ms DESC, event_id DESC) AS rn FROM ev) WHERE rn = 1),
           |  st AS (SELECT CAST(sum(CASE WHEN l.last_v = f.first_v THEN 1 ELSE 0 END)
           |                  AS BIGINT) AS n_stitch
           |         FROM lst l JOIN fst f ON f.day = l.day + 1)
           |  SELECT CAST(sum(pd.n) AS BIGINT) AS n_rows,
           |         CAST(sum(pd.runs_in_day) - coalesce(max(st.n_stitch), 0) AS BIGINT)
           |           AS n_runs
           |  FROM pd, st)""".stripMargin
      val arms = Seq(arm("event_type", "event_type"),
        arm("user_id", "CAST(user_id AS VARCHAR)")).mkString("\nUNION ALL ")
      s"""SELECT column_name, n_rows, n_runs,
         |       CAST((100 * n_runs) // n_rows AS BIGINT) AS runs_per_100
         |FROM ($arms) ORDER BY column_name""".stripMargin
    }
  )
}
