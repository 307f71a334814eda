package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-93 — the engine-configuration advisors (joins X344
  * stats / X348–X349+X390 codec / X350+X370 preflight as the fourth
  * infra family):
  *
  *  - broadcast-threshold advisor (q384): per dimension table, modeled
  *    in-memory bytes (frozen per-type widths + exact string masses)
  *    against the 10 MiB autoBroadcastJoinThreshold — the "which dims
  *    broadcast" decision read off the data instead of guessed. The
  *    widths are a MODEL (documented literals), the string masses are
  *    exact; both engines agree bit-for-bit;
  *  - shuffle-sizing advisor (q385): for each fact-table join key,
  *    modeled shuffle bytes → recommended partition count at the
  *    64 MiB target, next to the hottest key's share ×10⁶ — partition
  *    COUNT and partition SKEW are different failures (q148 prescribes
  *    salting for the second; this sizes the first).
  */
object SizingQueries {

  /** Modeled per-type widths (bytes): fixed-width columns by type;
    * strings cost 4 + length. */
  val BroadcastThresholdBytes = 10485760L
  val TargetPartitionBytes = 67108864L

  /** X418 — broadcast advisor over the five dimension tables. */
  def q384_broadcast_advisor(spark: SparkSession, dir: String): DataFrame = {
    def arm(name: String, df: DataFrame, fixed: Long,
        strCols: Seq[String]): DataFrame = {
      val strMass = strCols.map(c => sum(coalesce(length(col(c)).cast("long"),
        lit(0L)) + 4L)).reduceOption(_ + _).getOrElse(lit(0L))
      df.agg(count(lit(1)).as("n_rows"), strMass.as("str_bytes"))
        .select(lit(name).as("table_name"), col("n_rows"),
          (col("n_rows") * fixed + col("str_bytes")).as("est_bytes"))
    }
    // fixed widths: bigint/double/ts = 8, int = 4 (see schema)
    Seq(
      arm("region", Tables.region(spark, dir), 8L, Seq("r_name")),
      arm("nation", Tables.nation(spark, dir), 12L, Seq("n_name")),
      arm("customer", Tables.customer(spark, dir), 20L,
        Seq("c_name", "c_mktsegment")),
      arm("supplier", Tables.supplier(spark, dir), 20L, Seq("s_name")),
      arm("part", Tables.part(spark, dir), 20L,
        Seq("p_name", "p_brand", "p_type")))
      .reduce(_.unionByName(_))
      .withColumn("broadcastable",
        (col("est_bytes") <= BroadcastThresholdBytes).cast("int"))
      .orderBy("table_name")
  }

  /** X419 — shuffle-partition sizing per lineitem join key: modeled
    * shuffle bytes, recommended partitions at 64 MiB, hottest-key
    * share ×10⁶. */
  def q385_shuffle_advisor(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    // modeled lineitem row: 3×8 keys + int 4 + 4×8 doubles + ts 8 +
    // 2 strings (4+len each)
    val width = l.agg(count(lit(1)).as("n"),
      (sum(length(col("l_returnflag")).cast("long") +
        length(col("l_linestatus")).cast("long")) + count(lit(1)) * 8L)
        .as("str_bytes"))
      .select(col("n"), (col("n") * 68L + col("str_bytes")).as("est_total_bytes"))
    def keyArm(key: String): DataFrame = {
      val counts = l.groupBy(col(key)).agg(count(lit(1)).as("c"))
      counts.agg(count(lit(1)).as("n_keys"), max("c").as("max_key_cnt"))
        .crossJoin(broadcast(width))
        .select(lit(key).as("join_key"), col("n"), col("est_total_bytes"),
          col("n_keys"), col("max_key_cnt"),
          expr("(1000000 * max_key_cnt) div n").as("max_key_share_x1m"),
          expr(s"(est_total_bytes + $TargetPartitionBytes - 1) div " +
            s"$TargetPartitionBytes").as("rec_partitions"))
    }
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(keyArm)
      .reduce(_.unionByName(_))
      .orderBy("join_key")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q384_broadcast_advisor" -> q384_broadcast_advisor,
    "q385_shuffle_advisor" -> q385_shuffle_advisor
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q384_broadcast_advisor" -> {
      val arms = Seq(
        ("region", "region", 8L, Seq("r_name")),
        ("nation", "nation", 12L, Seq("n_name")),
        ("customer", "customer", 20L, Seq("c_name", "c_mktsegment")),
        ("supplier", "supplier", 20L, Seq("s_name")),
        ("part", "part", 20L, Seq("p_name", "p_brand", "p_type"))
      ).map { case (name, table, fixed, strs) =>
        val mass = strs.map(c => s"sum(coalesce(length($c), 0) + 4)")
          .mkString(" + ")
        s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(*) * $fixed + $mass AS BIGINT) AS est_bytes
           |FROM $table""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT table_name, n_rows, est_bytes,
         |       CAST(est_bytes <= $BroadcastThresholdBytes AS INT) AS broadcastable
         |FROM ($arms)
         |ORDER BY table_name""".stripMargin
    },
    "q385_shuffle_advisor" -> {
      val arms = Seq("l_orderkey", "l_partkey", "l_suppkey").map { key =>
        s"""SELECT '$key' AS join_key, w.n, w.est_total_bytes,
           |       k.n_keys, k.max_key_cnt,
           |       CAST((1000000 * k.max_key_cnt) // w.n AS BIGINT)
           |         AS max_key_share_x1m,
           |       CAST((w.est_total_bytes + $TargetPartitionBytes - 1)
           |            // $TargetPartitionBytes AS BIGINT) AS rec_partitions
           |FROM w, (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |                CAST(max(c) AS BIGINT) AS max_key_cnt
           |         FROM (SELECT $key, count(*) AS c FROM lineitem GROUP BY $key)) k"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH w AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |                  CAST(count(*) * 68
         |                       + sum(length(l_returnflag) + length(l_linestatus))
         |                       + count(*) * 8 AS BIGINT) AS est_total_bytes
         |           FROM lineitem)
         |$arms
         |ORDER BY join_key""".stripMargin
    }
  )
}
