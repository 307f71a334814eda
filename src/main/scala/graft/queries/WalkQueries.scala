package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 wave-60: graph-to-sequence + schema discovery.
  *
  *  - deterministic random-walk corpus (q315): DeepWalk's first stage —
  *    fixed-length walks from every node over the pinned kNN graph with
  *    hash-derandomized next-step picks, reduced to co-visit pair
  *    counts (the "skip-gram corpus" a graph-embedding trainer consumes;
  *    co-visits reach 2-3 hops beyond the direct kNN edges);
  *  - functional-dependency audit (q316): does column A determine
  *    column B — exact per-candidate violation counts, the schema-
  *    discovery / data-contract check that catches "orderkey no longer
  *    unique" class corruption before it poisons joins (X344 profiles
  *    single columns; this profiles column RELATIONSHIPS).
  *
  * Scale shapes: q315 is [[WalkLen]] − 1 chained equijoins on the
  * current-node key (walk frontier is |V| rows throughout) + one
  * bounded pair aggregate; q316 is one grouped pass per candidate over
  * a fixed candidate list.
  */
object WalkQueries {

  val WalkLen = 4
  val WalkSeed = "walk8"
  val CovisitTopK = 100

  /** X346 — deterministic random-walk co-visit corpus. Step t from node
    * c of the walk started at s picks neighbor index
    * `md5("$WalkSeed:s:t:c") mod deg(c)` among c's dot-ranked kNN
    * neighbors — every engine and every retry walks identically. Pairs
    * are distinct-per-walk, canonical (u < v). */
  def q315_walk_covisits(spark: SparkSession, dir: String): DataFrame = {
    val g = OlapQueries.knnGraphPinned(spark, dir)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val deg = g.groupBy(col("query_id").as("cur")).agg(count(lit(1)).as("deg"))
    def step(frontier: DataFrame, t: Int): DataFrame = {
      val idx = frontier.join(deg, "cur")
        .withColumn("idx",
          pmod(conv(substring(md5(concat_ws(":", lit(WalkSeed), col("s"),
            lit(t), col("cur"))), 1, 4), 16, 10).cast("long"), col("deg")) + 1L)
      idx.join(g, idx("cur") === g("query_id") && idx("idx") === g("rank"))
        .select(col("s"), col("neighbor_id").as("cur"))
    }
    var frontier = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("s"), col("vec_id").as("cur"))
    var walk = frontier.select(col("s"), col("cur").as("node"))
    (1 until WalkLen).foreach { t =>
      frontier = step(frontier, t)
      walk = walk.unionByName(frontier.select(col("s"), col("cur").as("node")))
    }
    val nodes = walk.distinct()
    nodes.as("a").join(nodes.as("b"),
        col("a.s") === col("b.s") && col("a.node") < col("b.node"))
      .groupBy(col("a.node").as("u"), col("b.node").as("v"))
      .agg(count(lit(1)).as("n_covisits"))
      .orderBy(col("n_covisits").desc, col("u").asc, col("v").asc)
      .limit(CovisitTopK)
  }

  /** X347 — functional-dependency audit over a fixed candidate list on
    * `orders`: for A→B, a violating A-group holds >1 distinct B.
    * `fd_holds` = zero violations. */
  val FdCandidates: Seq[(String, String)] = Seq(
    ("o_orderkey", "o_custkey"),
    ("o_orderkey", "o_orderpriority"),
    ("o_custkey", "o_orderpriority"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"))
  def q316_fd_audit(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    FdCandidates.map { case (lhs, rhs) =>
      ord.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
        .agg(count(lit(1)).as("n_groups"),
          sum((col("n_rhs") > 1L).cast("long")).as("n_violating"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_groups"), col("n_violating"),
          (col("n_violating") === 0L).cast("long").as("fd_holds"))
    }.reduce(_ unionByName _).orderBy("lhs", "rhs")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q315_walk_covisits" -> q315_walk_covisits,
    "q316_fd_audit" -> q316_fd_audit
  )

  private def stepSql(t: Int): String = {
    val prev = if (t == 1) "w0" else s"w${t - 1}"
    s"""w$t AS (
       |  SELECT f.s, g.neighbor_id AS cur
       |  FROM $prev f
       |  JOIN deg ON deg.cur = f.cur
       |  JOIN gr g ON g.query_id = f.cur
       |    AND g.rank = CAST(concat('0x', substr(md5(concat('$WalkSeed', ':',
       |          CAST(f.s AS VARCHAR), ':', '$t', ':', CAST(f.cur AS VARCHAR))),
       |          1, 4)) AS BIGINT) % deg.deg + 1)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q315_walk_covisits" -> {
      val steps = (1 until WalkLen).map(stepSql).mkString(",\n")
      val unions = (1 until WalkLen).map(t => s"SELECT s, cur AS node FROM w$t")
        .mkString("\n  UNION ALL ")
      s"""WITH ${OlapQueries.knnChainSql},
         |gr AS (SELECT query_id, rank, neighbor_id FROM r
         |       WHERE rank <= ${OlapQueries.KnnK}),
         |deg AS (SELECT query_id AS cur, CAST(count(*) AS BIGINT) AS deg
         |        FROM gr GROUP BY query_id),
         |w0 AS (SELECT vec_id AS s, vec_id AS cur FROM embeddings),
         |$steps,
         |walk AS (SELECT DISTINCT s, node FROM (
         |  SELECT s, cur AS node FROM w0
         |  UNION ALL $unions))
         |SELECT a.node AS u, b.node AS v, count(*) AS n_covisits
         |FROM walk a JOIN walk b ON a.s = b.s AND a.node < b.node
         |GROUP BY u, v
         |ORDER BY n_covisits DESC, u ASC, v ASC LIMIT $CovisitTopK""".stripMargin
    },
    "q316_fd_audit" -> {
      val arms = FdCandidates.map { case (lhs, rhs) =>
        s"""SELECT '$lhs' AS lhs, '$rhs' AS rhs,
           |       count(*) AS n_groups,
           |       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_violating,
           |       CAST(CASE WHEN sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
           |                 THEN 1 ELSE 0 END AS BIGINT) AS fd_holds
           |FROM (SELECT $lhs, count(DISTINCT $rhs) AS n_rhs
           |      FROM orders GROUP BY $lhs)""".stripMargin
      }.mkString("\nUNION ALL ")
      s"$arms\nORDER BY lhs, rhs"
    }
  )
}
