package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-8 wave-91:
  *
  *  - supplier-concentration risk (q380): per part type, the HHI ×10⁴
  *    of supplied-quantity shares plus the single-/dual-sourced part
  *    census — the supply-chain fragility read (q164 measures
  *    vocabulary concentration with the same index; this points it at
  *    procurement). Exact rational HHI: Σq_s² cross-multiplied over
  *    the type total, one grouped pass of the fact table;
  *  - metric r² correlation matrix (q381): which document metrics are
  *    redundant — squared Pearson r ×10⁴ between all pairs of the
  *    four quality metrics, computed WITHOUT square roots (r² =
  *    cov²/(varₓ·var_y), every term an exact cross-multiplied
  *    DECIMAL). The linear complement of q189's Spearman: rank
  *    correlation survives monotone warps, r² answers "is one metric
  *    a linear alias of another" — the feature-pruning question.
  */
object RiskProfileQueries {

  /** X413 — supplier concentration per part type: suppliers, parts,
    * single-/dual-sourced part counts, HHI ×10⁴ of quantity shares. */
  def q380_supplier_risk(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
    val typ = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val bySupp = l.join(broadcast(typ), col("l_partkey") === col("p_partkey"))
      .groupBy("p_type", "l_suppkey")
      .agg(sum("qty").as("q"))
    val perPart = l.join(broadcast(typ), col("l_partkey") === col("p_partkey"))
      .groupBy("p_type", "l_partkey")
      .agg(countDistinct("l_suppkey").as("n_supp"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("n_supp") === 1, 1L).otherwise(0L)).as("n_single_sourced"),
        sum(when(col("n_supp") <= 2, 1L).otherwise(0L)).as("n_at_most_dual"))
    bySupp.groupBy("p_type")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("sq2"),
        sum("q").as("qt"))
      .withColumn("hhi_x10k", expr(
        "CAST((10000 * sq2) div (CAST(qt AS DECIMAL(38,0)) * qt) AS BIGINT)"))
      .join(perPart, "p_type")
      .select("p_type", "n_suppliers", "n_parts", "n_single_sourced",
        "n_at_most_dual", "hhi_x10k")
      .orderBy("p_type")
  }

  /** The four metrics whose pairwise linearity q381 audits. */
  val R2Metrics: Seq[String] =
    Seq("len_chars", "n_tokens", "punct_per_10k", "mean_tok_len_x100")

  /** X414 — squared-Pearson matrix over the doc quality metrics:
    * per pair, r² ×10⁴ as cov²·10⁴ div (varₓ·var_y) with every term an
    * exact cross-multiplied DECIMAL — no square root anywhere. */
  def q381_metric_r2(spark: SparkSession, dir: String): DataFrame = {
    val metrics = qualityMetrics(col("text")).toMap
    val m = Tables.documents(spark, dir).select(
      col("n_chars").cast("long").as("len_chars"),
      metrics("n_tokens").cast("long").as("n_tokens"),
      metrics("punct_per_10k").cast("long").as("punct_per_10k"),
      metrics("mean_tok_len_x100").cast("long").as("mean_tok_len_x100"))
    val pairs = R2Metrics.combinations(2).toSeq.map { case Seq(x, y) =>
      (s"$x~$y", x, y)
    }
    val agg = m.agg(count(lit(1)).as("n"),
      R2Metrics.flatMap(c => Seq(
        sum(col(c)).as(s"s_$c"),
        sum(expr(s"CAST($c AS DECIMAL(38,0)) * $c")).as(s"s2_$c"))) ++
      pairs.map { case (_, x, y) =>
        sum(expr(s"CAST($x AS DECIMAL(38,0)) * $y")).as(s"sxy_${x}_$y")
      }: _*)
    // ONE aggregate row, arms exploded from it in-plan — six separate
    // selects would re-scan the corpus six times
    val armArr = pairs.map { case (name, x, y) =>
      s"""named_struct(
         |  'pair', '$name',
         |  'cov_n',  n * sxy_${x}_$y - CAST(s_$x AS DECIMAL(38,0)) * s_$y,
         |  'varx_n', n * s2_$x - CAST(s_$x AS DECIMAL(38,0)) * s_$x,
         |  'vary_n', n * s2_$y - CAST(s_$y AS DECIMAL(38,0)) * s_$y)""".stripMargin
    }.mkString("array(", ",\n", ")")
    agg.select(col("n"), explode(expr(armArr)).as("p"))
      .select(col("p.pair").as("pair"), col("n"),
        col("p.cov_n").as("cov_n"), col("p.varx_n").as("varx_n"),
        col("p.vary_n").as("vary_n"))
      .select(col("pair"), col("n"),
        expr("""CASE WHEN varx_n = 0 OR vary_n = 0 THEN 0L
                |ELSE CAST((10000 * cov_n * cov_n) div (varx_n * vary_n) AS BIGINT)
                |END""".stripMargin).as("r2_x10k"),
        expr("CAST(sign(cov_n) AS BIGINT)").as("cov_sign"))
      .orderBy("pair")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q380_supplier_risk" -> q380_supplier_risk,
    "q381_metric_r2" -> q381_metric_r2
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.toks

  val oracles: Map[String, String] = Map(
    "q380_supplier_risk" ->
      """WITH l AS (SELECT l_partkey, l_suppkey,
        |                  CAST(round(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem),
        |j AS (SELECT p.p_type, l.* FROM l JOIN part p ON p.p_partkey = l.l_partkey),
        |bysupp AS (SELECT p_type, l_suppkey, CAST(sum(qty) AS BIGINT) AS q
        |           FROM j GROUP BY 1, 2),
        |perpart AS (SELECT p_type, CAST(count(*) AS BIGINT) AS n_parts,
        |                   CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |                     AS n_single_sourced,
        |                   CAST(sum(CASE WHEN n_supp <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |                     AS n_at_most_dual
        |            FROM (SELECT p_type, l_partkey,
        |                         count(DISTINCT l_suppkey) AS n_supp
        |                  FROM j GROUP BY 1, 2)
        |            GROUP BY p_type),
        |conc AS (SELECT p_type, CAST(count(*) AS BIGINT) AS n_suppliers,
        |                sum(CAST(q AS HUGEINT) * q) AS sq2,
        |                CAST(sum(q) AS BIGINT) AS qt
        |         FROM bysupp GROUP BY p_type)
        |SELECT c.p_type, c.n_suppliers, p.n_parts, p.n_single_sourced,
        |       p.n_at_most_dual,
        |       CAST((10000 * c.sq2) // (CAST(c.qt AS HUGEINT) * c.qt) AS BIGINT)
        |         AS hhi_x10k
        |FROM conc c JOIN perpart p USING (p_type)
        |ORDER BY c.p_type""".stripMargin,
    "q381_metric_r2" -> {
      val metricSql = Map(
        "len_chars" -> "CAST(n_chars AS BIGINT)",
        "n_tokens" -> s"CAST(len($toks) AS BIGINT)",
        "punct_per_10k" -> ("CAST(CASE WHEN length(text) > 0 THEN floor(10000 * " +
          "(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) " +
          "/ length(text)) ELSE 0 END AS BIGINT)"),
        "mean_tok_len_x100" -> (s"CAST(CASE WHEN len($toks) > 0 THEN floor(100 * " +
          s"length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks)) " +
          "ELSE 0 END AS BIGINT)"))
      val proj = R2Metrics.map(c => s"${metricSql(c)} AS $c").mkString(",\n|         ")
      val sums = R2Metrics.flatMap(c => Seq(
        s"CAST(sum($c) AS HUGEINT) AS s_$c",
        s"sum(CAST($c AS HUGEINT) * $c) AS s2_$c")) ++
        R2Metrics.combinations(2).toSeq.map { case Seq(x, y) =>
          s"sum(CAST($x AS HUGEINT) * $y) AS sxy_${x}_$y"
        }
      val arms = R2Metrics.combinations(2).toSeq.map { case Seq(x, y) =>
        s"""SELECT '$x~$y' AS pair, n,
           |       n * sxy_${x}_$y - s_$x * s_$y AS cov_n,
           |       n * s2_$x - s_$x * s_$x AS varx_n,
           |       n * s2_$y - s_$y * s_$y AS vary_n
           |FROM agg""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (
         |  SELECT $proj
         |  FROM documents),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               ${sums.mkString(",\n|               ")}
         |        FROM m),
         |arms AS ($arms)
         |SELECT pair, n,
         |       CAST(CASE WHEN varx_n = 0 OR vary_n = 0 THEN 0
         |            ELSE (10000 * cov_n * cov_n) // (varx_n * vary_n) END AS BIGINT)
         |         AS r2_x10k,
         |       CAST(sign(cov_n) AS BIGINT) AS cov_sign
         |FROM arms ORDER BY pair""".stripMargin
    }
  )
}
