package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.{DataPrepQueries, IndexQueries}

/** Throwaway stage profiler for q200 — not part of any contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }

    val PpTauX10k = IndexQueries.PpTauX10k
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val toks = graft.ops.Dedup.cacheTracked(
        graft.ops.Dedup.spread(Tables.documents(spark, sfDir))
          .select(col("doc_id"),
            explode(wordShingles(col("text"), DataPrepQueries.ShingleN)).as("token")))
      t("toks")(toks.count())
      val df = toks.groupBy("token").agg(count(lit(1)).as("df"))
      t("df")(df.count())
      val ordered = toks.join(broadcast(df), "token")
        .withColumn("tok_rank", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("token"))).cast("long"))
      val sizes = ordered.groupBy("doc_id").agg(max("tok_rank").as("set_size"))
      t("sizes")(sizes.count())
      val prefix = ordered.join(sizes, "doc_id")
        .filter(col("tok_rank") <=
          col("set_size") - expr(s"(($PpTauX10k * set_size) + 9999) div 10000") + 1L)
      val pkeys = prefix.select(col("token"), col("doc_id"))
      t("pkeys")(pkeys.count())
      val candPairs = pkeys.select(col("token"), col("doc_id").as("id_a"))
        .join(pkeys.select(col("token"), col("doc_id").as("id_b")), "token")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      t("candPairs")(candPairs.count())
      val arrays = toks.groupBy("doc_id").agg(collect_set("token").as("sh"))
      t("arrays")(arrays.count())
      val inter = candPairs
        .join(arrays.select(col("doc_id").as("id_a"), col("sh").as("sa")), "id_a")
        .join(arrays.select(col("doc_id").as("id_b"), col("sh").as("sb")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_common"))
        .filter(col("n_common") > 0)
      t("inter")(inter.count())
      t("full")(IndexQueries.q200_ppjoin_pairs(spark, sfDir).count())
      graft.ops.Dedup.unpersistIntermediates(spark)
    }
    spark.stop()
  }
}
