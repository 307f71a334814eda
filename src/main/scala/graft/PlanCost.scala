package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop planning-cost probe (NOT the driver contract): split a named
  * query's wall time into DataFrame construction, analysis+optimization
  * (forcing `queryExecution.executedPlan`), and execution — the
  * boundary queries carry a few hundred ms that JobProfile shows outside
  * any Spark job, and this attributes it.
  * Usage: `runMain graft.PlanCost q372_trigram_affinity [reps]`. */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tune(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    (1 to 2).foreach { _ =>
      fn(spark, "/root/testdata/sf0.001").count()
      graft.ops.Dedup.unpersistIntermediates(spark)
    }
    fn(spark, dir).count()
    graft.ops.Dedup.unpersistIntermediates(spark)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + physical planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      graft.ops.Dedup.unpersistIntermediates(spark)
      println(f"[plancost] $name rep$r build=${(t1 - t0) / 1e3}%.0f us " +
        f"plan=${(t2 - t1) / 1e3}%.0f us exec=${(t3 - t2) / 1e3}%.0f us " +
        f"total=${(t3 - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
