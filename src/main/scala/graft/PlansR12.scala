package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-12 plan-dump helper (NOT the driver contract): writes
  * `plans/r12/<query>_<suffix>.txt` with `explain("formatted")` of the
  * EXECUTED plan (AQE-final) for each named query, all in one session —
  * the before/after evidence files the optimization round commits.
  * Usage: `runMain graft.PlansR12 before q369_bipartite_audit ...`. */
object PlansR12 {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.01")
    val spark = Sessions.tune(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r12"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE-final plan
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r12/${name}_$suffix.txt"), txt)
      println(s"[plans-r12] wrote plans/r12/${name}_$suffix.txt")
      graft.ops.Dedup.unpersistIntermediates(spark)
    }
    graft.ops.Dedup.unpersistPinned(spark)
    spark.stop()
  }
}
