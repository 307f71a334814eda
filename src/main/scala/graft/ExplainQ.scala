package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop plan printer (NOT the driver contract): print a named
  * query's executed plan — grep-friendly for ReadSchema/Exchange/
  * PushedFilters audits. Usage:
  * `runMain graft.ExplainQ q211_winnow_pairs [formatted|lines]`. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val mode = args.lift(1).getOrElse("lines")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.tune(SparkSession.builder()).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))(spark, dir)
    if (mode == "formatted") df.explain("formatted")
    else {
      val plan = df.queryExecution.executedPlan.toString
      println(plan.split("\n").filter(l =>
        l.contains("ReadSchema") || l.contains("Exchange") || l.contains("Scan") ||
        l.contains("PushedFilters") || l.contains("Aggregate") || l.contains("Generate") ||
        l.contains("Window") || l.contains("Sort") || l.contains("Join") ||
        l.contains("Repartition") || l.contains("Coalesce"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
