package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: `runMain graft.TimeQuery q311_x [q312_y ...]`
  * — one warm-up, one measured run per named query at
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), pinned-core caches released
  * between queries so each number is a cold-core build like Bench's
  * first rep. Complements Bench (whole board) when iterating on ONE
  * query's plan. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
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
    args.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      fn(spark, dir).collect() // warm-up (JIT + page cache)
      graft.ops.Dedup.unpersistIntermediates(spark)
      val t0 = System.nanoTime()
      fn(spark, dir).collect()
      println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%.2f")
      graft.ops.Dedup.unpersistIntermediates(spark)
    }
    spark.stop()
  }
}
