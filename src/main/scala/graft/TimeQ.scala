package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timer: `runMain graft.TimeQ q200_ppjoin_pairs q192_...` times
  * the named queries at sf0.1 (env `SPARK_GRAFT_SF_DIR` overrides) with
  * the same warmup + between-query release discipline as [[Bench]], so a
  * local iteration measures what the driver's bench will. Prints one
  * `name=secs` line per query per pass plus a total. Not part of the
  * driver contract — a builder tool. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val passes = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = Sessions.tune(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case t: Throwable => System.err.println(s"[warm] $n: ${t.getMessage}") }
      finally graft.ops.Dedup.unpersistIntermediates(spark)
    }
    graft.ops.Dedup.unpersistPinned(spark)
    (1 to passes).foreach { p =>
      var total = 0.0
      names.foreach { n =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).count()
          val s = (System.nanoTime() - t0) / 1e9
          total += s
          println(f"pass$p $n%-28s $s%.2f s")
        } catch { case t: Throwable => println(s"pass$p $n FAILED: ${t.getMessage}") }
        finally graft.ops.Dedup.unpersistIntermediates(spark)
      }
      println(f"pass$p TOTAL $total%.2f s")
      graft.ops.Dedup.unpersistPinned(spark)
    }
    spark.stop()
  }
}
