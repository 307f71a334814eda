package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timer (NOT the driver contract — that's [[Bench]]): time a
  * handful of named queries at an SF dir, min-of-reps, same session
  * conf as Bench. Usage: runMain graft.BenchDev <sfDir> <reps> q1 q2 …
  * (names are prefixes; "q165" matches q165_rake_keywords). Args of the
  * form `conf:key=value` are applied to the session builder — the A/B
  * hook for session-conf experiments (e.g.
  * `conf:spark.sql.adaptive.coalescePartitions.minPartitionSize=256k`). */
object BenchDev {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val (confArgs, prefixes) = args.drop(2).toSeq.partition(_.startsWith("conf:"))
    val extraConf = confArgs.map { a =>
      val kv = a.stripPrefix("conf:").split("=", 2); (kv(0), kv(1))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = Sessions.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.cleaner.periodicGC.interval", "30s")
    val spark = extraConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    // one warmup pass at sf0.001 (codegen/JIT), then timed reps
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case t: Throwable => System.err.println(s"[dev] warmup $n: ${t.getMessage}") }
      finally graft.ops.Dedup.unpersistIntermediates(spark)
    }
    graft.ops.Dedup.unpersistPinned(spark)
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case t: Throwable => System.err.println(s"[dev] $n FAILED: ${t.getMessage}") }
        finally graft.ops.Dedup.unpersistIntermediates(spark)
        times(n) = times.getOrElse(n, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
      }
      graft.ops.Dedup.unpersistPinned(spark)
    }
    names.foreach { n =>
      val ts = times(n)
      println(f"[devbench] $n%-28s min=${ts.min}%6.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
