package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-loop job/stage profiler (NOT the driver contract): run one named
  * query warm and print every Spark job's wall ms and every stage's
  * task-time/row counts — the local[32] boundary queries are scheduling-
  * floor bound (multi-second oracle gaps at 1 MB inputs), so the lever
  * is the NUMBER of jobs/exchanges, and this prints exactly that.
  * Usage: `runMain graft.JobProfile q372_trigram_affinity [reps]`. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val confArgs = args.drop(2).filter(_.startsWith("conf:")).map { a =>
      val kv = a.stripPrefix("conf:").split("=", 2); (kv(0), kv(1))
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = Sessions.tune(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    val spark = confArgs.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    // warmup passes (codegen + JIT + page cache)
    (1 to 2).foreach { _ =>
      fn(spark, "/root/testdata/sf0.001").count()
      graft.ops.Dedup.unpersistIntermediates(spark)
    }
    fn(spark, dir).count()
    graft.ops.Dedup.unpersistIntermediates(spark)

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart.put(e.jobId, e.time); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(e.jobId, e.time)
        lines.add(f"job ${e.jobId}%3d wall=${e.time - t0}%5d ms")
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        lines.add(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=${si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)}%5d ms " +
          f"taskTime=${if (tm != null) tm.executorRunTime else -1}%6d ms " +
          f"inRows=${if (tm != null) tm.inputMetrics.recordsRead else -1}%8d " +
          f"shRead=${if (tm != null) tm.shuffleReadMetrics.recordsRead else -1}%8d " +
          f"shWrite=${if (tm != null) tm.shuffleWriteMetrics.recordsWritten else -1}%8d  " +
          si.name.takeWhile(_ != '\n').take(80))
        ()
      }
    })
    (1 to reps).foreach { r =>
      lines.clear(); jobStart.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ops.Dedup.unpersistIntermediates(spark)
      Thread.sleep(500) // listener-bus drain
      println(f"== $name rep $r total=$sec%.2f s ==")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
