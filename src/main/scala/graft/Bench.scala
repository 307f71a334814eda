package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: one JSON line with per-query wall seconds at
  * `SPARK_GRAFT_SF_DIR`.
  *
  * Each query is first executed once at the smallest scale factor
  * (sf0.001) to pay Janino/whole-stage-codegen compilation and class
  * loading up front — Spark caches generated classes by source text, so
  * the warm-up compiles exactly the code the measured run reuses. What's
  * timed at the target SF is execution, not compiler latency (cold-start
  * dominated small-SF numbers by 5×: q22 5.0 s cold vs 0.9 s warm).
  */
object Bench {
  private val WarmupDir = "/root/testdata/sf0.001"

  /** Throughput of the stateful streaming path (flatMapGroupsWithState
    * merge ladder) under a given state-store provider, in events/sec.
    * Generated events flow through a MemoryStream in several micro-batches
    * to a noop sink — measures state machinery, not source/sink I/O. */
  private def streamThroughput(
      spark: SparkSession, provider: Option[String], nTx: Int): Double = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.cdc.{CdcEvent, EventGen}
    import graft.streaming.CdcStream
    provider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = EventGen.generate(nTx = nTx, seed = 99L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString
    val ms = MemoryStream[CdcEvent]
    val q = CdcStream.viewUpdates(ms.toDS())
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val t0 = System.nanoTime()
      events.grouped(math.max(events.size / 8, 1)).foreach(ms.addData(_))
      q.processAllAvailable()
      events.size / ((System.nanoTime() - t0) / 1e9)
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // static conf, default 100: the 38-query surface compiles far more
      // whole-stage-codegen units than that across warmup+measured passes,
      // and cache thrash re-Janinos every stage (measured 5× total-time
      // regression when the surface outgrew the default)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pre-touch the measured SF's parquet bytes so a cold page cache can't
    // dominate the numbers (the round-1 driver run was 3× the warm cost —
    // first touch after the snapshot). One sequential read per file, result
    // discarded; at these sizes (~100 MB at sf0.1) this is seconds.
    java.nio.file.Files.walk(Paths.get(sfDir)).forEach { p =>
      if (p.toString.endsWith(".parquet") && Files.isRegularFile(p)) {
        val in = Files.newInputStream(p)
        try { val buf = new Array[Byte](1 << 20); while (in.read(buf) >= 0) () }
        finally in.close()
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, WarmupDir).count()
      catch { case _: Throwable => () }
      finally graft.ops.Dedup.unpersistIntermediates(spark)
    }
    // Per-query time = min over `reps` runs: this VM shows intermittent
    // multi-second CPU-steal spikes (one run measured q17 at 115 s vs its
    // stable 3 s), and the min over independent repetitions is the
    // standard robust estimator of true cost under transient interference.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // a failed query must NOT be reported as a (fast) success — mark -1
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name failed: ${t.getMessage}"); false
        }
        finally graft.ops.Dedup.unpersistIntermediates(spark)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // state-store comparison: default HDFS-backed vs RocksDB (jar ships
    // with the Spark distribution), same event volume, noop sink
    def safeThroughput(provider: Option[String], nTx: Int): Double =
      try streamThroughput(spark, provider, nTx)
      catch { case t: Throwable =>
        System.err.println(s"[bench] stream($provider) failed: ${t.getMessage}"); -1.0 }
    // warm each provider's path first (state-store init + codegen + JIT
    // dominated the first run and made the reported number swing 4×)
    safeThroughput(None, nTx = 1000)
    val evHdfs = safeThroughput(None, nTx = 10000).round
    safeThroughput(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), nTx = 1000)
    val evRocks = safeThroughput(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), nTx = 10000).round
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""stream_hdfs_events_per_sec":$evHdfs,"stream_rocksdb_events_per_sec":$evRocks,""" +
      s""""sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for the driver's parse: the same JSON at a well-known
    // path, immune to any log prefixing of stdout.
    try Files.writeString(Paths.get("BENCH_LATEST.json"), line + "\n")
    catch { case t: Throwable => System.err.println(s"[bench] write BENCH_LATEST.json failed: $t") }
    spark.stop()
  }
}
