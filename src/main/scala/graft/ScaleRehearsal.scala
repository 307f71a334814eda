package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Constrained-memory scale rehearsal (round-6 VERDICT #4): run the
  * heavy document/embedding queries at a [[Probe]]-synthesized N× scale
  * under a DELIBERATELY small heap, and report wall seconds + shuffle
  * spill per query — evidence that the board's plans SPILL under
  * pressure instead of silently relying on the 128 GiB sandbox (the one
  * local[32] blind spot in the 100× story: a real executor gets a few
  * GB, not the whole box).
  *
  * Heap comes from the launching JVM (`SPARK_DRIVER_MEM=8g sbt -batch
  * "runMain graft.ScaleRehearsal"` — local mode shares the driver JVM).
  * Spill/peak-memory are summed off `onTaskEnd` task metrics, the same
  * counters a cluster UI shows.
  *
  * Usage: `runMain graft.ScaleRehearsal [baseDir] [factor] [q1 q2 ...]`
  * Prints one JSON line:
  * `{"rehearsal":{"heap_mb":…,"factor":…,"cores_s":…,"queries":{name:
  * {"sec":…,"spill_mb":…}},"peak_exec_mem_mb":…}}`.
  */
object ScaleRehearsal {

  /** The default heavy set: the board's most expensive doc/embedding
    * plans (round-6 plan-audit list, minus events-based q168 which the
    * replica corpus does not synthesize), extended in round-8
    * session 4 with the new graph-family heavies — all rehearsed at
    * 10× / 8 GiB with zero OOM and sub-linear wall (README). */
  private val HeavyFive = Seq(
    "q200_ppjoin_pairs", "q114_neardup_flow", "q138_vocab_growth",
    "q196_degree_assortativity", "q222_blocking_linkage",
    "q369_bipartite_audit", "q349_percolation_sweep",
    "q388_semantic_percolation",
    // round-9 fused subtrees: the packed-id winnow pipeline and the
    // in-row CDC chunker — rehearse so the fusion's memory behavior
    // (per-row buffers instead of exploded rows) is covered at 10×
    "q211_winnow_pairs", "q144_cdc_chunks",
    // round-10: the single-exchange shingle sweep (3 orders in one
    // posting shuffle — its union shingle table is the round's largest
    // new cached intermediate, so pressure-test it)
    "q366_shingle_sweep")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val names = if (args.length > 2) args.drop(2).toSeq else HeavyFive
    val spark = Sessions.tune(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spill = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          peak.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
          ()
        }
      }
    })
    // listener-bus drain: task-end events post asynchronously; a short
    // settle keeps per-query spill deltas attributable (rehearsal tool —
    // second-level precision is enough)
    def settle(): Unit = Thread.sleep(700)

    // reuse an existing replica corpus across invocations (8g vs 24g
    // runs must see identical bytes)
    val outDir = s"/tmp/graft-rehearsal-${factor}x"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$outDir/documents.parquet"))) {
      Probe.replicate(spark, baseDir, outDir, factor)
    }

    val heapMb = Runtime.getRuntime.maxMemory() >> 20
    // pinned cores for the replica dir prewarm first (their own line,
    // the Bench cores_detail discipline)
    val t0 = System.nanoTime()
    val coresOk = try { PinnedCores.prewarm(spark, outDir); true }
      catch { case t: Throwable =>
        System.err.println(s"[rehearsal] core prewarm failed: ${t.getMessage}"); false }
    settle()
    val coresS = (System.nanoTime() - t0) / 1e9
    val coreSpillMb = spill.getAndSet(0L) >> 20

    val rows = names.map { name =>
      val q = SparkEntry.queries(name)
      settle(); spill.set(0L)
      val t = System.nanoTime()
      val ok = try { q(spark, outDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"[rehearsal] $name failed: ${t.getMessage}"); false }
      val sec = (System.nanoTime() - t) / 1e9
      settle()
      val spillMb = spill.get() >> 20
      graft.ops.Dedup.unpersistIntermediates(spark)
      name -> (if (ok) sec else -1.0, spillMb)
    }
    val qs = rows.map { case (n, (s, sp)) =>
      f""""$n":{"sec":$s%.1f,"spill_mb":$sp}""" }.mkString(",")
    println(
      f"""{"rehearsal":{"heap_mb":$heapMb,"factor":$factor,"cores_ok":$coresOk,""" +
      f""""cores_s":$coresS%.1f,"cores_spill_mb":$coreSpillMb,"queries":{$qs},""" +
      s""""peak_exec_mem_mb":${peak.get() >> 20}}}""")
    spark.stop()
  }
}
