package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Full-board scale run at sf1 (10× the bench SF) — round-10 VERDICT
  * #3: the 100×-design claims were extrapolated from eleven rehearsed
  * heavies; this runs EVERY registry query once at a 10× disjoint-
  * replica corpus ([[Probe.replicateAll]] — all ten tables, FK
  * structure preserved per replica) and writes `SF1_BOARD.json` for
  * [[Bench]] to embed as the artifact's `sf1` section. A query whose
  * constant factors hide a super-linear term shows up here as a
  * >>10× wall multiple vs its sf0.1 time.
  *
  * Single-rep by design (the round bar): ~400 queries × 10× data in
  * one sitting; the per-query sf0.1 min in the same artifact is the
  * weather control. Pinned cores prewarm first and are timed into
  * their own line items (the Bench cores discipline).
  *
  * Usage: `runMain graft.Sf1Board [baseDir] [factor] [outJson]`
  * (defaults /root/testdata/sf0.1, 10, SF1_BOARD.json).
  */
object Sf1Board {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse("SF1_BOARD.json")
    val spark = Sessions.tune(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-sf1-board")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val repDir = s"/tmp/graft-sf1-${factor}x"
    val t0 = System.nanoTime()
    if (!Files.exists(Paths.get(s"$repDir/lineitem.parquet"))) {
      Probe.replicateAll(spark, baseDir, repDir, factor)
    }
    val synthS = (System.nanoTime() - t0) / 1e9

    val names = SparkEntry.queries.keys.toSeq.sorted
    // codegen/JIT warmup at the smallest SF (the Bench discipline: what's
    // timed at the target scale is execution, not compiler latency)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      finally graft.ops.Dedup.unpersistIntermediates(spark)
    }
    graft.ops.Dedup.unpersistPinned(spark)

    val tc = System.nanoTime()
    val cores = try PinnedCores.prewarm(spark, repDir)
      catch { case t: Throwable =>
        System.err.println(s"[sf1] core prewarm failed: ${t.getMessage}"); Seq.empty }
    val coresS = (System.nanoTime() - tc) / 1e9

    val results = names.map { n =>
      val t = System.nanoTime()
      val ok = try { SparkEntry.queries(n)(spark, repDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"[sf1] $n FAILED: ${t.getMessage.take(200)}"); false }
      finally graft.ops.Dedup.unpersistIntermediates(spark)
      val s = (System.nanoTime() - t) / 1e9
      System.err.println(f"[sf1] $n ${if (ok) f"$s%.2f" else "FAIL"}")
      n -> (if (ok) s else -1.0)
    }
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum + cores.map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val coresJson = cores.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val line =
      s"""{"factor":$factor,"base":"$baseDir","replica_dir":"$repDir",""" +
      f""""synth_s":$synthS%.1f,"cores_s":${cores.map(_._2).sum}%.2f,""" +
      f""""cores_wall_s":$coresS%.1f,"total_s":$total%.1f,""" +
      s""""n_queries":${names.size},"n_failed":${results.count(_._2 < 0)},""" +
      s""""slowest":$slowest,"cores_detail":$coresJson,"queries":$qs,""" +
      s""""note":"single-rep builder run; duck pairing merged by tools/pair_sf1.py"}"""
    Files.writeString(Paths.get(outJson), line + "\n")
    println(line)
    spark.stop()
  }
}
