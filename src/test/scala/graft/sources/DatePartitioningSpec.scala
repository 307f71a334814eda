package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Calendar partitioning: directory-level pruning must reach the scan
  * (partitionFilters), and range reads must be boundary-exact. */
class DatePartitioningSpec extends SparkSpec {

  import spark.implicits._

  private val day = DatePartitioning.DayMs

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => p.children
    }
    p +: kids.flatMap(collectAll)
  }

  // 10 days × 4 events/day
  private val events = (0 until 40)
    .map(i => ((i / 4).toLong * day + (i % 4).toLong * 1000 + 500, i.toLong))

  private def written(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-datepart").toString
    DatePartitioning.writeDaily(events.toDF("ts_ms", "event_id"), "ts_ms", path)
    path
  }

  test("readRange returns exactly the in-range rows across day boundaries") {
    val path = written()
    // from mid-day-2 to mid-day-5
    val from = 2 * day + 1500
    val until = 5 * day + 1500
    val got = DatePartitioning.readRange(spark, path, "ts_ms", from, until)
      .select("event_id").as[Long].collect().toSet
    val want = events.filter(e => e._1 >= from && e._1 < until).map(_._2).toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < events.size)
  }

  test("the day filter prunes partitions at the scan (partitionFilters present)") {
    val path = written()
    val df = DatePartitioning.readRange(spark, path, "ts_ms", 2 * day, 4 * day)
    df.collect()
    val scans = collectAll(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "day")),
      s"day bound must be a PARTITION filter, got: ${scan.partitionFilters}")
    // pruning actually happened: 2 of the 10 day-dirs selected
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 2, s"expected 2 pruned-in day partitions, got $selected")
  }

  test("relandDays replaces only the backfilled day; other days' files untouched") {
    val path = written()
    def files(d: Long): Map[String, Long] = {
      val dir = java.nio.file.Paths.get(path, s"day=$d")
      val it = java.nio.file.Files.list(dir)
      try it.filter(_.toString.endsWith(".parquet")).toArray
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(p.toString)).toMillis).toMap
      finally it.close()
    }
    val day0Before = files(0L)
    val day2Before = files(2L)
    // corrected day-1 data: different rows entirely
    val fixed = Seq((1 * day + 100L, 900L), (1 * day + 200L, 901L))
      .toDF("ts_ms", "event_id")
    DatePartitioning.relandDays(fixed, "ts_ms", path)
    assert(files(0L) == day0Before && files(2L) == day2Before,
      "untouched days must keep their exact files")
    val day1 = spark.read.parquet(path).where(col("day") === 1L)
      .select("event_id").as[Long].collect().toSet
    assert(day1 == Set(900L, 901L), s"day 1 must hold ONLY the re-landed rows: $day1")
    // idempotence: re-running the same backfill converges
    DatePartitioning.relandDays(fixed, "ts_ms", path)
    assert(spark.read.parquet(path).where(col("day") === 1L).count() == 2L)
    // the rest of the table is intact
    assert(spark.read.parquet(path).count() == (events.size - 4 + 2).toLong)
  }

  test("full-range read sees every row (derived day bounds are inclusive-exact)") {
    val path = written()
    val got = DatePartitioning.readRange(spark, path, "ts_ms", 0L, 10 * day)
      .count()
    assert(got == events.size.toLong)
  }
}
