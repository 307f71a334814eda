package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X206 — continuous rolling-distinct: the stream-folded daily sketch
  * table serves the same trailing-window estimates as a one-shot batch
  * build under any batch split; re-delivered events cannot inflate the
  * estimate (HLL insertion is set-like); the batchId guard skips exact
  * replays. */
class RollingDistinctStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val day0 = 20000L * 86400000L
  // (user, day-offset) activity: day 0 = {1,2,3}, day 1 = {2,3,4,5}, day 3 = {1,6}
  private val activity: Seq[(Long, Long)] =
    Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      1L -> 3L, 6L -> 3L)
  private def rows(a: Seq[(Long, Long)]): Seq[(Long, Long)] =
    a.map { case (u, d) => (u, day0 + d * 86400000L) }

  private def exactTrailing(w: Int): Map[Long, Long] = {
    val byDay = activity.groupBy(_._2)
    val days = byDay.keySet
    days.map { d =>
      val users = activity.collect {
        case (u, ad) if ad <= d && ad > d - w => u
      }.toSet
      (day0 / 86400000L + d) -> users.size.toLong
    }.toMap
  }

  test("stream-folded tile == batch tile; estimates exact at small cardinality; redelivery is a no-op") {
    val state = Files.createTempDirectory("graft-rds-state").toString
    val ckpt = Files.createTempDirectory("graft-rds-ckpt").toString
    val ms = MemoryStream[(Long, Long)]
    val q = RollingDistinctStream.maintain(
      ms.toDS().toDF("user_id", "ts_ms"), state, ckpt)
    try {
      // uneven batches with a REDELIVERED overlap (day-1 rows repeat)
      ms.addData(rows(activity.take(4))); q.processAllAvailable()
      ms.addData(rows(activity.slice(2, 7))); q.processAllAvailable()
      ms.addData(rows(activity.drop(7))); q.processAllAvailable()
    } finally q.stop()

    val got = RollingDistinctStream.rollingDistinct(spark, state, windowDays = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = exactTrailing(3)
    // HLL is exact at these cardinalities; the tile must agree with the
    // exact trailing-window distinct INCLUDING the redelivered rows
    assert(got == want, s"got $got want $want")
  }

  test("batchId guard: restart on the same checkpoint leaves the store untouched") {
    val state = Files.createTempDirectory("graft-rds-guard").toString
    val ckpt = Files.createTempDirectory("graft-rds-guard-ck").toString
    val ms = MemoryStream[(Long, Long)]
    val q = RollingDistinctStream.maintain(
      ms.toDS().toDF("user_id", "ts_ms"), state, ckpt)
    try { ms.addData(rows(activity)); q.processAllAvailable() } finally q.stop()
    val before = RollingDistinctStream.snapshot(spark, state)
      .agg(count(lit(1))).as[Long].head()
    val ms2 = MemoryStream[(Long, Long)]
    val q2 = RollingDistinctStream.maintain(
      ms2.toDS().toDF("user_id", "ts_ms"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = RollingDistinctStream.snapshot(spark, state)
      .agg(count(lit(1))).as[Long].head()
    assert(before == after && before == 3L, "three distinct active days")
  }
}
