package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming anomaly flags ≡ the batch σ-test: append-mode window close
  * delivers a window's rows in one batch, so flagBatch sees complete
  * windows and must reproduce exactly the batch flags. */
class AnomalyStreamSpec extends SparkSpec {

  import spark.implicits._

  // (user, ts_ms, type, value_c): user 7 is hot inside window [0, 1h);
  // user 8 is hot inside [1h, 2h); others background. A final far-future
  // event closes every window.
  private val h = 3600000L
  private val events: Seq[(Long, Long, String, Long)] = {
    val rnd = new scala.util.Random(3)
    val bg = for (w <- 0 to 1; u <- 1 to 6) yield
      (u.toLong, w * h + rnd.nextInt(3000000).toLong, "view", 0L)
    val hot0 = (1 to 30).map(i => (7L, (i * 7000).toLong, "view", 0L))
    val hot1 = (1 to 25).map(i => (8L, h + (i * 9000).toLong, "view", 0L))
    rnd.shuffle(bg ++ hot0 ++ hot1)
  }
  private val sentinel = (99L, 50 * h, "view", 0L)

  private def expected: Set[(Long, Long, Long)] = {
    val counts = (events :+ sentinel).groupBy(e => (e._2 / h * h, e._1))
      .view.mapValues(_.size.toLong).toSeq.map { case ((w, u), c) => (w, u, c) }
    val byW = counts.groupBy(_._1)
    (for {
      (w, rows) <- byW.toSeq
      n = rows.size.toLong; s = rows.map(_._3).sum; s2 = rows.map(r => r._3 * r._3).sum
      (_, u, c) <- rows
      d = c * n - s
      if d > 0 && d * d > 4 * (n * s2 - s * s)
    } yield (w, u, c)).toSet
  }

  test("streaming flags over shuffled micro-batches equal the batch sigma-test") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String, Long)]
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    // lateness must cover the shuffled delivery (events arrive in
    // arbitrary event-time order across batches); the 50h sentinel still
    // closes both real windows: watermark 50h − 10h ≫ 2h
    val counts = WindowedCounts.tumbling(
      ms.toDF().toDF("user_id", "ts_ms", "event_type", "value_c"),
      windowDur = "1 hour", delay = "10 hours")
    val q = counts.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        AnomalyStream.flagBatch(df)
          .select("window_start_ms", "user_id", "n_events")
          .as[(Long, Long, Long)].collect().foreach(out += _)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-anom-ckpt").toString)
      .start()
    try {
      events.grouped(25).foreach { b => ms.addData(b); q.processAllAvailable() }
      ms.addData(Seq(sentinel)); q.processAllAvailable()
      ms.addData(Seq((99L, 51 * h, "view", 0L))); q.processAllAvailable()
      val want = expected
      assert(want.exists(_._2 == 7L) && want.exists(_._2 == 8L),
        s"test data must make users 7 and 8 anomalous: $want")
      // sentinel windows may or may not flag (single-user windows can't);
      // compare only the real windows
      assert(out.toSet.filter(_._1 < 10 * h) == want.filter(_._1 < 10 * h),
        s"stream=$out batch=$want")
    } finally q.stop()
  }
}
