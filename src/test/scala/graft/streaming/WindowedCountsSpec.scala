package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The watermarked tumbling-window aggregation must converge, over
  * micro-batches with out-of-order arrivals, to the batch result of the
  * same expression. */
class WindowedCountsSpec extends SparkSpec {

  import spark.implicits._

  private val Hour = 3600L * 1000

  test("streaming windowed counts over micro-batches == batch on same data") {
    implicit val ctx = spark.sqlContext
    // (user_id, ts_ms, event_type, value_c) with cross-window interleaving
    val rows = Seq(
      (1L, 100L, "click", 0L),
      (1L, Hour + 5, "purchase", 250L),
      (2L, 50L, "purchase", 100L),
      (1L, 200L, "purchase", 40L), // late within window 0 (arrives batch 2)
      (2L, 2 * Hour + 1, "view", 0L),
      (1L, Hour + 10, "click", 0L))
    val ms = MemoryStream[(Long, Long, String, Long)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "ts_ms", "event_type", "value_c")
    val q = WindowedCounts.tumbling(named(ms.toDF()))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete")
      .start()
    try {
      // three micro-batches; the window-0 purchase arrives AFTER window 1
      // opened — the 30-day watermark must still admit it
      ms.addData(rows.take(2)); q.processAllAvailable()
      ms.addData(rows.slice(2, 4)); q.processAllAvailable()
      ms.addData(rows.drop(4)); q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val batch = WindowedCounts.tumbling(named(rows.toDF()))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batch)
      // spot-check the semantics themselves
      assert(batch((1L, 0L)) == ((2L, 40L))) // click + late purchase in window 0
      assert(batch((1L, Hour)) == ((2L, 250L)))
    } finally q.stop()
  }

  test("streaming hopping windows == batch; every event lands in win/slide windows") {
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, 100L, "click", 10L),
      (2L, 3 * Hour + 5, "purchase", 250L),
      (1L, 7 * Hour, "click", 30L),
      (2L, 3 * Hour + 10, "click", 5L))
    val ms = MemoryStream[(Long, Long, String, Long)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "ts_ms", "event_type", "value_c")
    val q = WindowedCounts.hopping(named(ms.toDF()))
      .writeStream.format("memory").queryName("hop_counts")
      .outputMode("complete")
      .start()
    try {
      ms.addData(rows.take(2)); q.processAllAvailable()
      ms.addData(rows.drop(2)); q.processAllAvailable()
      def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val streamed = keyed(spark.table("hop_counts"))
      val batch = keyed(WindowedCounts.hopping(named(rows.toDF())))
      assert(streamed == batch)
      // 6h window / 3h slide => every event appears in exactly 2 windows
      assert(batch.values.map(_._1).sum == 2L * rows.size)
      // the 3h-slide event at 3h+5 sits in windows starting at 0h and 3h
      assert(batch.contains((0L, "purchase")) && batch.contains((3 * Hour, "purchase")))
    } finally q.stop()
  }
}
