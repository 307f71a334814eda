package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming compaction must converge, over batches split mid-user,
  * to the batch lag-filter (q130's shape) on the same data — state keeps
  * only (last seen ts/event_id, last type, change count) per user. */
class CompactionStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Types = Seq("view", "view", "click", "click", "click", "error")

  test("stream compaction over split batches == batch lag filter") {
    implicit val ctx = spark.sqlContext
    // runs of repeated types so compaction actually drops events
    val all = (0 until 90).map { i =>
      (i % 3 + 1L, 1000L + i * 10L, i.toLong, Types((i / 3) % Types.length))
    }
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String, Long)]
    val q = CompactionStream.changes(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[CompactionStream.Change], _: Long) =>
        rows.synchronized {
          rows ++= ds.collect().map(c =>
            (c.user_id, c.ts_ms, c.event_id, c.event_type, c.change_seq))
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-compact-ckpt").toString)
      .start()
    try {
      all.grouped(40).foreach { b => ms.addData(b); q.processAllAvailable() }
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
      val batch = all.toDF("user_id", "ts_ms", "event_id", "event_type")
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
        .withColumn("change_seq", row_number().over(w).cast("long"))
        .select("user_id", "ts_ms", "event_id", "event_type", "change_seq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
        .toSet
      assert(rows.toSet == batch)
      assert(rows.size < all.size, "compaction must actually drop repeats")
    } finally q.stop()
  }

  test("a repeated type across the batch boundary is suppressed") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = CompactionStream.changes(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[CompactionStream.Change], _: Long) =>
        rows.synchronized { rows ++= ds.collect().map(c => (c.event_type, c.change_seq)) }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-compact-ckpt").toString)
      .start()
    try {
      ms.addData(Seq((1L, 10L, 1L, "view"))); q.processAllAvailable()
      ms.addData(Seq((1L, 20L, 2L, "view"), (1L, 30L, 3L, "click")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", 1L), ("click", 2L)),
        "the duplicate 'view' in batch 2 must be suppressed by the state bridge")
    } finally q.stop()
  }

  test("at-least-once redelivery is idempotent: replayed/stale events emit nothing") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = CompactionStream.changes(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[CompactionStream.Change], _: Long) =>
        rows.synchronized { rows ++= ds.collect().map(c => (c.event_type, c.change_seq)) }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-compact-ckpt").toString)
      .start()
    try {
      ms.addData(Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", 1L), ("click", 2L)))
      // full-batch replay (at-least-once): must not re-emit or bump change_seq
      ms.addData(Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", 1L), ("click", 2L)), "replay must be a no-op")
      // a stale 'view' older than state's last seen event must not re-open a
      // view-edge; the genuinely new 'view' continues the sequence correctly
      ms.addData(Seq((1L, 15L, 99L, "view"), (1L, 30L, 3L, "view")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", 1L), ("click", 2L), ("view", 3L)),
        "only the new event's edge is emitted, once")
    } finally q.stop()
  }
}
