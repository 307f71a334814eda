package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** The streaming transition counter must converge, over micro-batches that
  * split users' event sequences at arbitrary points, to the batch lag
  * window on the same data — the state's job is exactly the cross-batch
  * bridge (last event of batch N feeds batch N+1's first transition). */
class TransitionStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Types = Seq("view", "click", "purchase", "error")

  test("stream transitions over split batches == batch lag window") {
    implicit val ctx = spark.sqlContext
    // per-user in-order delivery (the CDC contract), batch split mid-user.
    // ts starts above 0: a row AT the initial watermark (0) is dropped as
    // late by the pre-state filter — real epoch-ms data is always above it
    val all = (0 until 120).map { i =>
      (i % 6 + 1L, 1000L + (i / 6) * 10L + i % 3, i.toLong, Types(i % Types.length))
    }
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    val q = TransitionStream.transitions(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[TransitionStream.Transition], _: Long) =>
        rows.synchronized {
          rows ++= ds.collect().map(t =>
            (t.user_id, t.from_type, t.to_type, t.ts_ms, t.event_id))
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-trans-ckpt").toString)
      .start()
    try {
      // three batches, split points NOT on user boundaries
      all.grouped(50).foreach { b => ms.addData(b); q.processAllAvailable() }
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
      val batch = all.toDF("user_id", "ts_ms", "event_id", "event_type")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .select("user_id", "from_type", "event_type", "ts_ms", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(rows.toSet == batch, "stream must emit exactly the batch lag pairs")
      assert(rows.size == batch.size, "no duplicate transitions")
    } finally q.stop()
  }

  test("cross-batch bridge: a user's last event links to the next batch's first") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = TransitionStream.transitions(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[TransitionStream.Transition], _: Long) =>
        rows.synchronized { rows ++= ds.collect().map(t => (t.from_type, t.to_type)) }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-trans-ckpt").toString)
      .start()
    try {
      ms.addData(Seq((1L, 10L, 1L, "view"))); q.processAllAvailable()
      assert(rows.isEmpty, "a single event has no transition yet")
      ms.addData(Seq((1L, 20L, 2L, "click"))); q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", "click")),
        "the bridge transition must span the batch boundary")
    } finally q.stop()
  }

  test("at-least-once redelivery is idempotent: replayed/stale events emit nothing") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val q = TransitionStream.transitions(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[TransitionStream.Transition], _: Long) =>
        rows.synchronized { rows ++= ds.collect().map(t => (t.from_type, t.to_type, t.event_id)) }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-trans-ckpt").toString)
      .start()
    try {
      ms.addData(Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", "click", 2L)))
      // redeliver the whole batch (at-least-once): must be a no-op, NOT a
      // time-reversed click->view + duplicate view->click pair
      ms.addData(Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", "click", 2L)), "replayed batch must emit nothing")
      // a stale-but-in-watermark event older than state's last is dropped,
      // while a genuinely new event still chains off the remembered last
      ms.addData(Seq((1L, 15L, 99L, "error"), (1L, 30L, 3L, "purchase")))
      q.processAllAvailable()
      assert(rows.toSeq == Seq(("view", "click", 2L), ("click", "purchase", 3L)),
        "stale event must not re-order the chain")
    } finally q.stop()
  }
}
