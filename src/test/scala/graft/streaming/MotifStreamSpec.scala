package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming motif counter must emit, over micro-batches split at
  * arbitrary points, exactly the batch triple-join's chains — the state's
  * job is the span-bounded suffix that lets a new event close chains
  * through earlier batches. */
class MotifStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Types = Seq("view", "click", "purchase")
  private val Span = MotifStream.SpanMs

  private def batchMotifs(all: Seq[(Long, Long, Long, String)]): Set[(Long, Long, Long)] = {
    val e = all.toDF("user_id", "ts_ms", "event_id", "event_type")
    def before(x: String, y: String) =
      col(s"$x.ts_ms") < col(s"$y.ts_ms") ||
        (col(s"$x.ts_ms") === col(s"$y.ts_ms") && col(s"$x.event_id") < col(s"$y.event_id"))
    e.as("a")
      .join(e.as("b"), col("a.user_id") === col("b.user_id") && before("a", "b"))
      .join(e.as("c"), col("b.user_id") === col("c.user_id") && before("b", "c") &&
        col("c.ts_ms") - col("a.ts_ms") <= Span)
      .select(col("a.event_id"), col("b.event_id"), col("c.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def runStream(batches: Seq[Seq[(Long, Long, Long, String)]]):
      Seq[(Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = MotifStream.motifs(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[MotifStream.Motif], _: Long) =>
        rows.synchronized { rows ++= ds.collect().map(m => (m.a_id, m.b_id, m.c_id)) }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-motif-ckpt").toString)
      .start()
    try { batches.foreach { b => ms.addData(b); q.processAllAvailable() } }
    finally q.stop()
    rows.toSeq
  }

  test("stream motifs over split batches == batch triple join") {
    // 2 users, events spaced so some chains cross the span bound: gaps of
    // half a span put chain ends 1.5 spans apart — those must NOT emit
    val all = (0 until 24).map { i =>
      (i % 2 + 1L, 1000L + (i / 2) * (Span / 2), i.toLong, Types(i % Types.length))
    }
    val got = runStream(all.grouped(10).toSeq)
    val want = batchMotifs(all)
    assert(got.toSet == want, "stream must emit exactly the batch chains")
    assert(got.size == want.size, "no duplicate chains")
    assert(want.nonEmpty, "fixture must actually produce chains")
  }

  test("replayed batch emits nothing; stale events cannot close chains") {
    implicit val ctx = spark.sqlContext
    val b = Seq((1L, 1000L, 1L, "view"), (1L, 2000L, 2L, "click"),
      (1L, 3000L, 3L, "purchase"))
    val got = runStream(Seq(b, b))
    assert(got == Seq((1L, 2L, 3L)), "replay must be a no-op")
  }

  test("span eviction bounds state: far-apart events never chain") {
    val b = Seq(
      (1L, 1000L, 1L, "view"),
      (1L, 1000L + Span + 1, 2L, "click"),
      (1L, 1000L + 2 * (Span + 1), 3L, "purchase"))
    assert(runStream(Seq(b)).isEmpty, "chains past the span must not emit")
  }
}
