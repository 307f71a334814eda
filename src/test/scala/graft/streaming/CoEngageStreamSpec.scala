package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X276 — continuous co-engagement: stream-folded (edges, pair counts)
  * equal the one-shot batch computation over everything ingested, under
  * uneven batch splits AND redelivered duplicate engagements; the
  * batchId guard keeps non-idempotent pair addition safe; serving gives
  * q242's scoring from the snapshot. */
class CoEngageStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // (user, item) engagements with in-stream duplicates (user 1 re-views
  // item 10 in a later batch — must not double-count the pair)
  private val events: Seq[(Long, Long)] = Seq(
    (1L, 10L), (1L, 20L), (2L, 10L), (2L, 30L), (1L, 10L),
    (3L, 20L), (3L, 30L), (1L, 30L), (2L, 20L), (3L, 10L), (2L, 30L))

  private def batchPairs(evs: Seq[(Long, Long)]) = {
    val ui = evs.toDF("user_id", "item").distinct()
    ui.as("a").join(ui.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("co"))
  }

  test("stream-folded co counts == one-shot batch pairs under splits + redelivery") {
    val state = Files.createTempDirectory("graft-coeng-state").toString
    val ckpt = Files.createTempDirectory("graft-coeng-ckpt").toString
    val ms = MemoryStream[(Long, Long)]
    val q = CoEngageStream.maintain(
      ms.toDS().toDF("user_id", "item"), state, ckpt)
    try {
      events.grouped(4).foreach { g => ms.addData(g); q.processAllAvailable() }
    } finally q.stop()

    val streamed = CoEngageStream.coSnapshot(spark, state)
      .orderBy("item_a", "item_b").collect().toSeq
    val oneShot = batchPairs(events)
      .orderBy("item_a", "item_b").collect().toSeq
    assert(streamed == oneShot,
      s"stream-folded pair counts must equal batch: $streamed vs $oneShot")

    // edges snapshot is the distinct edge set
    assert(CoEngageStream.edgesSnapshot(spark, state).count() ==
      events.distinct.size)

    // serving: every item's neighbors ranked by the q242 lift
    val served = CoEngageStream.topK(spark, state, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(served.nonEmpty)
    served.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1L to rows.size),
        "ranks are dense per item")
    }
  }

  test("batchId guard: a replayed batch does not double-add pair counts") {
    val state = Files.createTempDirectory("graft-coeng-guard").toString
    val ckpt = Files.createTempDirectory("graft-coeng-gck").toString
    val ms = MemoryStream[(Long, Long)]
    val q = CoEngageStream.maintain(
      ms.toDS().toDF("user_id", "item"), state, ckpt)
    try {
      ms.addData(events.take(6)); q.processAllAvailable()
    } finally q.stop()
    val before = CoEngageStream.coSnapshot(spark, state)
      .agg(sum("co")).collect()(0).getLong(0)

    // restart on the SAME checkpoint: any replayed/empty batch must be
    // skipped by the pointer's batchId guard (pair addition is not
    // idempotent)
    val ms2 = MemoryStream[(Long, Long)]
    val q2 = CoEngageStream.maintain(
      ms2.toDS().toDF("user_id", "item"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = CoEngageStream.coSnapshot(spark, state)
      .agg(sum("co")).collect()(0).getLong(0)
    assert(after == before, s"replay must be a no-op: $before -> $after")
  }
}
