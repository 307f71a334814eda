package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Relational

/** The streaming funnel must converge, over shuffled micro-batches (late
  * stage-0 events retroactively qualifying later stages), to the batch
  * funnel on the same data — INCLUDING cross-stage exact-timestamp ties,
  * which the (ts, event_id) pair ordering resolves identically on both
  * paths. */
class FunnelStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Stages = Seq("view", "click", "purchase")

  test("streaming funnel over out-of-order micro-batches == batch funnel (with ts ties)") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // ts collides across stages on purpose (i/3 truncation): every user
    // hits cross-stage exact-ts ties, exercising the event_id tie-break
    val all = rnd.shuffle((0 until 90).map { i =>
      (i % 5 + 1L, (i / 3) * 10L, i.toLong, Stages(rnd.nextInt(3)))
    }.toList)
    val ms = MemoryStream[(Long, Long, Long, String)]
    val results = scala.collection.concurrent.TrieMap.empty[Long, Seq[Option[Long]]]
    val q = FunnelStream.funnelUpdates(
      ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"), Stages)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[FunnelStream.FunnelRow], _: Long) =>
        ds.collect().foreach(r => results(r.user_id) = r.reach_ms)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString)
      .start()
    try {
      // the shuffle makes later-stage events routinely arrive before the
      // views that qualify them — the retroactive-qualification case
      all.grouped(30).foreach { b => ms.addData(b); q.processAllAvailable() }
      val batch = Relational.funnel(
        all.toDF("user", "ts", "eid", "etype"),
        Seq("user"), col("ts"), col("eid"),
        Stages.map(s => s -> (col("etype") === s)))
        .collect().map(r => r.getLong(0) ->
          Seq(Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
            .map(_.map(_.asInstanceOf[Long]))).toMap
      assert(results.toMap == batch)
      assert(results.nonEmpty)
    } finally q.stop()
  }

  test("chain walk: later stages re-qualify when an earlier stage's reach drops") {
    def k(ts: Long*) = ts.map(t => (t, t)).toSeq
    // click at 10 unqualified while first view is 20; late view at 5 flips it
    assert(FunnelStream.funnelOf(Seq(k(20), k(10), k())) ==
      Seq(Some(20L), None, None))
    assert(FunnelStream.funnelOf(Seq(k(5), k(10), k())) ==
      Seq(Some(5L), Some(10L), None))
    assert(FunnelStream.funnelOf(Seq(k(5), k(10), k(7, 30))) ==
      Seq(Some(5L), Some(10L), Some(30L)))
  }

  test("chain walk: exact-ts ties resolve by event_id like the batch ORDER BY") {
    // view (10, id=5) vs click (10, id=2): click sorts BEFORE the view, so
    // it does not qualify; the later click (10, id=7) does
    assert(FunnelStream.funnelOf(Seq(Seq((10L, 5L)), Seq((10L, 2L), (10L, 7L)), Seq())) ==
      Seq(Some(10L), Some(10L), None))
    assert(FunnelStream.funnelOf(Seq(Seq((10L, 5L)), Seq((10L, 2L)), Seq())) ==
      Seq(Some(10L), None, None))
  }
}
