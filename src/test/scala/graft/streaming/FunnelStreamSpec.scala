package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Relational

/** The streaming funnel must converge, over shuffled micro-batches (late
  * stage-0 events retroactively qualifying later stages), to the batch
  * funnel on the same data. */
class FunnelStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Stages = Seq("view", "click", "purchase")

  test("streaming funnel over out-of-order micro-batches == batch funnel") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // unique ts per event (the documented no-cross-stage-ties contract)
    val all = rnd.shuffle((0 until 60).map { i =>
      (i % 5 + 1L, i * 7L + 1, Stages(rnd.nextInt(3)))
    }.toList)
    val ms = MemoryStream[(Long, Long, String)]
    val results = scala.collection.concurrent.TrieMap.empty[Long, Seq[Option[Long]]]
    val q = FunnelStream.funnelUpdates(
      ms.toDF().toDF("user_id", "ts_ms", "event_type"), Stages)
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
      all.grouped(20).foreach { b => ms.addData(b); q.processAllAvailable() }
      val batch = Relational.funnel(
        all.toDF("user", "ts", "etype").withColumn("eid", col("ts")),
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
    // click at 10 unqualified while first view is 20; late view at 5 flips it
    assert(FunnelStream.funnelOf(Seq(Seq(20L), Seq(10L), Seq.empty)) ==
      Seq(Some(20L), None, None))
    assert(FunnelStream.funnelOf(Seq(Seq(5L), Seq(10L), Seq.empty)) ==
      Seq(Some(5L), Some(10L), None))
    assert(FunnelStream.funnelOf(Seq(Seq(5L), Seq(10L), Seq(7L, 30L))) ==
      Seq(Some(5L), Some(10L), Some(30L)))
  }
}
