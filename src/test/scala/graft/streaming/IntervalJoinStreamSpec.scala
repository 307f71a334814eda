package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Relational

/** Stream–stream interval join ≡ batch binned range join: the q60 shape
  * (follow-on activity within a window of each signup) replayed through
  * MemoryStreams in micro-batches must produce exactly the batch pairs. */
class IntervalJoinStreamSpec extends SparkSpec {

  import spark.implicits._

  private val windowMs = 100L

  // (user, ts, id): signups and follows with in-window, boundary (ts+100
  // excluded), and out-of-window cases across users
  private val rnd = new scala.util.Random(11)
  private val signups = (1 to 20).map(i =>
    (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong))
  private val follows = (1 to 80).map(i =>
    (rnd.nextInt(4).toLong, rnd.nextInt(600).toLong, 1000L + i))

  private def batchPairs: Set[(Long, Long)] = {
    val s = signups.toDF("user_id", "s_ts", "s_event_id")
    val f = follows.toDF("user_id", "f_ts", "value_c")
    Relational.binnedRangeJoin(s, f, "user_id", "s_ts", "f_ts", windowMs)
      .select("s_event_id", "value_c").as[(Long, Long)].collect().toSet
  }

  private def streamPairs(nBatches: Int): Set[(Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val mf = MemoryStream[(Long, Long, Long)]
    val out = scala.collection.mutable.Set.empty[(Long, Long)]
    // lateness must cover the shuffled delivery: batches arrive in
    // arbitrary event-time order, so anything below the full ts range
    // would let the watermark drop genuinely-matching late rows
    val joined = IntervalJoinStream.followOn(
      ms.toDF().toDF("user_id", "s_ts", "s_event_id"),
      mf.toDF().toDF("user_id", "f_ts", "value_c"),
      windowMs, lateness = "1 hour")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("s_event_id", "value_c").as[(Long, Long)].collect()
          .foreach(out += _)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ij-ckpt").toString)
      .start()
    try {
      // shuffled interleaved delivery: both sides arrive out of order
      val sb = rnd.shuffle(signups).grouped(math.max(signups.size / nBatches, 1)).toSeq
      val fb = rnd.shuffle(follows).grouped(math.max(follows.size / nBatches, 1)).toSeq
      sb.zipAll(fb, Seq.empty, Seq.empty).foreach { case (s, f) =>
        if (s.nonEmpty) ms.addData(s)
        if (f.nonEmpty) mf.addData(f)
        q.processAllAvailable()
      }
      out.toSet
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch binned range join") {
    val want = batchPairs
    assert(want.nonEmpty)
    assert(streamPairs(4) == want)
  }

  test("single-batch delivery also matches (no cross-batch state needed)") {
    assert(streamPairs(1) == batchPairs)
  }

  test("left_outer: unmatched signups emit once with nulls after the watermark passes") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val mf = MemoryStream[(Long, Long, Long)]
    val out = scala.collection.mutable.Set.empty[(Long, Option[Long])]
    val q = IntervalJoinStream.followOn(
      ms.toDF().toDF("user_id", "s_ts", "s_event_id"),
      mf.toDF().toDF("user_id", "f_ts", "value_c"),
      windowMs, lateness = "0 seconds", joinType = "left_outer")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          out += ((r.getLong(1), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ijo-ckpt").toString)
      .start()
    try {
      // signup 1 matched, signup 2 unmatched; horizon not yet passed
      ms.addData(Seq((1L, 1000L, 1L), (2L, 1000L, 2L)))
      mf.addData(Seq((1L, 1050L, 77L)))
      q.processAllAvailable()
      assert(!out.exists(_._1 == 2L),
        "unmatched signup must NOT emit before its window closes")
      // sentinels push BOTH watermarks past 1000 + windowMs
      ms.addData(Seq((9L, 100000L, 9L)))
      mf.addData(Seq((9L, 100000L, 99L)))
      q.processAllAvailable()
      // one more batch: watermark updates take effect on the next trigger
      ms.addData(Seq((9L, 100001L, 10L)))
      mf.addData(Seq((9L, 100001L, 98L)))
      q.processAllAvailable()
      assert(out.contains((1L, Some(77L))), s"matched pair missing: $out")
      assert(out.contains((2L, None)), s"unmatched signup must emit nulls: $out")
    } finally q.stop()
  }

  test("window boundary: ts + window is excluded, ts itself included") {
    implicit val ctx = spark.sqlContext
    val s = Seq((1L, 100L, 1L)).toDF("user_id", "s_ts", "s_event_id")
    val f = Seq((1L, 100L, 10L), (1L, 199L, 11L), (1L, 200L, 12L), (1L, 99L, 13L))
      .toDF("user_id", "f_ts", "value_c")
    val got = Relational.binnedRangeJoin(s, f, "user_id", "s_ts", "f_ts", windowMs)
      .select("value_c").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }
}
