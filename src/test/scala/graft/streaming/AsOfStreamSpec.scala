package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** The streaming as-of enrichment must emit each left event exactly once,
  * with the SAME match the batch/native as-of join computes, over shuffled
  * micro-batches where qualifying rights routinely arrive after their
  * lefts — plus the state-compaction and tie contracts. */
class AsOfStreamSpec extends SparkSpec {

  import spark.implicits._

  test("streaming as-of over out-of-order micro-batches == brute-force as-of (ties incl.)") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    // base offset keeps every event time clear of the initial 0 watermark
    val base = 1000000L
    val lefts = (1 to 120).map(i =>
      (i % 6 + 1L, base + rnd.nextInt(50) * 10L, i.toLong))          // (key, ts, id)
    val rights = (1 to 120).map(i =>
      (i % 6 + 1L, base + rnd.nextInt(50) * 10L, 1000L + i, rnd.nextInt(90).toLong)) // + value
    val lMs = MemoryStream[(Long, Long, Long)]
    val rMs = MemoryStream[(Long, Long, Long, Long)]
    val got = scala.collection.concurrent.TrieMap.empty[Long, (Option[Long], Option[Long], Option[Long])]
    val q = AsOfStream.asofUpdates(
      lMs.toDF().toDF("key", "ts_ms", "id"),
      rMs.toDF().toDF("key", "ts_ms", "id", "value"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[AsOfStream.AsOfMatch], _: Long) =>
        ds.collect().foreach { m =>
          assert(!got.contains(m.id), s"left ${m.id} emitted twice")
          got(m.id) = (m.match_ts, m.match_id, m.match_value)
        }
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-asof-ckpt").toString)
      .start()
    try {
      // interleave shuffled slices of both sides: rights often land after
      // the lefts they qualify — emission must wait for the watermark
      val lSlices = rnd.shuffle(lefts.toList).grouped(40).toSeq
      val rSlices = rnd.shuffle(rights.toList).grouped(40).toSeq
      lSlices.zipAll(rSlices, Nil, Nil).foreach { case (lb, rb) =>
        if (lb.nonEmpty) lMs.addData(lb)
        if (rb.nonEmpty) rMs.addData(rb)
        q.processAllAvailable()
      }
      // push the watermark past every buffered event (30-day delay + TTL)
      val flushTs = 100L * 24 * 3600 * 1000
      lMs.addData(Seq((999L, flushTs, 999999L)))
      q.processAllAvailable()
      // one more micro-batch so the new watermark reaches the stateful op
      rMs.addData(Seq((999L, flushTs + 1, 999998L, 0L)))
      q.processAllAvailable()

      val want = lefts.map { case (k, lts, lid) =>
        val m = rights.filter(r => r._1 == k && r._2 <= lts)
          .sortBy(r => (r._2, r._3)).lastOption
        lid -> ((m.map(_._2), m.map(_._3), m.map(_._4)))
      }.toMap
      assert(got.toMap.view.filterKeys(_ != 999999L).toMap == want)
    } finally q.stop()
  }

  test("TTL: an idle key holding only a final right candidate is evicted; pending lefts are not") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val onlyRight = AsOfStream.AsOfBuf(Seq.empty, Seq((1000L, 1L, 5L)))
    // watermark far past ts + TTL → timeout fires → state must be REMOVED
    val s1 = TestGroupState.create[AsOfStream.AsOfBuf](
      Optional.of(onlyRight), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(1000L + AsOfStream.StateTtlMs + 1),
      hasTimedOut = true)
    assert(AsOfStream.updateKey(1L, Iterator.empty, s1).isEmpty)
    assert(s1.isRemoved, "expired right-only state must be evicted")

    // same watermark but a pending (future) left → state survives
    val withLeft = AsOfStream.AsOfBuf(
      Seq((1000L + AsOfStream.StateTtlMs + 100, 9L)), Seq((1000L, 1L, 5L)))
    val s2 = TestGroupState.create[AsOfStream.AsOfBuf](
      Optional.of(withLeft), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(1000L + AsOfStream.StateTtlMs + 1),
      hasTimedOut = true)
    AsOfStream.updateKey(1L, Iterator.empty, s2)
    assert(!s2.isRemoved && s2.exists)
  }

  test("bestMatch: latest at-or-before wins, exact-ts ties to the highest id") {
    val rights = Seq((10L, 1L, 100L), (10L, 5L, 200L), (20L, 2L, 300L))
    assert(AsOfStream.bestMatch(rights, 10L) == Some((10L, 5L, 200L)))
    assert(AsOfStream.bestMatch(rights, 25L) == Some((20L, 2L, 300L)))
    assert(AsOfStream.bestMatch(rights, 5L) == None)
  }

  test("flush: matured lefts emitted in order; final rights collapse to one candidate") {
    val buf = AsOfStream.AsOfBuf(
      lefts = Seq((30L, 2L), (10L, 1L), (50L, 3L)),
      rights = Seq((5L, 1L, 10L), (8L, 2L, 20L), (40L, 3L, 30L)))
    val (emitted, next) = AsOfStream.flush(buf, watermarkMs = 31L)
    assert(emitted.map(_._2) == Seq(1L, 2L)) // (10,..) before (30,..); 50 pending
    assert(emitted.map(_._3.map(_._3)) == Seq(Some(20L), Some(20L)))
    assert(next.lefts == Seq((50L, 3L)))
    // rights below the watermark collapsed to the latest (8,2,20); live right kept
    assert(next.rights == Seq((8L, 2L, 20L), (40L, 3L, 30L)))
    // maturity is strict: a left AT the watermark stays pending
    val (none, same) = AsOfStream.flush(next, watermarkMs = 50L)
    assert(none.isEmpty && same.lefts == Seq((50L, 3L)))
  }
}
