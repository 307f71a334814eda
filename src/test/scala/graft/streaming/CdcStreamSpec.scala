package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.cdc._

/** Streaming pipeline tests with MemoryStream (engine test plan SURVEY.md §5
  * item 4: dedup / late-data / resume semantics). */
class CdcStreamSpec extends SparkSpec {

  private def canonical(events: Seq[CdcEvent]): Map[String, TransactionView] =
    ReferenceFold.replay(
      events.filter(_.ttl.isEmpty).distinctBy(_.id).sortBy(e => (e.tsMs, e.id)))

  test("flatMapGroupsWithState emits canonical views for a single batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[CdcEvent]
    val q = CdcStream.viewUpdates(ms.toDS()).writeStream
      .format("memory").queryName("views_single").outputMode("update").start()
    try {
      val events = EventGen.generate(nTx = 12, seed = 11L)
      ms.addData(events)
      q.processAllAvailable()
      val got = spark.table("views_single").as[TransactionView]
        .collect().map(v => v.transactionId -> v).toMap
      assert(got == canonical(events))
    } finally q.stop()
  }

  test("duplicate redelivery in a later micro-batch is a no-op (O7 dedup)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[CdcEvent]
    val q = CdcStream.viewUpdates(ms.toDS()).writeStream
      .format("memory").queryName("views_dup").outputMode("update").start()
    try {
      val events = EventGen.generate(nTx = 5, seed = 3L, noise = false)
      ms.addData(events)
      q.processAllAvailable()
      val n1 = spark.table("views_dup").count()
      ms.addData(events.take(3)) // redelivery of already-seen event ids
      q.processAllAvailable()
      val n2 = spark.table("views_dup").count()
      assert(n1 == n2, "redelivered duplicates must not emit updates")
    } finally q.stop()
  }

  test("late event in a later batch: status rejected, enrichment applied") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[CdcEvent]
    val q = CdcStream.viewUpdates(ms.toDS()).writeStream
      .format("memory").queryName("views_late").outputMode("update").start()
    try {
      val t = "tx-late"
      def ev(code: String, seq: Int, ts: Long, mut: CdcEvent => CdcEvent = identity) =
        mut(CdcEvent(s"$t-e$seq", t, code, java.time.Instant.ofEpochMilli(ts).toString, ts))
      ms.addData(Seq(
        ev(EventCodes.Activated, 0, 1000),
        ev(EventCodes.Closed, 2, 5000,
          _.copy(wasCanceledByUser = Some(false), responseOutcome = Some("OK")))))
      q.processAllAvailable()
      // late arrival, timestamped in the past
      ms.addData(Seq(ev(EventCodes.AuthRequested, 1, 2000,
        _.copy(pspId = Some("psp-late"), fee = Some(5L)))))
      q.processAllAvailable()
      val rows = spark.table("views_late").as[TransactionView].collect()
      val last = rows.last
      assert(last.status.contains(Status.Closed)) // stale status rejected
      assert(last.pspId.contains("psp-late")) // enrichment landed
      assert(last.lastProcessedEventAt.contains(5000L))
    } finally q.stop()
  }

  test("random micro-batch splits converge to the canonical view (property)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(1000L + trial)
      val events = EventGen.generate(nTx = 8, seed = 500L + trial)
      // split the delivery stream at 1-3 random points; late cross-batch
      // delivery (shuffled tx timelines) exercises both the CAS ladder and
      // the wide-watermark guarantee that late events are NOT dropped
      val cuts = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(events.size + 1)).sorted
      val batches = (0 +: cuts :+ events.size).distinct.sliding(2)
        .map { case Seq(a, b) => events.slice(a, b) }.filter(_.nonEmpty).toSeq
      val ms = MemoryStream[CdcEvent]
      // capture per-batch emissions with their batch id: memory-sink row
      // order is not deterministic, foreachBatch order is
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, TransactionView)]
      val q = CdcStream.viewUpdates(ms.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TransactionView], id: Long) =>
          emitted.synchronized { emitted ++= b.collect().map(id -> _) }
          ()
        }
        .start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        val got = emitted.synchronized {
          emitted.sortBy(_._1).map(_._2).groupBy(_.transactionId)
            .map { case (k, vs) => k -> vs.last }
        }
        // expected: the operator's contract — per batch, (ts,id)-ordered
        // fold with cross-batch duplicate skip
        val expected = events.filter(_.ttl.isEmpty).distinctBy(_.id)
          .groupBy(_.transactionId).map { case (tx, _) =>
            val perBatch = batches.map(_.filter(e =>
              e.transactionId == tx && e.ttl.isEmpty))
            var seen = Set.empty[String]
            var view: Option[TransactionView] = None
            perBatch.foreach { b =>
              b.sortBy(e => (e.tsMs, e.id)).foreach { e =>
                if (!seen(e.id)) { seen += e.id; view = Some(ReferenceFold.processOne(view, e)) }
              }
            }
            tx -> view.get
          }
        assert(got == expected, s"trial=$trial")
      } finally q.stop()
    }
  }

  test("foreachBatch parquet merge across micro-batches equals canonical replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-view").toString
    val viewPath = dir + "/transactions-view"
    val events = EventGen.generate(nTx = 15, seed = 21L)
    val ordered = events.distinctBy(_.id).sortBy(e => (e.tsMs, e.id))
    ordered.grouped(30).foreach { batch =>
      CdcStream.mergeBatchIntoParquet(spark, batch.toDS(), viewPath)
    }
    val got = spark.read.parquet(viewPath).as[TransactionView]
      .collect().map(v => v.transactionId -> v).toMap
    assert(got == canonical(events))
  }
}
