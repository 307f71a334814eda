package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcDecode, CdcEvent, EventGen, ReferenceFold, TransactionView}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-10 VERDICT #4: the reference's OWN wire format — the MongoDB
  * change-stream envelope ([[CdcDecode.fromMongoChangeStream]]) — driven
  * through the full streaming ladder (decode → dedup → fold → view
  * merge) under shuffled multi-micro-batch delivery with redelivery and
  * wire pollution, exactly the way CdcStreamSpec drives the
  * Debezium/Kafka shapes. Decode parity alone (CdcDecodeSpec) does not
  * prove the envelope composes with the stateful ladder: op-mapping,
  * ttl-skip and clusterTime fallback all have to hold INSIDE a
  * micro-batch boundary too. */
class MongoLadderSpec extends SparkSpec {

  private def canonical(events: Seq[CdcEvent]): Map[String, TransactionView] =
    ReferenceFold.replay(
      events.filter(_.ttl.isEmpty).distinctBy(_.id).sortBy(e => (e.tsMs, e.id)))

  private def mongoEnv(doc: String, op: String, ct: Long = 8888L): String =
    s"""{"operationType":"$op","clusterTime":{"$$timestamp":{"t":$ct,"i":1}},""" +
      s""""fullDocument":$doc}"""

  test("mongo envelopes through the flatMapGroupsWithState ladder: shuffled " +
      "micro-batches, redelivery, ttl/bad-record pollution (O1 end-to-end)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // time-ordered wire (a change stream delivers by clusterTime):
    // batches below are consecutive time slices, disorder is
    // within-batch + redelivered tails — the CDC delivery contract the
    // Debezium ladder property test pins
    val events = EventGen.generate(nTx = 10, seed = 53L)
      .distinctBy(_.id).sortBy(e => (e.tsMs, e.id))
    val docs = CdcDecode.toJson(events.toDS()).collect().map(_.getString(0))
    val rnd = new scala.util.Random(7)
    // ops alternate update/replace on the wire to cover the replace →
    // update mapping (the change stream is ordered — a Mongo stream
    // delivers by clusterTime — so batches are consecutive slices;
    // disorder is WITHIN a batch plus redelivered tails, the same
    // delivery discipline as the Debezium ladder property test)
    val ops = Seq("insert", "update", "replace")
    val wire = docs.toSeq.zipWithIndex.map { case (doc, i) => mongoEnv(doc, ops(i % 3)) }
    val pollution = Seq(
      mongoEnv("""{"id":"ttlX","transactionId":"tttl","eventCode":"TRANSACTION_ACTIVATED_EVENT","tsMs":1000,"ttl":3600}""", "update"),
      """{"operationType":"delete","documentKey":{"_id":"gone"}}""",
      """{"operationType":"invalidate"}""",
      "{ not an envelope",
      mongoEnv("""{"tsMs":5,"eventCode":"X"}""", "insert"))
    val batches = wire.grouped(8).toSeq
    val ms = MemoryStream[String]
    val q = CdcStream.viewUpdates(
        CdcDecode.fromMongoChangeStream(ms.toDS().toDF("value"), jsonCol = "value"))
      .writeStream.format("memory").queryName("mongo_ladder")
      .outputMode("update").start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        // within-batch shuffle + redelivered tail of the previous batch
        // (at-least-once wire); pollution rides along in batch 0
        val redelivered = if (i > 0) batches(i - 1).takeRight(3) else Seq.empty
        val extra = if (i == 0) pollution else Seq.empty
        ms.addData(rnd.shuffle(b ++ redelivered ++ extra))
        q.processAllAvailable()
      }
      val got = spark.table("mongo_ladder").as[TransactionView]
        .collect().map(v => v.transactionId -> v).toMap
      assert(got == canonical(events),
        "mongo-decoded ladder views diverge from the canonical replay")
    } finally q.stop()
  }

  test("mongo envelopes through the foreachBatch cogroup merge: multi-batch " +
      "delivery reaches the same ViewStore state as the canonical replay") {
    import spark.implicits._
    val events = EventGen.generate(nTx = 6, seed = 59L)
      .distinctBy(_.id).sortBy(e => (e.tsMs, e.id))
    val docs = CdcDecode.toJson(events.toDS()).collect().map(_.getString(0))
    val wire = docs.toSeq.zipWithIndex.map { case (doc, i) =>
      mongoEnv(doc, Seq("insert", "update", "replace")(i % 3))
    }
    val viewPath = java.nio.file.Files
      .createTempDirectory("graft-mongo-ladder").toString + "/views"
    val rnd = new scala.util.Random(13)
    val slices = wire.grouped(7).toSeq
    slices.zipWithIndex.foreach { case (b, i) =>
      // within-batch shuffle + redelivered tail — ordered stream,
      // at-least-once delivery
      val redelivered = if (i > 0) slices(i - 1).takeRight(2) else Seq.empty
      CdcStream.mergeBatchIntoParquet(spark,
        CdcDecode.fromMongoChangeStream(rnd.shuffle(b ++ redelivered).toDF("json")),
        viewPath, batchId = i.toLong)
    }
    val got = ViewStore.read(spark, viewPath).get.as[TransactionView]
      .collect().map(v => v.transactionId -> v).toMap
    assert(got == canonical(events),
      "mongo-decoded cogroup merge diverges from the canonical replay")
  }
}
