package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** O6 typed-decode tests: JSON round-trip fidelity and bad-record skip. */
class CdcDecodeSpec extends SparkSpec {

  import spark.implicits._

  test("toJson -> fromJson round-trips generated events exactly") {
    val events = EventGen.generate(nTx = 20, seed = 13L).distinctBy(_.id)
    val back = CdcDecode.fromJson(CdcDecode.toJson(events.toDS()))
      .collect().map(e => e.id -> e).toMap
    assert(back.keySet == events.map(_.id).toSet)
    events.foreach(e => assert(back(e.id) == e, s"event ${e.id} did not round-trip"))
  }

  test("corrupt and envelope-incomplete records are dropped, stream continues") {
    val good = EventGen.generate(nTx = 3, seed = 9L, noise = false)
    val wire = CdcDecode.toJson(good.toDS()).collect().map(_.getString(0))
    val polluted = (wire.toSeq :+
      "{ not json at all" :+ // unparseable
      """{"tsMs": 12, "eventCode": "X"}""" :+ // missing id/transactionId
      "").toDF("json")
    val out = CdcDecode.fromJson(polluted).collect()
    assert(out.length == good.size)
    assert(out.map(_.id).toSet == good.map(_.id).toSet)
  }

  test("missing optional envelope fields take the model defaults (operationType)") {
    val out = CdcDecode.fromJson(Seq(
      """{"id":"e1","transactionId":"t1","eventCode":"TRANSACTION_ACTIVATED_EVENT","tsMs":1000}""")
      .toDF("json")).collect()
    assert(out.length == 1 && out.head.operationType == "insert")
  }

  test("unknown event codes are skipped by replay, not materialized as phantom rows") {
    val known = EventGen.generate(nTx = 2, seed = 1L, noise = false)
    val bogus = CdcEvent("bx", "tx-bogus", "TRANSACTION_BOGUS_EVENT",
      java.time.Instant.ofEpochMilli(1000).toString, 1000L)
    val out = ViewReplay.replay((known :+ bogus).toDF())
      .select("transactionId").collect().map(_.getString(0)).toSet
    assert(!out.contains("tx-bogus"))
    assert(out == known.map(_.transactionId).toSet)
  }

  test("decode composes with the replay pipeline end-to-end") {
    val events = EventGen.generate(nTx = 8, seed = 41L)
    val viaWire = ViewReplay.replay(
      CdcDecode.fromJson(CdcDecode.toJson(events.toDS())).toDF())
      .as[TransactionView].collect().map(v => v.transactionId -> v).toMap
    val direct = ViewReplay.replay(events.toDF())
      .as[TransactionView].collect().map(v => v.transactionId -> v).toMap
    assert(viaWire == direct)
  }
}
