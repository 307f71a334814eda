package graft.cdc

import graft.SparkSpec

/** The typed Aggregator path must agree with the untyped max(struct) path
  * (ViewReplay) on real generated logs, including the explicit-unset case. */
class LastWriteAggSpec extends SparkSpec {

  import spark.implicits._

  test("typed last-write agg == ViewReplay column on generated logs") {
    val events = EventGen.generate(nTx = 40, seed = 77L)
      .filter(e => e.ttl.isEmpty).distinctBy(_.id)
    val typed = events.toDS()
      .groupByKey(_.transactionId)
      .agg(
        LastWriteAgg.column("authorizationCode")(
          _.eventCode == EventCodes.AuthCompleted)(_.authorizationCode),
        LastWriteAgg.column("closureErrorJson")(e =>
          e.eventCode == EventCodes.ClosureError ||
            (e.eventCode == EventCodes.ClosureRetried && e.closureErrorJson.isDefined) ||
            e.eventCode == EventCodes.Closed ||
            e.eventCode == EventCodes.ClosureSynthetic)(_.closureErrorJson))
      .collect().map { case (tx, ac, cej) => tx -> ((ac, cej)) }.toMap
    val untyped = ViewReplay.replay(events.toDF())
      .select("transactionId", "authorizationCode", "closureErrorJson")
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (tx, v) =>
      assert(v == untyped(tx), s"tx=$tx typed=$v untyped=${untyped(tx)}")
    }
  }

  test("explicit unset beats earlier set; absent stays None") {
    def ev(id: String, ts: Long, code: String, cej: Option[String] = None) =
      CdcEvent(id, "t1", code, java.time.Instant.ofEpochMilli(ts).toString, ts,
        closureErrorJson = cej)
    val wrote = Seq(
      ev("e1", 1000, EventCodes.ClosureError, Some("""{"e":1}""")),
      ev("e2", 2000, EventCodes.Closed)) // Closed unsets closureErrorData
    val agg = LastWriteAgg.column("cej")(e =>
      e.eventCode == EventCodes.ClosureError || e.eventCode == EventCodes.Closed)(
      _.closureErrorJson)
    val out = wrote.toDS().groupByKey(_.transactionId).agg(agg).collect()
    assert(out.head._2.isEmpty) // latest write is an explicit unset
    val never = Seq(ev("e3", 1000, EventCodes.Activated)).toDS()
      .groupByKey(_.transactionId).agg(agg).collect()
    assert(never.head._2.isEmpty) // never written: absent
  }
}
