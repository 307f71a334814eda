package graft.cdc

import graft.SparkSpec

/** Scenario tests mirroring the reference's case matrix
  * (`TransactionViewUpsertServiceTest.kt`, FIXTURES.md §4), asserted against
  * both the sequential fold and the distributed replay.
  */
class ViewReplaySpec extends SparkSpec {

  import EventCodes._

  private def ev(
      txId: String, code: String, seq: Int, tsMs: Long,
      mut: CdcEvent => CdcEvent = identity): CdcEvent =
    mut(CdcEvent(
      id = s"$txId-e$seq", transactionId = txId, eventCode = code,
      creationDate = java.time.Instant.ofEpochMilli(tsMs).toString, tsMs = tsMs))

  private def replaySpark(events: Seq[CdcEvent]): Map[String, TransactionView] = {
    import spark.implicits._
    ViewReplay.replay(events.toDF()).as[TransactionView]
      .collect().map(v => v.transactionId -> v).toMap
  }

  private def replayFoldOrdered(events: Seq[CdcEvent]): Map[String, TransactionView] = {
    val clean = events
      .filter(e => Set("insert", "update", "replace").contains(e.operationType))
      .filter(_.ttl.isEmpty)
      .distinctBy(_.id)
      .sortBy(e => (e.tsMs, e.id))
    ReferenceFold.replay(clean)
  }

  test("happy path ends NOTIFIED_OK with full enrichment (FIXTURES §4.1)") {
    val t = "tx-happy"
    val events = Seq(
      ev(t, Activated, 0, 1000, _.copy(email = Some("e@x"), clientId = Some("CHECKOUT"),
        paymentNoticesJson = Some("""[{"amount":100}]"""), userId = Some("u1"))),
      ev(t, AuthRequested, 1, 2000, _.copy(paymentGateway = Some("NPG"),
        paymentTypeCode = Some("CP"), pspId = Some("psp1"), fee = Some(150L),
        authorizationRequestId = Some("ar1"))),
      ev(t, AuthCompleted, 2, 3000, _.copy(authorizationCode = Some("ac1"),
        rrn = Some("r1"), gatewayType = Some("NPG"), operationResult = Some("EXECUTED"),
        paymentEndToEndId = Some("e2e1"))),
      ev(t, ClosureRequested, 3, 4000),
      ev(t, Closed, 4, 5000, _.copy(wasCanceledByUser = Some(false),
        responseOutcome = Some("OK"))),
      ev(t, UserReceiptRequested, 5, 6000, _.copy(responseOutcome = Some("OK"))),
      ev(t, UserReceiptAdded, 6, 7000, _.copy(responseOutcome = Some("OK"))))
    for (view <- Seq(replayFoldOrdered(events)(t), replaySpark(events)(t))) {
      assert(view.status.contains(Status.NotifiedOk))
      assert(view.lastProcessedEventAt.contains(7000L))
      assert(view.email.contains("e@x"))
      assert(view.pspId.contains("psp1"))
      assert(view.feeTotal.contains(150L))
      assert(view.authorizationCode.contains("ac1"))
      assert(view.gatewayAuthorizationStatus.contains("EXECUTED"))
      assert(view.endToEndId.contains("e2e1"))
      assert(view.sendPaymentResultOutcome.contains("OK"))
      assert(view._class == TransactionView.ClassName)
    }
  }

  test("out-of-order: stale AUTH_REQUESTED after CLOSED keeps status, lands enrichment (§4.2)") {
    val t = "tx-ooo"
    val events = Seq(
      ev(t, Activated, 0, 1000, _.copy(email = Some("e@x"))),
      ev(t, Closed, 2, 5000, _.copy(wasCanceledByUser = Some(false),
        responseOutcome = Some("OK"))),
      // delivered last but timestamped BETWEEN the two above
      ev(t, AuthRequested, 1, 2000, _.copy(pspId = Some("psp9"), fee = Some(77L))))
    // fold in delivery order == the reference's racy arrival processing
    val arrival = ReferenceFold.replay(events)(t)
    assert(arrival.status.contains(Status.Closed)) // stale status rejected
    assert(arrival.pspId.contains("psp9")) // enrichment still lands
    assert(arrival.feeTotal.contains(77L))
    // distributed replay (event-time order) agrees
    val dist = replaySpark(events)(t)
    assert(dist.status.contains(Status.Closed))
    assert(dist.pspId.contains("psp9"))
    assert(dist.lastProcessedEventAt.contains(5000L))
  }

  test("first event not activation creates the view (upsert path, §4.3)") {
    val t = "tx-up"
    val view = replaySpark(Seq(ev(t, ClosureRequested, 0, 1000)))(t)
    assert(view.status.contains(Status.ClosureRequested))
    assert(view.email.isEmpty)
    assert(view._class == TransactionView.ClassName)
  }

  test("duplicate delivery processed once; ttl rows skipped (§4.4/§4.5)") {
    val t = "tx-dup"
    val e1 = ev(t, Activated, 0, 1000, _.copy(email = Some("e@x")))
    val e2 = ev(t, UserCanceled, 1, 2000)
    val ttl = ev(t, Closed, 2, 3000, _.copy(ttl = Some(60L),
      wasCanceledByUser = Some(false), responseOutcome = Some("OK")))
    val view = replaySpark(Seq(e1, e1, e2, e2, e1, ttl))(t)
    assert(view.status.contains(Status.CancellationRequested))
    assert(view.lastProcessedEventAt.contains(2000L))
  }

  test("expired mapping sweep (§4.7, reference TransactionViewUpsertService.kt:455-461)") {
    val cases = Map(
      Status.Activated -> Status.ExpiredNotAuthorized,
      Status.CancellationRequested -> Status.CancellationExpired,
      Status.AuthorizationRequested -> Status.Expired,
      Status.Closed -> Status.Expired)
    cases.foreach { case (before, expected) =>
      val t = s"tx-exp-$before"
      val view = replaySpark(Seq(
        ev(t, Activated, 0, 1000),
        ev(t, Expired, 1, 2000, _.copy(statusBeforeExpiration = Some(before)))))(t)
      assert(view.status.contains(expected), s"statusBeforeExpiration=$before")
    }
  }

  test("closed mapping: canceled/OK/KO; closureErrorData unset; NOT_RECEIVED (§4.8)") {
    def closed(t: String, canceled: Boolean, outcome: String) = Seq(
      ev(t, ClosureError, 0, 1000, _.copy(closureErrorJson = Some("""{"errorType":"X"}"""))),
      ev(t, Closed, 1, 2000, _.copy(wasCanceledByUser = Some(canceled),
        responseOutcome = Some(outcome))))
    val vC = replaySpark(closed("tc", canceled = true, "OK"))("tc")
    assert(vC.status.contains(Status.Canceled))
    val vOk = replaySpark(closed("to", canceled = false, "OK"))("to")
    assert(vOk.status.contains(Status.Closed))
    assert(vOk.closureErrorJson.isEmpty) // $unset by CLOSED
    assert(vOk.sendPaymentResultOutcome.contains(Status.NotReceived))
    val vKo = replaySpark(closed("tk", canceled = false, "KO"))("tk")
    assert(vKo.status.contains(Status.Unauthorized))
  }

  test("auth completed null handling: unset code/rrn/errorCode; NPG vs REDIRECT (§4.9)") {
    val t1 = "tx-npg"
    val v1 = replaySpark(Seq(
      ev(t1, AuthCompleted, 0, 1000, _.copy(gatewayType = Some("NPG"),
        operationResult = Some("EXECUTED"), authorizationCode = None, rrn = None,
        gatewayErrorCode = None))))(t1)
    assert(v1.gatewayAuthorizationStatus.contains("EXECUTED"))
    assert(v1.authorizationCode.isEmpty && v1.rrn.isEmpty && v1.authorizationErrorCode.isEmpty)
    assert(v1.endToEndId.isEmpty)
    val t2 = "tx-red"
    val v2 = replaySpark(Seq(
      ev(t2, AuthCompleted, 0, 1000, _.copy(gatewayType = Some("REDIRECT"),
        outcome = Some("KO"), gatewayErrorCode = Some("E7")))))(t2)
    assert(v2.gatewayAuthorizationStatus.contains("KO"))
    assert(v2.authorizationErrorCode.contains("E7"))
  }

  test("same-timestamp tie: first processed wins the status (documented divergence rule)") {
    val t = "tx-tie"
    val events = Seq(
      ev(t, Activated, 0, 1000),
      ev(t, UserCanceled, 1, 5000), // same ts, lower id → processed first, wins
      ev(t, ClosureRequested, 2, 5000)) // same ts → status rejected
    for (view <- Seq(replayFoldOrdered(events)(t), replaySpark(events)(t)))
      assert(view.status.contains(Status.CancellationRequested))
  }

  test("watermark-only retry events advance lastProcessedEventAt but not status") {
    val t = "tx-retry"
    val view = replaySpark(Seq(
      ev(t, Activated, 0, 1000),
      ev(t, RefundRetried, 1, 9000, _.copy(retryCount = Some(2)))))(t)
    assert(view.status.contains(Status.Activated))
    assert(view.lastProcessedEventAt.contains(9000L))
    // and a later same-ts status event is now rejected
    val view2 = replaySpark(Seq(
      ev(t, Activated, 0, 1000),
      ev(t, RefundRetried, 1, 9000),
      ev(t, Refunded, 2, 9000)))(t)
    assert(view2.status.contains(Status.Activated))
  }
}
