package graft.cdc

import scala.util.Random

/** Seeded synthetic CDC event-log generator — plays the role of the
  * reference's `TransactionTestUtils` fixtures
  * (`EcommerceChangeStreamDocumentUtil.kt:21-68`, FIXTURES.md §2/§4).
  * Produces realistic transaction lifecycles plus the noise the pipeline
  * must tolerate: duplicate deliveries, ttl-marked migration rows,
  * same-timestamp ties, and out-of-order delivery.
  */
object EventGen {

  import EventCodes._

  private def pad(n: Int, w: Int): String = ("%0" + w + "d").format(n)

  /** Lifecycle templates: (eventCode sequence, per-step payload needs are
    * filled in `mkEvent`). */
  private val lifecycles: Seq[Seq[String]] = Seq(
    // happy path → NOTIFIED_OK (FIXTURES.md §4.1)
    Seq(Activated, AuthRequested, AuthCompleted, ClosureRequested, Closed,
      UserReceiptRequested, UserReceiptAdded),
    // KO closure → UNAUTHORIZED
    Seq(Activated, AuthRequested, AuthCompleted, ClosureRequested, ClosureFailed),
    // user cancel → CANCELED
    Seq(Activated, UserCanceled, Closed),
    // expiry after activation → EXPIRED_NOT_AUTHORIZED
    Seq(Activated, Expired),
    // closure error with retries, then recovery → CLOSED
    Seq(Activated, AuthRequested, AuthCompleted, ClosureRequested, ClosureError,
      ClosureRetried, Closed),
    // refund flow → REFUNDED
    Seq(Activated, AuthRequested, AuthCompleted, ClosureRequested, Closed,
      RefundRequested, RefundError, RefundRetried, Refunded),
    // notification error path
    Seq(Activated, AuthRequested, AuthCompleted, ClosureRequested, Closed,
      UserReceiptRequested, UserReceiptAddError, UserReceiptAddRetried, UserReceiptAdded),
    // synthetic closure
    Seq(Activated, AuthRequested, AuthCompleted, ClosureSynthetic)
  )

  def mkEvent(txId: String, code: String, seq: Int, tsMs: Long, rnd: Random): CdcEvent = {
    val iso = java.time.Instant.ofEpochMilli(tsMs).toString
    val base = CdcEvent(
      id = s"$txId-e${pad(seq, 3)}",
      transactionId = txId,
      eventCode = code,
      creationDate = iso,
      tsMs = tsMs)
    code match {
      case Activated =>
        base.copy(
          email = Some(s"user-$txId@example.test"),
          paymentNoticesJson = Some(
            s"""[{"paymentToken":"tok-$txId","rptId":"rpt-$txId","amount":${1000 + rnd.nextInt(90000)}}]"""),
          clientId = Some(if (rnd.nextBoolean()) "CHECKOUT" else "IO"),
          userId = if (rnd.nextBoolean()) Some(s"uid-${rnd.nextInt(1000)}") else None)
      case AuthRequested =>
        base.copy(
          paymentGateway = Some(if (rnd.nextBoolean()) "NPG" else "REDIRECT"),
          paymentTypeCode = Some("CP"),
          pspId = Some(s"psp-${rnd.nextInt(20)}"),
          fee = Some(50L + rnd.nextInt(500)),
          authorizationRequestId = Some(s"auth-$txId"))
      case AuthCompleted =>
        val npg = rnd.nextBoolean()
        base.copy(
          authorizationCode = if (rnd.nextInt(4) > 0) Some(s"ac-${rnd.nextInt(100000)}") else None,
          rrn = if (rnd.nextInt(4) > 0) Some(s"rrn-${rnd.nextInt(100000)}") else None,
          gatewayType = Some(if (npg) "NPG" else "REDIRECT"),
          operationResult = if (npg) Some(if (rnd.nextInt(5) > 0) "EXECUTED" else "FAILED") else None,
          paymentEndToEndId = if (npg && rnd.nextBoolean()) Some(s"e2e-${rnd.nextInt(100000)}") else None,
          outcome = if (!npg) Some(if (rnd.nextInt(5) > 0) "OK" else "KO") else None,
          gatewayErrorCode = if (rnd.nextInt(4) == 0) Some(s"EC${rnd.nextInt(10)}") else None)
      case Closed =>
        base.copy(
          wasCanceledByUser = Some(false),
          responseOutcome = Some(if (rnd.nextInt(5) > 0) "OK" else "KO"))
      case UserReceiptRequested | UserReceiptAdded =>
        base.copy(responseOutcome = Some(if (rnd.nextInt(5) > 0) "OK" else "KO"))
      case Expired =>
        // vary so the CANCELLATION_EXPIRED and plain EXPIRED mapping
        // branches (TransactionViewUpsertService.kt:455-461) are exercised
        base.copy(statusBeforeExpiration = Some(rnd.nextInt(3) match {
          case 0 => Status.Activated
          case 1 => Status.CancellationRequested
          case _ => Status.AuthorizationCompleted
        }))
      case ClosureError =>
        base.copy(closureErrorJson =
          Some(s"""{"errorType":"ERROR_RESPONSE","httpErrorCode":"5${rnd.nextInt(3)}0"}"""))
      case ClosureRetried =>
        base.copy(
          retryCount = Some(1 + rnd.nextInt(3)),
          closureErrorJson =
            if (rnd.nextBoolean()) Some("""{"errorType":"COMMUNICATION_ERROR"}""") else None)
      case RefundRetried | UserReceiptAddRetried =>
        base.copy(retryCount = Some(1 + rnd.nextInt(3)))
      case _ => base
    }
  }

  /** Generate `nTx` transactions' event logs in DELIVERY order, with noise:
    * duplicates, ttl rows, ts ties, and local shuffling (out-of-order
    * delivery). Deterministic for a given seed.
    */
  def generate(nTx: Int, seed: Long = 42L, noise: Boolean = true): Seq[CdcEvent] = {
    val rnd = new Random(seed)
    val events = (0 until nTx).flatMap { i =>
      val txId = "tx" + pad(i, 6)
      val lc = lifecycles(rnd.nextInt(lifecycles.size))
      var ts = 1700000000000L + rnd.nextInt(1000000).toLong
      val evs = lc.zipWithIndex.map { case (code, j) =>
        // occasional same-ts tie with the previous event
        if (!(noise && j > 0 && rnd.nextInt(8) == 0)) ts += 1000 + rnd.nextInt(60000)
        val e = mkEvent(txId, code, j, ts, rnd)
        // a Closed following UserCanceled is the user-cancel settlement —
        // it must carry wasCanceledByUser=true so the CANCELED status
        // branch (TransactionViewUpsertService.kt:489-497) is exercised
        if (code == Closed && j > 0 && lc(j - 1) == UserCanceled)
          e.copy(wasCanceledByUser = Some(true))
        else e
      }
      val withNoise =
        if (!noise) evs
        else {
          val dups = evs.filter(_ => rnd.nextInt(6) == 0) // duplicate deliveries
          val ttlRows = if (rnd.nextInt(10) == 0)
            Seq(mkEvent(txId, Activated, 99, ts + 1, rnd).copy(ttl = Some(3600L)))
          else Seq.empty
          rnd.shuffle(evs ++ dups ++ ttlRows) // out-of-order delivery
        }
      withNoise
    }
    events
  }
}
