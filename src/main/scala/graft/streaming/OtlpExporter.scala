package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** OTLP/HTTP JSON exporter for the tracing side-channel — wire-format
  * parity with the reference's OTel span emission
  * (`utils/ViewUpdateTracingUtils.kt:23-37` sets eventCode/outcome span
  * attributes per upsert) WITHOUT any OTel SDK jar: OTLP's HTTP binding
  * has a stable JSON encoding (`POST /v1/traces`), and the JDK's
  * `java.net.http.HttpClient` speaks it natively.
  *
  * One span per [[TraceLog.Record]] (batch-granularity, see TraceLog's
  * scaladoc for why per-event spans don't survive 100 TB), attribute keys
  * matching the reference's span attributes. Ids are deterministic:
  * traceId = md5(batchId) (all records of a micro-batch share one trace),
  * spanId = first 8 bytes of md5(batchId|eventCode|outcome) — replays
  * produce identical ids, so a collector dedups instead of double-counting.
  *
  * Export is fire-and-forget from the driver (one small POST per
  * micro-batch — metadata volume, not data volume); failures are returned,
  * not thrown, so a collector outage never kills the stream.
  */
object OtlpExporter {

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** traceId: 32 hex chars (16 bytes), shared by a batch's records. */
  private[streaming] def traceId(batchId: Long): String = md5hex(s"graft-batch-$batchId")

  /** spanId: 16 hex chars (8 bytes), deterministic per record key. */
  private[streaming] def spanId(r: TraceLog.Record): String =
    md5hex(s"${r.batchId}|${r.eventCode}|${r.outcome}").take(16)

  /** The OTLP/HTTP JSON body for one micro-batch's records. Pure —
    * unit-testable with no collector. Span start = end = the emission
    * time in unix nanos (point-in-time aggregate spans). */
  def toOtlpJson(records: Seq[TraceLog.Record], serviceName: String = "graft-cdc"): String = {
    val spans = records.map { r =>
      val ns = r.atMs * 1000000L
      s"""{"traceId":"${traceId(r.batchId)}","spanId":"${spanId(r)}",""" +
        s""""name":"view.merge","kind":1,""" +
        s""""startTimeUnixNano":"$ns","endTimeUnixNano":"$ns","attributes":[""" +
        s"""{"key":"eventCode","value":{"stringValue":"${esc(r.eventCode)}"}},""" +
        s"""{"key":"outcome","value":{"stringValue":"${esc(r.outcome)}"}},""" +
        s"""{"key":"count","value":{"intValue":"${r.count}"}},""" +
        s"""{"key":"batchId","value":{"intValue":"${r.batchId}"}}]}"""
    }.mkString(",")
    s"""{"resourceSpans":[{"resource":{"attributes":[""" +
      s"""{"key":"service.name","value":{"stringValue":"${esc(serviceName)}"}}]},""" +
      s""""scopeSpans":[{"scope":{"name":"graft.trace.merge"},"spans":[$spans]}]}]}"""
  }

  /** POST a batch's records to `endpoint` (e.g.
    * `http://collector:4318/v1/traces`). Returns Right(status) or
    * Left(error message); never throws. No-op Right(0) when `records` is
    * empty. */
  def export(
      endpoint: String,
      records: Seq[TraceLog.Record],
      serviceName: String = "graft-cdc",
      timeoutMs: Long = 5000L): Either[String, Int] = {
    if (records.isEmpty) return Right(0)
    try {
      val client = HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
      val req = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(toOtlpJson(records, serviceName)))
        .build()
      Right(client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode())
    } catch { case t: Throwable => Left(t.toString) }
  }
}
