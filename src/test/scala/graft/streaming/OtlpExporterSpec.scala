package graft.streaming

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** OTLP/HTTP JSON wire-format parity: the exporter's body must be valid
  * OTLP JSON (resourceSpans → scopeSpans → spans with hex ids, nano
  * timestamps, reference-matching attribute keys), ids deterministic
  * under replay, and the POST must reach a live collector endpoint. */
class OtlpExporterSpec extends SparkSpec {

  private val recs = Seq(
    TraceLog.Record(atMs = 1700000000123L, batchId = 7L,
      eventCode = "TRANSACTION_AUTHORIZATION_COMPLETED_EVENT", outcome = "applied", count = 42L),
    TraceLog.Record(atMs = 1700000000123L, batchId = 7L,
      eventCode = "TRANSACTION_CLOSED_EVENT", outcome = "noop_stale", count = 3L))

  test("OTLP JSON body: structure, ids, timestamps, attribute keys") {
    import spark.implicits._
    val json = OtlpExporter.toOtlpJson(recs)
    // parse with Spark's JSON reader — a malformed body would come back
    // with a _corrupt_record instead of the typed structure
    val df = spark.read.option("mode", "FAILFAST").json(Seq(json).toDS())
    val spans = df.select(explode(col("resourceSpans")).as("rs"))
      .select(explode(col("rs.scopeSpans")).as("ss"))
      .select(col("ss.scope.name").as("scope"), explode(col("ss.spans")).as("sp"))
    val rows = spans.select(
      col("scope"), col("sp.traceId"), col("sp.spanId"), col("sp.name"),
      col("sp.startTimeUnixNano"), col("sp.endTimeUnixNano")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getString(0) == "graft.trace.merge")
      assert(r.getString(1).matches("[0-9a-f]{32}"), s"traceId: ${r.getString(1)}")
      assert(r.getString(2).matches("[0-9a-f]{16}"), s"spanId: ${r.getString(2)}")
      assert(r.getString(3) == "view.merge")
      assert(r.getString(4) == "1700000000123000000", "unix nanos = atMs * 1e6")
      assert(r.getString(4) == r.getString(5))
    }
    // same batch → same trace; distinct (code, outcome) → distinct spans
    assert(rows.map(_.getString(1)).distinct.length == 1)
    assert(rows.map(_.getString(2)).distinct.length == 2)
    // reference-parity attribute keys (ViewUpdateTracingUtils span attrs)
    val attrKeys = spans.select(explode(col("sp.attributes")).as("a"))
      .select(col("a.key")).as[String].collect().toSet
    assert(attrKeys == Set("eventCode", "outcome", "count", "batchId"))
    // deterministic under replay: a collector dedups rather than double-counts
    assert(json == OtlpExporter.toOtlpJson(recs))
  }

  test("export POSTs the body to a live /v1/traces endpoint; failures are Left, not thrown") {
    @volatile var body: String = null
    @volatile var contentType: String = null
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v1/traces", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        contentType = ex.getRequestHeaders.getFirst("Content-Type")
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val res = OtlpExporter.export(s"http://127.0.0.1:$port/v1/traces", recs)
      assert(res == Right(200), s"expected 200: $res")
      assert(contentType == "application/json")
      assert(body == OtlpExporter.toOtlpJson(recs), "collector must receive the exact body")
      assert(OtlpExporter.export(s"http://127.0.0.1:$port/v1/traces", Nil) == Right(0))
    } finally server.stop(0)
    // collector down → Left, never an exception into the stream
    val down = OtlpExporter.export("http://127.0.0.1:1/v1/traces", recs, timeoutMs = 300L)
    assert(down.isLeft)
  }
}
