package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal HTTP liveness endpoint serving [[StreamHealth.state]] — parity
  * with the reference's `/actuator/health/liveness` probe
  * (`CustomLivenessIndicator.kt:22-64`): 200 `{"status":"UP"}` while every
  * registered streaming query is active and fresh, 503 `{"status":"DOWN"}`
  * otherwise. Built on the JDK's `com.sun.net.httpserver` — no web
  * framework on the classpath, none needed for a probe.
  *
  * Usage: `val srv = new LivenessServer(health); val port = srv.start()`;
  * point the orchestrator's livenessProbe at
  * `http://host:port/health/liveness`. `port = 0` binds an ephemeral port
  * (returned by `start()`), which is also what the spec uses.
  */
class LivenessServer(health: StreamHealth, port: Int = 8080) {

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)

  server.createContext("/health/liveness", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val up = health.state() == health.Correct
      val body = (if (up) """{"status":"UP"}""" else """{"status":"DOWN"}""")
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(if (up) 200 else 503, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  })

  /** Start serving; returns the bound port (useful with port = 0). */
  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)
}
