package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession

/** HTTP surface for [[Health]] — the reference runs an HTTP mux serving
  * `GET /health` and `GET /ready` (reference main.go:284-304), answering
  * 200 with the HealthStatus JSON when both connection probes are live
  * and 500 with the error payload when either fails (main.go:327-380).
  *
  * This serves [[Health.status]] the same way: each request runs one
  * live probe of the session's streams, answers 200 iff the status is
  * "ok" and 500 otherwise, with the JSON body in both cases (the
  * reference also encodes the status struct into the 500). `/health`
  * and `/ready` share the handler, as they do in the reference.
  *
  * Driver-side utility by design: health is a property of the Spark
  * DRIVER (the streams' coordinator), so the probe endpoint belongs on
  * the driver JVM — the JDK's built-in httpserver keeps it
  * dependency-free. Pass port 0 for an ephemeral port (tests);
  * [[boundPort]] reports what was bound. Callers own the lifecycle
  * (stop it at shutdown, as the reference's graceful-exit path does).
  */
object HealthServer {

  def start(spark: SparkSession, port: Int, app: String = "graft"): HttpServer = {
    // install at boot so failures before the first poll are captured
    Health.install(spark)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val handler = new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (code, body) =
          try {
            val s = Health.status(spark, app)
            (if (s.status == "ok") 200 else 500, Health.renderJson(s))
          } catch {
            // the probe itself failing is exactly what a 500 is for —
            // mirror the reference's error-encoding shape, never a hang
            case e: Throwable =>
              (500, s"""{"app":"$app","status":"error","lastError":${jsonStr(e.toString)}}""")
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type", "application/json")
        // reference wraps its mux in cors.AllowAll (main.go:90) so browser
        // dashboards can scrape the probes directly — mirror that
        x.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
        x.sendResponseHeaders(code, bytes.length.toLong)
        val os = x.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }
    server.createContext("/health", handler)
    server.createContext("/ready", handler)
    // Prometheus exposition route (reference main.go:88 promhttp): a
    // scrape always gets 200 — error state is IN the metrics (graft_up 0)
    // so the scraper records the outage instead of a scrape failure.
    server.createContext("/metrics", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (code, body) =
          try (200, Health.prometheusText(spark, app))
          catch {
            case e: Throwable =>
              (500, s"# probe failed: ${e.toString.replace('\n', ' ')}\n")
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
        x.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
        x.sendResponseHeaders(code, bytes.length.toLong)
        val os = x.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.start()
    server
  }

  /** The port actually bound (resolves port-0 ephemeral binds). */
  def boundPort(server: HttpServer): Int = server.getAddress.getPort

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
