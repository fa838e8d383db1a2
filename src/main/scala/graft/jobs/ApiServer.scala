package graft.jobs

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's user-facing service shell
  * (`/root/reference/api_server.py:13-41`), re-expressed over
  * [[IngestionJob]] with the JDK's built-in HTTP server (zero deps,
  * loopback-testable):
  *
  *  - `GET  /health`              → `{"status": "ok"}` — load-balancer probe
  *  - `GET  /hello`               → liveness message
  *  - `POST /jobs/ingestion`      → fire-and-forget: the job runs on a
  *    background thread, the response returns immediately with
  *    `{"status": "queued"}` and the metrics are discarded (exactly the
  *    reference's `BackgroundTasks` semantics — failures are logged, not
  *    reported to the caller)
  *  - `POST /jobs/ingestion/sync` → runs inline, responds
  *    `{"status": "completed", "metrics": {...}}`
  *
  * The job itself is injected as a thunk: the server shell is transport
  * only, the engine work stays in `IngestionJob.run` (and specs can bind a
  * loopback-fed job). Spark driver-side by design — the reference runs
  * FastAPI in the same process as its pandas job; here the server shares
  * the driver JVM and each request drives cluster work through the
  * SparkSession captured by the thunk.
  */
final class ApiServer(runJob: () => IngestMetrics, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val queued = new AtomicLong(0L)

  /** Completed background runs — observable for tests/monitoring (the
    * reference discards background results entirely; counting completions
    * adds observability without changing the response contract). */
  val backgroundCompleted = new AtomicLong(0L)

  private def respond(ex: HttpExchange, status: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** JSON string escaping — a store path containing `"`, `\`, or control
    * characters (newline/tab in a quoted dir name) must not produce
    * malformed JSON on the sync endpoint (ADVICE r4/r5: backslash+quote
    * alone still let U+0000–U+001F through unescaped). */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def metricsJson(m: IngestMetrics): String = {
    def opt(v: Option[Int]): String = v.map(_.toString).getOrElse("null")
    s"""{"http_status": ${opt(m.httpStatus)},""" +
      s""" "retries_used": ${opt(m.retriesUsed)},""" +
      s""" "rows_fetched": ${m.rowsFetched},""" +
      s""" "rows_after_dedup": ${m.rowsAfterDedup},""" +
      s""" "output": "${jsonEscape(m.storePath)}"}"""
  }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    (method, path) match {
      case ("GET", "/health") => respond(ex, 200, """{"status": "ok"}""")
      case ("GET", "/hello") => respond(ex, 200,
        """{"message": "RandomUser ingestion service is running"}""")
      case ("POST", "/jobs/ingestion") =>
        queued.incrementAndGet()
        val t = new Thread(() =>
          try { runJob(); backgroundCompleted.incrementAndGet(); () }
          catch { case e: Throwable =>
            System.err.println(s"background ingestion failed: ${e.getMessage}")
          })
        t.setDaemon(true)
        t.start()
        respond(ex, 200, """{"status": "queued"}""")
      case ("POST", "/jobs/ingestion/sync") =>
        try respond(ex, 200,
          s"""{"status": "completed", "metrics": ${metricsJson(runJob())}}""")
        catch { case e: Throwable =>
          // same escaping as the success path: a Spark stack message with
          // embedded newlines must not produce malformed JSON on the 500
          respond(ex, 500, s"""{"status": "failed", "detail": "${
            jsonEscape(Option(e.getMessage).getOrElse(e.getClass.getName))}"}""")
        }
      case (_, "/health" | "/hello" | "/jobs/ingestion"
            | "/jobs/ingestion/sync") =>
        respond(ex, 405, """{"detail": "Method Not Allowed"}""")
      case _ => respond(ex, 404, """{"detail": "Not Found"}""")
    }
  }

  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def start(): ApiServer = { server.start(); this }
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
