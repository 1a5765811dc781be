package graft.serve

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.immutable.ListMap
import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP serving protocol (reference: readwise_vector_db/api/routes.py) on
  * the JDK's built-in server — no framework dependency:
  *
  *  - `POST /search` — JSON body {q, k, source_type, author, tags,
  *    highlighted_at_range} → `{"results": [...]}` (routes.py:161-219);
  *  - `GET /mcp/stream?q=...&k=...&tags=a,b&from_date=...&to_date=...` —
  *    SSE result/complete/error events (routes.py:96-159);
  *  - `GET /health` — `{"status":"ok"}` / 503 (routes.py:76-94);
  *  - `GET /metrics` — flat JSON counter/timer exposition (routes.py:224-247).
  *
  * Search execution is injected (same seam as [[McpServer]]).
  */
final class HttpApi(
    searchFn: SearchParams => Iterator[Map[String, Any]],
    healthFn: () => Map[String, Any] = () => Map("status" -> "ok"),
    port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, contentType: String,
      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, body.length)
    val os = ex.getResponseBody
    os.write(body)
    os.close()
  }

  private def respondJson(ex: HttpExchange, code: Int, value: Any): Unit =
    respond(ex, code, "application/json",
      Json.write(value).getBytes(StandardCharsets.UTF_8))

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k ->
          java.net.URLDecoder.decode(v, StandardCharsets.UTF_8))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  server.createContext("/health", (ex: HttpExchange) => {
    val h = healthFn()
    respondJson(ex, if (h.get("status").contains("ok")) 200 else 503, h)
  })

  server.createContext("/metrics", (ex: HttpExchange) =>
    respondJson(ex, 200, Metrics.snapshot))

  server.createContext("/search", (ex: HttpExchange) => {
    try {
      if (ex.getRequestMethod != "POST")
        respondJson(ex, 405, Map("detail" -> "Method Not Allowed"))
      else {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val parsed =
          try Right(Json.parseObject(body))
          catch { case NonFatal(e) => Left(e.getMessage) }
        parsed.flatMap(SearchParams.fromMcp) match {
          case Left(err) =>
            // FastAPI's 422 validation-error shape (routes.py contract)
            respondJson(ex, 422, Map("detail" -> err))
          case Right(params) if params.k > SearchParams.MaxK =>
            // HTTP bound k ∈ [1, 100] is a validation error, not a silent
            // clamp (api/routes.py:100 `le=100`)
            respondJson(ex, 422,
              Map("detail" -> s"k must be <= ${SearchParams.MaxK}"))
          case Right(params) =>
            val results = searchFn(params).toSeq
            respondJson(ex, 200, ListMap("results" -> results))
        }
      }
    } catch {
      case NonFatal(e) => respondJson(ex, 500, Map("detail" -> e.getMessage))
    }
  })

  server.createContext("/mcp/stream", (ex: HttpExchange) => {
    val p = queryParams(ex)
    SearchParams.fromHttp(
      query = p.getOrElse("q", ""),
      k = p.get("k").flatMap(_.toIntOption).getOrElse(SearchParams.DefaultK),
      sourceType = p.get("source_type"),
      author = p.get("author"),
      tagsCsv = p.get("tags"),
      fromDate = p.get("from_date"),
      toDate = p.get("to_date")) match {
      case Left(err) => respondJson(ex, 422, Map("detail" -> err))
      case Right(params) =>
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0) // chunked
        val os: OutputStream = ex.getResponseBody
        try {
          val events =
            try SseFraming.stream(searchFn(params))
            catch { case NonFatal(e) => Iterator(SseFraming.errorEvent(e.getMessage)) }
          events.foreach { e =>
            os.write(e.getBytes(StandardCharsets.UTF_8))
            os.flush() // per-event flush = streaming delivery
          }
        } catch {
          case NonFatal(_) => () // client went away mid-stream
        } finally os.close()
    }
  })

  def start(): HttpApi = { server.start(); this }
  def shutdown(): Unit = server.stop(0)
}
