package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Concrete transports for [[ExportClient]]'s injected fetch function.
  * The engine's tests and CLI use the filesystem transport; this HTTP
  * transport reproduces the reference's wire shape (reference:
  * readwise_vector_db/core/readwise.py:8-38 — `Authorization: Token …`
  * against `https://readwise.io`, query-param pagination, JSON body with
  * `nextPageCursor`).
  */
object ExportTransports {

  /** Build the GET request for one page — pure, unit-testable. */
  private[sources] def buildRequest(baseUrl: String, token: String,
      path: String, params: Map[String, String]): HttpRequest = {
    val qs = params.toSeq.sortBy(_._1).map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")
    val uri = URI.create(baseUrl + path + (if (qs.isEmpty) "" else s"?$qs"))
    HttpRequest.newBuilder(uri)
      .header("Authorization", s"Token $token")
      .timeout(Duration.ofSeconds(30))
      .GET()
      .build()
  }

  /** Extract `nextPageCursor` from a page body (absent/null → None). */
  private[sources] def nextCursor(body: String): Option[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body).get("nextPageCursor")
    if (node == null || node.isNull) None else Some(node.asText())
  }

  /** HTTP fetch for a live deployment. 5xx/429 raise retryable errors for
    * [[ExportClient]]'s backoff (the reference's `raise_for_status` +
    * retry wrapper); other 4xx are fatal — a bad token can't be retried
    * into working. */
  def http(baseUrl: String, token: String,
      client: HttpClient = HttpClient.newHttpClient())
      : (String, Map[String, String]) => Page =
    (path, params) => {
      val resp = client.send(buildRequest(baseUrl, token, path, params),
        HttpResponse.BodyHandlers.ofString())
      val code = resp.statusCode()
      // 408/425/429 are transient despite being 4xx; everything else in
      // 4xx (401/403/404/422…) cannot be fixed by retrying
      val transient = code == 408 || code == 425 || code == 429
      if (code / 100 == 4 && !transient)
        throw new FatalFetchException(s"export API $code for $path")
      if (code / 100 != 2)
        throw new RuntimeException(s"export API $code for $path")
      Page(resp.body(), nextCursor(resp.body()))
    }
}
