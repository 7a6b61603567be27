package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Real HTTP transports for the injected-transport seams
  * ([[CommonCrawlFetcher]]'s index/range legs, [[graft.operators
  * .BatchedPairClassifier]]'s classify leg). Deployments hand these
  * to the seams; the sandbox's loopback integration spec drives them
  * against a local `com.sun.net.httpserver` serving the real wire
  * shapes (CDX JSON-line pages, 206 byte ranges, LLM verdict JSON),
  * so the whole stack — URL construction, Range header math, status
  * handling, retry/backoff above it — is exercised over a genuine
  * socket, not a Scala-function shortcut.
  *
  * The returned closures capture only strings/longs; the shared
  * [[HttpClient]] lives JVM-statically here, so the closures stay
  * serializable for `mapPartitions` fan-out and each executor JVM
  * builds its own client on first use (connection pooling per JVM —
  * the per-PARTITION session reuse the fetcher docs promise).
  */
object HttpTransports extends Serializable {

  // one client per JVM: HttpClient is thread-safe and pools
  // connections; building it lazily keeps object init cheap on the
  // driver and defers socket machinery to first executor use
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(20))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def require2xx(status: Int, url: String): Unit =
    if (status < 200 || status > 299)
      throw new java.io.IOException(s"HTTP $status from $url")

  /** GET → UTF-8 body. The [[CommonCrawlFetcher]] `indexTransport`
    * shape (CDX queries: the fetcher builds the full query URL).
    */
  def get(url: String): String = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(60)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require2xx(resp.statusCode(), url)
    resp.body()
  }

  /** Range-GET → raw bytes: `Range: bytes=first-last` against
    * `baseUrl/file` (the Common-Crawl data-bucket layout — filename
    * from the CDX record is a path under the crawl-data root). A 200
    * (whole-object) answer from a range-oblivious server is accepted
    * ONLY when the request covered the whole object from byte 0 —
    * otherwise slicing silently would hide a misconfigured mirror.
    * Partially-applied form keeps the executor-side closure down to
    * one captured string.
    */
  def getRange(baseUrl: String)(file: String, first: Long, last: Long): Array[Byte] = {
    val url = s"${baseUrl.stripSuffix("/")}/$file"
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(120))
        .header("Range", s"bytes=$first-$last").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 206 => resp.body()
      case 200 if first == 0L =>
        val want = (last - first + 1).min(Int.MaxValue).toInt
        // a SHORT 200 body is truncation (a range-oblivious proxy that
        // also cut the stream): fail HERE with the URL, not 3 layers
        // later as an anonymous gzip error mid-WARC-parse
        if (resp.body().length < want) throw new java.io.IOException(
          s"truncated 200 response: got ${resp.body().length} bytes of " +
            s"range $first-$last ($want wanted) from $url")
        if (resp.body().length == want) resp.body()
        else java.util.Arrays.copyOfRange(resp.body(), 0, want)
      case s => throw new java.io.IOException(
        s"HTTP $s for range $first-$last of $url (expected 206)")
    }
  }

  /** POST JSON → UTF-8 body. The [[graft.operators
    * .BatchedPairClassifier]] `transport` shape (request body in,
    * response body out; endpoint + auth are baked into the closure by
    * the deployment).
    */
  def post(url: String, contentType: String = "application/json")(body: String): String = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(120))
        .header("Content-Type", contentType)
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    require2xx(resp.statusCode(), url)
    resp.body()
  }
}
