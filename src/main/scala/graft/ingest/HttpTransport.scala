package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Default HTTP transport for the ingest edge (SURVEY §2.1). Every fetcher
  * in this library is transport-injected (a `String => ...` closure) so
  * parse logic stays offline-testable; this object supplies the production
  * implementation with the reference's semantics:
  *
  *  - per-call timeouts (the reference uses 60 s BCRP metadata, 30 s MEF
  *    POST, 120 s INEI downloads — `perustats/BCRP/metadata.py:109`,
  *    `MEF/utils/http.py:137`, `inei/downloader.py:200`);
  *  - redirects followed, browser-ish Accept headers
  *    (`inei/downloader.py:170-186`);
  *  - attempt → content-validity probe → retry ("curl then requests",
  *    `inei/downloader.py:164-208`) generalized as [[fetchValid]] over an
  *    injected validity predicate such as [[ingest.isZipValid]].
  *
  * Driver-side by design: reference sources are paginated HTTP endpoints
  * whose fan-out is bounded by the remote server, not data volume. Bulk
  * payloads land on the Spark side as files, parsed distributed (e.g.
  * [[StataReader.readDtaFiles]]).
  */
object HttpTransport {

  /** Per-service knobs; defaults mirror the reference's catalog fetcher. */
  final case class HttpConfig(
      timeout: Duration = Duration.ofSeconds(60),
      headers: Map[String, String] = Map(
        "Accept" -> ("text/html,application/xhtml+xml,application/xml;" +
          "q=0.9,*/*;q=0.8"),
        "Accept-Language" -> "es,en;q=0.9"),
      attempts: Int = 2)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  private def request(url: String, cfg: HttpConfig): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(cfg.timeout)
    cfg.headers.foreach { case (k, v) => b.header(k, v) }
    b
  }

  /** GET as raw bytes; throws on transport failure or non-2xx status. */
  def get(url: String, cfg: HttpConfig = HttpConfig()): Array[Byte] = {
    val resp = client.send(request(url, cfg).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() / 100 == 2,
      s"GET $url failed: HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** GET decoded in an explicit charset (reference pages are latin-1). */
  def getString(url: String, cfg: HttpConfig = HttpConfig(),
      charset: String = "ISO-8859-1"): String =
    new String(get(url, cfg), charset)

  /** Form POST (the MEF endpoint shape, `MEF/utils/http.py:120-140`). */
  def postForm(url: String, form: Map[String, String],
      cfg: HttpConfig = HttpConfig()): String = {
    val body = form.map { case (k, v) =>
      s"${ingest.urlEncode(k, "UTF-8")}=${ingest.urlEncode(v, "UTF-8")}"
    }.mkString("&")
    val resp = client.send(
      request(url, cfg)
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"POST $url failed: HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** The reference's download discipline: fetch, probe validity, retry up
    * to `cfg.attempts` times; `None` only when every attempt produced
    * invalid content (a server can 200 an HTML error page where a ZIP was
    * expected — the probe is the real success test, not the status code). */
  def fetchValid(url: String, valid: Array[Byte] => Boolean,
      cfg: HttpConfig = HttpConfig()): Option[Array[Byte]] = {
    var attempt = 0
    while (attempt < cfg.attempts) {
      attempt += 1
      try {
        val bytes = get(url, cfg)
        if (valid(bytes)) return Some(bytes)
      } catch { case _: Exception => () } // transport error -> next attempt
    }
    None
  }
}
