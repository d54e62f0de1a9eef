package graft.ingest

import java.net.InetSocketAddress
import java.time.Duration
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import HttpTransport.HttpConfig

/** Default HTTP transport against a local fixture server (no egress):
  * GET/POST round-trips, redirect following, latin-1 decoding, and the
  * validity-probe retry discipline. */
class HttpTransportSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  @volatile private var zipAttempts = 0

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(code, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/page", (ex: HttpExchange) =>
      respond(ex, 200, "GOBIERNO NACIONAL año".getBytes("ISO-8859-1")))
    server.createContext("/redir", (ex: HttpExchange) =>
      respond(ex, 302, Array.emptyByteArray,
        Map("Location" -> s"$base/page")))
    server.createContext("/bcrp", (ex: HttpExchange) =>
      respond(ex, 200,
        ("""{"config":{"series":[{"name":"Tipo de cambio (S/ por US$)"}]},"""
          + """"periods":[{"name":"Ene.2023","values":["3400.50"]},"""
          + """{"name":"Feb.2023","values":["n.d."]}]}""")
          .getBytes("UTF-8")))
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, "not here".getBytes))
    server.createContext("/echo", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      respond(ex, 200, s"${ex.getRequestMethod}:$body".getBytes("UTF-8"))
    })
    // first attempt returns an HTML error page, second a valid-looking ZIP —
    // the reference's "200 OK but not actually a ZIP" failure mode
    val fakeZip: Array[Byte] =
      Array[Byte]('P', 'K', 3, 4) ++ Array.fill[Byte](8)('x') ++
        Array[Byte]('P', 'K', 5, 6) ++ Array.fill[Byte](18)(0)
    server.createContext("/flaky.zip", (ex: HttpExchange) => {
      zipAttempts += 1
      val body =
        if (zipAttempts < 2) "<html>error</html>".getBytes("ISO-8859-1")
        else fakeZip
      respond(ex, 200, body)
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("get + latin-1 decode") {
    assert(HttpTransport.getString(s"$base/page") == "GOBIERNO NACIONAL año")
  }

  test("redirects are followed") {
    assert(HttpTransport.getString(s"$base/redir") == "GOBIERNO NACIONAL año")
  }

  test("non-2xx throws loudly") {
    val e = intercept[IllegalArgumentException] {
      HttpTransport.get(s"$base/missing")
    }
    assert(e.getMessage.contains("404"))
  }

  test("postForm url-encodes and round-trips") {
    val out = HttpTransport.postForm(s"$base/echo",
      Map("nivel" -> "gobierno nacional", "q" -> "a&b"))
    assert(out == "POST:nivel=gobierno%20nacional&q=a%26b")
  }

  test("fetchValid retries past a 200-but-invalid payload") {
    zipAttempts = 0
    val got = HttpTransport.fetchValid(s"$base/flaky.zip", ingest.isZipValid,
      HttpConfig(attempts = 3))
    assert(got.isDefined && zipAttempts == 2)
    assert(ingest.isZipValid(got.get))
  }

  test("fetchValid gives up after attempts exhausted") {
    val got = HttpTransport.fetchValid(s"$base/page", ingest.isZipValid,
      HttpConfig(attempts = 2))
    assert(got.isEmpty)
  }

  test("timeouts are configurable per call") {
    // no handler ever sleeps here; just assert the config plumbs through
    val cfg = HttpConfig(timeout = Duration.ofMillis(1500))
    assert(HttpTransport.getString(s"$base/page", cfg).nonEmpty)
  }

  test("BCRP pipeline end-to-end over the live fetcher (local fixture API)") {
    import graft.cache.ParquetCache
    import graft.model.SeriesQuery
    import graft.pipelines.{BCRPLive, BCRPPipeline}
    val scratch = new java.io.File("target/scratch/bcrp_live")
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec); f.delete()
    }
    rec(scratch)
    val catalog = {
      import spark.implicits._
      Seq(("PN01234PM", "tipo de cambio", "M")).toDF("code", "description", "freq")
    }
    val pipe = new BCRPPipeline(spark,
      new ParquetCache(spark, scratch.getPath), catalog)
    val q = SeriesQuery(Seq("PN01234PM"), "2023-1", "2023-12")
    // the ONLY injection is the API base url -> the local fixture server
    val result = pipe.run(q,
      (_, codes) => BCRPLive.fetcher(spark, q, apiBase = s"$base/bcrp/api")(codes))
    val rows = result("M").orderBy("date").collect()
    assert(rows.map(_.getDate(0).toString).toSeq ==
      Seq("2023-01-01", "2023-02-01"))
    assert(rows(0).getDouble(1) == 3400.5 && rows(1).isNullAt(1)) // n.d. -> null
  }
}
