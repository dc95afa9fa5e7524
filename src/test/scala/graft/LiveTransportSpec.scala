package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.pipeline._
import org.scalatest.funsuite.AnyFunSuite

/** Live-path tests against an in-process HTTP stub server — the Spark-side
  * equivalent of the reference's transport-level hardening tests
  * (tests/test_capture_hardening.py:60–96), but through the REAL
  * `java.net.http` transport: GET query-param encoding, POST JSON body,
  * redirect following, Retry-After, and the full live Runner wiring.
  */
class LiveTransportSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def withServer(routes: (String, HttpExchange => Unit)*)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, ex => h(ex)) }
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte],
                      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) { val os = ex.getResponseBody; os.write(body) }
    ex.close()
  }

  test("jdkTransport GET: params_json becomes an encoded query string") {
    @volatile var seenQuery: String = null
    @volatile var seenUa: String = null
    withServer("/get" -> { ex =>
      seenQuery = ex.getRequestURI.getQuery
      seenUa = ex.getRequestHeaders.getFirst("User-Agent")
      respond(ex, 200, "hello".getBytes(UTF_8))
    }) { port =>
      val t = HttpSource.jdkTransport()
      val (status, _, body) = t("GET", s"http://127.0.0.1:$port/get",
        """{"a":"1","b":"x y"}""", Map("User-Agent" -> "graft-test"), 5000L)
      assert(status == 200)
      assert(new String(body, UTF_8) == "hello")
      assert(seenQuery == "a=1&b=x+y", "flat JSON params → URL-encoded query")
      assert(seenUa == "graft-test", "request headers pass through")
    }
  }

  test("jdkTransport POST: params_json sent as the JSON body") {
    @volatile var seenBody: String = null
    @volatile var seenCt: String = null
    withServer("/search" -> { ex =>
      seenBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      seenCt = ex.getRequestHeaders.getFirst("Content-Type")
      respond(ex, 200, """{"results":[]}""".getBytes(UTF_8))
    }) { port =>
      val t = HttpSource.jdkTransport()
      val (status, _, _) = t("POST", s"http://127.0.0.1:$port/search",
        """{"query":"reactor"}""",
        Map("Content-Type" -> "application/json"), 5000L)
      assert(status == 200)
      assert(seenBody == """{"query":"reactor"}""")
      assert(seenCt == "application/json")
    }
  }

  test("jdkTransport follows redirects (reference httpx follow_redirects=True)") {
    withServer(
      "/old" -> { ex => respond(ex, 302, Array.emptyByteArray, "Location" -> "/new") },
      "/new" -> { ex => respond(ex, 200, "final".getBytes(UTF_8)) }
    ) { port =>
      val t = HttpSource.jdkTransport()
      val (status, _, body) = t("GET", s"http://127.0.0.1:$port/old", null,
        Map.empty, 5000L)
      assert(status == 200)
      assert(new String(body, UTF_8) == "final")
    }
  }

  test("Retry-After from a real 429 drives the backoff through liveFetch") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/flaky" -> { ex =>
      if (calls.incrementAndGet() == 1)
        respond(ex, 429, Array.emptyByteArray, "Retry-After" -> "3")
      else respond(ex, 200, "ok".getBytes(UTF_8))
    }) { port =>
      var sleeps = Vector.empty[Long]
      val req = Model.FetchRequest("p", 0, "metadata", "GET",
        s"http://127.0.0.1:$port/flaky", null, "f")
      val out = HttpSource.liveFetch(new RateLimiter, HttpSource.jdkTransport(),
        req, maxArtifactBytes = 1 << 20, sleeper = ms => sleeps :+= ms)
      assert(out.status_code == 200)
      assert(out.attempts.map(_.status_code) == Seq(429, 200))
      assert(sleeps == Vector(3000L), "server Retry-After is authoritative")
    }
  }

  test("jdkTransport decompresses gzip bodies (httpx-parity; reference http_client.py:91)") {
    val plain = """{"filings":{"recent":{}}}"""
    val gzipped = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(plain.getBytes(UTF_8)); gz.close()
      bos.toByteArray
    }
    withServer("/gz" -> { ex =>
      respond(ex, 200, gzipped, "Content-Encoding" -> "gzip")
    }) { port =>
      val t = HttpSource.jdkTransport()
      val (status, headers, body) = t("GET", s"http://127.0.0.1:$port/gz", null,
        Map("Accept-Encoding" -> "gzip, deflate"), 5000L)
      assert(status == 200)
      assert(new String(body, UTF_8) == plain,
        "gzip body must be transparently decompressed like httpx does")
      assert(!headers.keys.exists(_.equalsIgnoreCase("content-encoding")),
        "decoded responses must not claim a content-encoding")
      assert(!headers.keys.exists(_.equalsIgnoreCase("content-length")),
        "stale compressed length must be dropped")
    }
  }

  test("decodeBody: deflate (zlib + raw), unknown encoding, corrupt gzip pass-through") {
    val plain = "deflate payload".getBytes(UTF_8)
    def zlib(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write(b); d.close(); bos.toByteArray
    }
    def raw(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos,
        new java.util.zip.Deflater(-1, true))
      d.write(b); d.close(); bos.toByteArray
    }
    val (h1, b1) = HttpSource.decodeBody(Map("Content-Encoding" -> "deflate"), zlib(plain))
    assert(b1.sameElements(plain) && h1.isEmpty)
    val (h2, b2) = HttpSource.decodeBody(Map("Content-Encoding" -> "deflate"), raw(plain))
    assert(b2.sameElements(plain) && h2.isEmpty)
    // unknown encoding: untouched, header kept (caller can still see it)
    val br = "br-bytes".getBytes(UTF_8)
    val (h3, b3) = HttpSource.decodeBody(Map("Content-Encoding" -> "br"), br)
    assert(b3.sameElements(br) && h3.nonEmpty)
    // corrupt gzip: DELIBERATE divergence from httpx (which raises
    // DecodingError) — fail-the-row beats fail-the-fetch; the retained
    // Content-Encoding header marks the body as still-encoded so the
    // capture sinks and parse stage can see what happened
    val junk = Array[Byte](1, 2, 3)
    val (h4, b4) = HttpSource.decodeBody(Map("Content-Encoding" -> "gzip"), junk)
    assert(b4.sameElements(junk))
    assert(h4.get("Content-Encoding").contains("gzip"),
      "corrupt body must keep its Content-Encoding marker")
    // no encoding header: identity
    val (h5, b5) = HttpSource.decodeBody(Map("Server" -> "x"), plain)
    assert(b5.sameElements(plain) && h5 == Map("Server" -> "x"))
  }

  test("HttpConfig.fromEnv honors APP_MAX_ARTIFACT_BYTES (reference http_client.py:57)") {
    val cfg = HttpSource.HttpConfig.fromEnv(live = true,
      env = Map("APP_MAX_ARTIFACT_BYTES" -> "1048576"))
    assert(cfg.maxArtifactBytes == 1048576L)
    val dflt = HttpSource.HttpConfig.fromEnv(live = true, env = Map.empty)
    assert(dflt.maxArtifactBytes == 50L * 1024 * 1024)
    val bad = HttpSource.HttpConfig.fromEnv(live = true,
      env = Map("APP_MAX_ARTIFACT_BYTES" -> "not-a-number"))
    assert(bad.maxArtifactBytes == 50L * 1024 * 1024)
  }

  test("Runner --live end-to-end: injected transport, SEC UA header, run.log tee (K11)") {
    val fixtures = "src/test/resources/fixtures"
    val submissions = Files.readAllBytes(Paths.get(s"$fixtures/sec_edgar/submissions.json"))
    val artifact = Files.readAllBytes(Paths.get(s"$fixtures/sec_edgar/artifact.htm"))
    HeaderRecorder.seen.clear()
    val transport: HttpSource.Transport = (_, url, _, headers, _) => {
      HeaderRecorder.seen.add(url -> headers)
      if (url.contains("/submissions/")) (200, Map.empty[String, String], submissions)
      else (200, Map.empty[String, String], artifact)
    }
    val wh = Files.createTempDirectory("wh").toString
    val res = Runner.run(spark, SecEdgarConnector, limit = 1,
      fixtureRoot = "/nonexistent-not-used-in-live", warehouseDir = wh,
      blobRoot = Files.createTempDirectory("blobs").toString,
      runRoot = Files.createTempDirectory("runs").toString,
      live = true,
      config = HttpSource.HttpConfig(live = true,
        secUserAgent = Some("Example Co admin@example.com")),
      transport = transport)
    assert(res.status == "succeeded")
    assert(res.responses == 2, "metadata + artifact via the live path")
    assert(res.artifacts == 1)
    val headerMaps = HeaderRecorder.seen.toArray(Array.empty[(String, Map[String, String])])
    assert(headerMaps.length == 2)
    assert(headerMaps.forall(_._2("User-Agent") == "Example Co admin@example.com"),
      "sec.gov hosts get the operator-identifying UA on every live request")
    // K11: the run dir has a run.log tee with start + success lines
    val runLog = new String(
      Files.readAllBytes(Paths.get(s"${res.runDir}/run.log")), UTF_8)
    assert(runLog.contains("run start provider=sec_edgar"))
    assert(runLog.contains("run succeeded"))
  }

  test("offline runs also tee run.log (K11)") {
    val res = Runner.run(spark, SecEdgarConnector, 1, "src/test/resources/fixtures",
      Files.createTempDirectory("wh").toString,
      Files.createTempDirectory("blobs").toString,
      Files.createTempDirectory("runs").toString)
    assert(Files.exists(Paths.get(s"${res.runDir}/run.log")))
  }
}

object HeaderRecorder {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Map[String, String])]
}
