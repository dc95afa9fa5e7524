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
