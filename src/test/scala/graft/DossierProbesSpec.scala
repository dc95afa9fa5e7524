package graft

import java.nio.charset.StandardCharsets.UTF_8
import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dossier's mandatory validation suites SEC-V1–V11 and APS-V1–V8
  * (reference docs/Golden_Record_API_Dossiers.md:272–290 and :741–756),
  * encoded as OFFLINE contract probes (r16, VERDICT r15 next-#5). Each
  * probe has two halves: what the remote SERVICE does (observable only
  * live, in staging — waived below with one line each) and what THIS
  * ENGINE does with either outcome — the half that is assertable against
  * the fake-transport harness and is tested here. A probe is "covered"
  * when the engine behaves correctly whichever way the live observation
  * resolves.
  *
  * Live-only waivers (no engine-side half at all):
  *  - SEC-V6  (index.xml presence per accession): requires live network —
  *    a pure property of EDGAR's archive layout.
  *  - SEC-V10 (sandbox environment existence): requires live network —
  *    a pure property of SEC infrastructure.
  *  - APS-V8's server-side cap value: requires live network; the engine
  *    half (skip advances by ACTUAL hits under a silent cap) is already
  *    gated in ApsPaginationSpec ("APS-V8: server silently caps...").
  */
class DossierProbesSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // ---------------------------------------------------------------- SEC

  test("SEC-V1: submissions payloads carrying filings.files[] shards still extract (schema tolerance)") {
    // live half: discover the shard field names. Engine half: a payload
    // with the files[] array + filingCount present must not disturb the
    // recent[0] extraction — from_json with an explicit schema ignores
    // unknown siblings instead of failing the row.
    import spark.implicits._
    val body =
      """{"cik": "0000320193", "filingCount": 1843,
        | "filings": {
        |   "recent": {"accessionNumber": ["0000320193-24-000001"],
        |              "primaryDocument": ["aapl-10k.htm"]},
        |   "files": [{"name": "CIK0000320193-submissions-001.json",
        |              "filingCount": 1000,
        |              "filingFrom": "1994-01-26", "filingTo": "2014-01-28"}]
        |}}""".stripMargin
    val responses = Seq((0, 7L, "https://data.sec.gov/submissions/CIK0000320193.json",
        """{"cik10": "0000320193"}""", body.getBytes(UTF_8), 200))
      .toDF("item_index", "id", "url", "params_json", "body", "status_code")
    val out = SecEdgarConnector.extract(responses).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("artifact_url") ==
      "https://www.sec.gov/Archives/edgar/data/320193/000032019324000001/aapl-10k.htm")
    assert(out(0).getAs[String]("error_message") == null)
  }

  test("SEC-V2 / APS-V1: the limiter enforces the rps ceilings the ramp test would discover") {
    // live half: find the exact throttle point. Engine half: whatever it
    // is, the client must never EXCEED its configured budget — 10 rps for
    // sec.gov hosts, 5 rps elsewhere, 3 rps per (key, host) for APS. The
    // bucket starts full (capacity = rate), so the first `rate` acquires
    // are free and the next must wait ~1/rate s. Lower bounds only: a
    // loaded box can only make the waits longer.
    def elapsedMs(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000L
    }
    val sec = new RateLimiter
    assert(elapsedMs((1 to 11).foreach(_ => sec.acquireHost("data.sec.gov"))) >= 80L,
      "11th sec.gov acquire must wait ~100ms (10 rps)")
    val other = new RateLimiter
    assert(elapsedMs((1 to 6).foreach(_ => other.acquireHost("example.org"))) >= 160L,
      "6th non-SEC acquire must wait ~200ms (5 rps)")
    val aps = new RateLimiter
    assert(elapsedMs((1 to 4).foreach(_ => aps.acquireAps("key1", "adams-api.nrc.gov"))) >= 250L,
      "4th APS acquire must wait ~333ms (3 rps per key+host)")
  }

  test("SEC-V3: Retry-After honored in BOTH RFC forms — delta-seconds and HTTP-date") {
    // live half: which form the SEC sends. Engine half: either form is a
    // usable backoff signal; garbage falls back to exponential backoff.
    val now = 1700000000000L
    assert(HttpSource.parseRetryAfterMs("7", now).contains(7000L))
    assert(HttpSource.parseRetryAfterMs(" 0 ", now).contains(0L))
    // HTTP-date 90 s in the future of `now` (now = 2023-11-14T22:13:20Z)
    assert(HttpSource.parseRetryAfterMs("Tue, 14 Nov 2023 22:14:50 GMT", now)
      .contains(90000L))
    // a date in the past clamps to zero — retry immediately, never a
    // negative sleep
    assert(HttpSource.parseRetryAfterMs("Tue, 14 Nov 2023 22:10:00 GMT", now)
      .contains(0L))
    assert(HttpSource.parseRetryAfterMs("-5", now).contains(0L))
    assert(HttpSource.parseRetryAfterMs("garbage", now).isEmpty)
    assert(HttpSource.backoffMs("u", 1, Some("Tue, 14 Nov 2023 22:14:50 GMT"),
      nowMs = now) == 90000L)
    assert(HttpSource.backoffMs("u", 1, Some("11")) == 11000L)
    // and through the full liveFetch machine: an HTTP-date Retry-After
    // drives the observed sleep schedule
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val transport: HttpSource.Transport = (_, _, _, _, _) =>
      if (calls.incrementAndGet() == 1)
        (429, Map("Retry-After" -> "3"), Array.emptyByteArray)
      else (200, Map.empty, "ok".getBytes(UTF_8))
    var sleeps = Vector.empty[Long]
    val out = HttpSource.liveFetch(new RateLimiter, transport,
      Model.FetchRequest("p", 0, "metadata", "GET", "http://x.test/a", null, "f"),
      maxArtifactBytes = 1 << 20, sleeper = ms => sleeps :+= ms)
    assert(out.status_code == 200 && sleeps == Vector(3000L))
  }

  test("SEC-V4 / SEC-V8 / SEC-V9: revalidation + quota + integrity headers survive into the capture") {
    // live half: WHICH of ETag / Last-Modified / X-RateLimit-* /
    // Content-MD5 / Digest each host returns. Engine half: whatever comes
    // back is recorded verbatim in the captured response headers (they are
    // not in the sensitive set, so redaction must keep them) — the
    // artifact the dossier says to log, and the precondition for
    // conditional-GET / quota-aware / integrity-checked upgrades.
    val served = Map(
      "ETag" -> "\"abc123\"", "Last-Modified" -> "Tue, 14 Nov 2023 22:00:00 GMT",
      "X-RateLimit-Remaining" -> "97", "Content-MD5" -> "lkjsd==",
      "Digest" -> "sha-256=xyz")
    val transport: HttpSource.Transport =
      (_, _, _, _, _) => (200, served, "body".getBytes(UTF_8))
    val out = HttpSource.liveFetch(new RateLimiter, transport,
      Model.FetchRequest("p", 0, "artifact", "GET", "http://x.test/f.htm", null, "f"),
      maxArtifactBytes = 1 << 20, sleeper = _ => ())
    served.foreach { case (k, v) =>
      assert(out.headers_json.contains(s""""$k": "${v.replace("\"", "\\\"")}""""),
        s"$k must be captured in headers_json")
      assert(out.attempts.last.response_headers.get(k).contains(v))
    }
    // none of these are sensitive keys — redaction must not mask them
    served.keys.foreach(k => assert(!Redaction.isSensitive(k), k))
    // SEC-V9 fallback half: absent integrity headers, the artifact log's
    // sha256 IS the body digest — BlobStore is content-addressed, so the
    // stored path commits to the bytes
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("body".getBytes(UTF_8)).map("%02x".format(_)).mkString
    assert(BlobStore.blobPath("/r", sha) == s"/r/${sha.take(2)}/$sha")
  }

  test("SEC-V5: oversized artifacts dead-letter the ROW (the engine half of the max-size probe)") {
    // live half: the observed max file size + range support. Engine half:
    // a body past APP_MAX_ARTIFACT_BYTES must fail the row — not truncate
    // silently, not kill the job — whatever that observed max turns out
    // to be.
    val transport: HttpSource.Transport =
      (_, _, _, _, _) => (200, Map.empty, new Array[Byte](2048))
    val out = HttpSource.liveFetch(new RateLimiter, transport,
      Model.FetchRequest("p", 0, "artifact", "GET", "http://x.test/big.pdf", null, "f"),
      maxArtifactBytes = 1024, sleeper = _ => ())
    assert(out.status_code == 0 && out.body.isEmpty)
    assert(out.attempts.last.error_type == "SizeCapExceeded")
  }

  test("SEC-V7: a shard-capped 1000-entry recent array extracts recent[0] without disturbance") {
    // live half: the per-shard entry cap. Engine half: extraction reads
    // recent[0] regardless of array length — a large issuer's payload
    // must not change behavior or perf class (P1 is an index, not a scan).
    import spark.implicits._
    val accs = (0 until 1000).map(i => f""""0000320193-24-$i%06d"""").mkString(",")
    val docs = (0 until 1000).map(i => s""""doc$i.htm"""").mkString(",")
    val body =
      s"""{"filings": {"recent": {"accessionNumber": [$accs],
         |"primaryDocument": [$docs]}}}""".stripMargin
    val responses = Seq((0, 1L, "u", """{"cik10": "0000320193"}""",
        body.getBytes(UTF_8), 200))
      .toDF("item_index", "id", "url", "params_json", "body", "status_code")
    val out = SecEdgarConnector.extract(responses).collect()
    assert(out(0).getAs[String]("artifact_url")
      == "https://www.sec.gov/Archives/edgar/data/320193/000032019324000000/doc0.htm")
  }

  test("SEC-V11: sec.gov requests always carry Accept-Encoding; decode is transparent either way") {
    // live half: whether the header is a hard requirement. Engine half:
    // every sec.gov request sends it (so the engine is safe if it IS
    // required), and gzip bodies decode transparently (so nothing breaks
    // if servers compress regardless) — the engine is correct under
    // either resolution of the probe.
    val cfg = HttpSource.HttpConfig(live = true,
      secUserAgent = Some("Example Co admin@example.com"))
    val h = HttpSource.buildHeaders(cfg, new RateLimiter, "data.sec.gov", "GET")
    assert(h.get("Accept-Encoding").contains("gzip, deflate"))
    assert(h("User-Agent") == "Example Co admin@example.com")
    // a missing UA is a CONFIG error (fail the job, reference gotcha #2)
    intercept[IllegalStateException] {
      HttpSource.buildHeaders(HttpSource.HttpConfig(live = true),
        new RateLimiter, "www.sec.gov", "GET")
    }
  }

  // ---------------------------------------------------------------- APS

  test("APS-V2 / APS-V5 / APS-V7: every documented request shape passes through page POSTs verbatim") {
    // live half: which shapes get HTTP 200. Engine half: the pagination
    // loop must not mangle ANY of them — guide `searchCriteria`, Shape A
    // `q`+`filters` (incl. the DateAddedTimestamp ge-filter), Shape B
    // `queryString`/`docketNumber`, and the `content` boolean all
    // round-trip through pageParams with skip/take added alongside.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val shapes = Seq(
      """{"searchCriteria": {"q": "reactor"}}""",
      """{"q": "reactor", "filters": [{"name": "DateAddedTimestamp",
        |  "operator": "ge", "value": "2024-01-01T00:00:00Z"}]}""".stripMargin,
      """{"queryString": "reactor", "docketNumber": "50-123"}""",
      """{"q": "reactor", "content": false}""")
    shapes.foreach { base =>
      val page = mapper.readTree(ApsPagination.pageParams(base, 40, 20))
      val orig = mapper.readTree(base)
      orig.fieldNames().forEachRemaining { name =>
        assert(page.get(name) == orig.get(name),
          s"field $name must pass through untouched")
      }
      assert(page.get("skip").asInt == 40 && page.get("take").asInt == 20)
    }
  }

  test("APS-V3: both envelope variants and both count semantics are accepted") {
    // live half: which key the service actually uses. Engine half: the
    // hit reader and the connector extraction accept results[] AND
    // documents[] (and Results[]), and never trust `count` over the
    // actual array.
    val hitsR = ApsPagination.pageHits(
      """{"count": 2, "results": [{"a": 1}, {"a": 2}]}""".getBytes(UTF_8))
    val hitsD = ApsPagination.pageHits(
      """{"count": 2, "documents": [{"a": 1}, {"a": 2}]}""".getBytes(UTF_8))
    assert(hitsR.size == 2 && hitsD == hitsR)
    // `count` lies high → believe the array (1 hit, not 5)
    assert(ApsPagination.pageHits(
      """{"count": 5, "results": [{"a": 1}]}""".getBytes(UTF_8)).size == 1)
    // connector extraction: documents[] envelope resolves the pdf url
    import spark.implicits._
    val responses = Seq((0, 1L, "u", "{}",
        """{"documents": [{"pdfUrl": "https://adams.nrc.gov/doc.pdf"}]}"""
          .getBytes(UTF_8), 200))
      .toDF("item_index", "id", "url", "params_json", "body", "status_code")
    val out = NrcAdamsApsConnector.extract(responses).collect()
    assert(out(0).getAs[String]("artifact_url") == "https://adams.nrc.gov/doc.pdf")
  }

  test("APS-V4: the subscription key goes ONLY to the APS api host, never to artifact hosts") {
    // live half: whether document.Url needs auth / has a TTL. Engine
    // half: credential hygiene — the key header is attached exactly for
    // adams-api.nrc.gov and never leaks onto the (possibly third-party /
    // pre-signed) artifact URL's host.
    val cfg = HttpSource.HttpConfig(live = true, nrcSubscriptionKey = Some("k-secret"))
    val apiH = HttpSource.buildHeaders(cfg, new RateLimiter, "adams-api.nrc.gov", "POST")
    assert(apiH.get("Ocp-Apim-Subscription-Key").contains("k-secret"))
    val artH = HttpSource.buildHeaders(cfg, new RateLimiter, "www.nrc.gov", "GET")
    assert(!artH.contains("Ocp-Apim-Subscription-Key"),
      "artifact hosts must not receive the subscription key")
    // and the key is in the sensitive set — captures redact it
    assert(Redaction.isSensitive("Ocp-Apim-Subscription-Key"))
  }

  test("APS-V6: empty results[], count:0, and missing envelope all terminate; non-200 fails LOUDLY") {
    // live half: which stop signal the service emits. Engine half: every
    // candidate signal terminates the loop (no infinite pagination), and
    // the 404-style outcome is a loud failure, not a silent completion —
    // a half-paginated sync that looks complete is worse than a failed
    // one.
    assert(ApsPagination.pageHits("""{"results": []}""".getBytes(UTF_8)).isEmpty)
    assert(ApsPagination.pageHits("""{"count": 0}""".getBytes(UTF_8)).isEmpty)
    assert(ApsPagination.pageHits("""{}""".getBytes(UTF_8)).isEmpty)
    assert(ApsPagination.pageHits("not json".getBytes(UTF_8)).isEmpty)
    // one 2-hit page, then an empty page → 2 captures, loop ends
    val pages = ApsPagination.fetchPages(
      (_, _, params, _, _) => {
        val skip = "\"skip\":(\\d+)".r.findFirstMatchIn(params).get.group(1).toInt
        if (skip == 0)
          (200, Map.empty, """{"results": [{"i": 1}, {"i": 2}]}""".getBytes(UTF_8))
        else (200, Map.empty, """{"results": []}""".getBytes(UTF_8))
      },
      "http://aps.test/search", """{"q": "x"}""", take = 100, sleeper = _ => ())
    assert(pages.size == 2)
    // 404 after retries = loud IllegalStateException, never "done"
    intercept[IllegalStateException] {
      ApsPagination.fetchPages(
        (_, _, _, _, _) => (404, Map.empty, Array.emptyByteArray),
        "http://aps.test/search", """{"q": "x"}""", sleeper = _ => ())
    }
  }
}
