package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, SparkSession}
import Model._

/** The rate-limited, retrying fetch source (reference http_client.py:121–313)
  * as a `mapPartitions` stage over a Dataset of requests.
  *
  * Transport is pluggable so the full retry/rate/caps state machine is
  * testable without network (the reference's own tests inject fake
  * transports, tests/test_capture_hardening.py:60–96). The offline
  * transport resolves `fixtures/<provider>/<fixture_name>` — offline is the
  * default mode in the reference (cli.py:33, http_client.py:75–76).
  *
  * Scale design:
  * - requests are repartitioned BY HOST so each host's rate budget is
  *   enforced inside a single partition (reference limiter is
  *   process-global; SURVEY.md §7 hard parts);
  * - retries live INSIDE the partition function — Spark task retries are
  *   too coarse (they would redo the whole partition);
  * - attempts are emitted as rows alongside the response (the observer
  *   pattern, http_client.py:47 → side-output), not callbacks;
  * - idempotency under task re-execution comes from the downstream sinks
  *   (K2 anti-join dedup, K3 write-if-absent), not from the source.
  */
object HttpSource {

  /** (method, url, bodyJson) → (status, headers, body); throws for
    * transport errors. */
  type Transport = (String, String, String) => (Int, Map[String, String], Array[Byte])

  val retryAttempts = 3

  /** Retryable = 429, 403, or 5xx (reference http_client.py:111–112). */
  def isRetryableStatus(status: Int): Boolean =
    status == 429 || status == 403 || status >= 500

  /** Run the fetch state machine for every request; emits one CapturedFetch
    * per request (status 0 + error attempts if all retries failed). */
  def fetch(
      spark: SparkSession,
      requests: Dataset[FetchRequest],
      transport: Transport,
      offlineFixtureRoot: Option[String],
      maxArtifactBytes: Long = 50L * 1024 * 1024,
      hostParallelism: Int = 1): Dataset[CapturedFetch] = {
    import spark.implicits._
    val root = offlineFixtureRoot
    // partition by host so per-host rate budgets hold cluster-wide
    val byHost = requests.repartition(math.max(hostParallelism, 1), requests("url"))
    byHost.mapPartitions { it =>
      val limiter = new RateLimiter
      it.map { req =>
        root match {
          case Some(dir) => offlineFetch(dir, req)
          case None      => liveFetch(limiter, transport, req, maxArtifactBytes)
        }
      }
    }
  }

  /** Offline path: read fixture file, synthesize 200 + x-fixture header;
    * missing file → status 0 capture (the reference raises, but the
    * Spark-native form dead-letters the row instead of failing the job). */
  def offlineFetch(fixtureRoot: String, req: FetchRequest): CapturedFetch = {
    val path = Paths.get(fixtureRoot, req.provider, req.fixture_name)
    val headers = Map("x-fixture" -> req.fixture_name)
    if (Files.exists(path)) {
      val body = Files.readAllBytes(path)
      CapturedFetch(req.provider, req.item_index, req.stage, req.method, req.url,
        req.params_json, 200, headersJson(headers), body,
        Seq(AttemptRecord(req.provider, req.item_index, req.stage, req.method,
          req.url, 1, 200, Map.empty, headers, null, null)))
    } else {
      CapturedFetch(req.provider, req.item_index, req.stage, req.method, req.url,
        req.params_json, 0, headersJson(Map.empty), Array.emptyByteArray,
        Seq(AttemptRecord(req.provider, req.item_index, req.stage, req.method,
          req.url, 1, 0, Map.empty, Map.empty,
          "FixtureMissing", s"fixture not found: $path")))
    }
  }

  /** Exponential backoff with deterministic jitter (dossier :54–60:
    * exp backoff + jitter; Retry-After authoritative when the server sends
    * it; 404 terminal — 404 is not in the retryable set). Deterministic
    * jitter (hash of url+attempt) keeps re-executed partitions
    * reproducible. */
  def backoffMs(url: String, attempt: Int,
                retryAfterHeader: Option[String]): Long =
    retryAfterHeader.flatMap(s => scala.util.Try(s.trim.toLong).toOption) match {
      case Some(seconds) => seconds * 1000L
      case None =>
        val base = math.min(500L << (attempt - 1), 5000L)
        val jitter = math.abs((url + "#" + attempt).hashCode % 100L)
        base + jitter
    }

  /** Live path: rate-limit per host, 3 attempts, retryable-status and
    * transport-error retry with backoff, size cap as a dead-letter
    * condition (http_client.py:163–216). `sleeper` is injectable so tests
    * observe the schedule instead of waiting it out. */
  def liveFetch(
      limiter: RateLimiter,
      transport: Transport,
      req: FetchRequest,
      maxArtifactBytes: Long,
      sleeper: Long => Unit = Thread.sleep): CapturedFetch = {
    val host = hostOf(req.url)
    var attempts = Vector.empty[AttemptRecord]
    var result: Option[CapturedFetch] = None
    var n = 0
    while (n < retryAttempts && result.isEmpty) {
      n += 1
      limiter.acquireHost(host)
      try {
        val (status, respHeaders, body) = transport(req.method, req.url, req.params_json)
        attempts :+= AttemptRecord(req.provider, req.item_index, req.stage,
          req.method, req.url, n, status, Map.empty, respHeaders, null, null)
        if (isRetryableStatus(status)) {
          if (n < retryAttempts) {
            val retryAfter = respHeaders.collectFirst {
              case (k, v) if k.equalsIgnoreCase("retry-after") => v
            }
            sleeper(backoffMs(req.url, n, retryAfter))
          }
          if (n == retryAttempts)
            result = Some(CapturedFetch(req.provider, req.item_index, req.stage,
              req.method, req.url, req.params_json, status,
              headersJson(respHeaders), body, attempts))
        } else if (body.length > maxArtifactBytes) {
          // F5: cap violation fails the ROW, not the job
          result = Some(CapturedFetch(req.provider, req.item_index, req.stage,
            req.method, req.url, req.params_json, 0, headersJson(respHeaders),
            Array.emptyByteArray,
            attempts.dropRight(1) :+ attempts.last.copy(
              error_type = "SizeCapExceeded",
              error_message = s"body ${body.length} > cap $maxArtifactBytes")))
        } else {
          result = Some(CapturedFetch(req.provider, req.item_index, req.stage,
            req.method, req.url, req.params_json, status,
            headersJson(respHeaders), body, attempts))
        }
      } catch {
        case e: Exception =>
          attempts :+= AttemptRecord(req.provider, req.item_index, req.stage,
            req.method, req.url, n, 0, Map.empty, Map.empty,
            e.getClass.getSimpleName, String.valueOf(e.getMessage))
          if (n < retryAttempts) sleeper(backoffMs(req.url, n, None))
          if (n == retryAttempts)
            result = Some(CapturedFetch(req.provider, req.item_index, req.stage,
              req.method, req.url, req.params_json, 0, headersJson(Map.empty),
              Array.emptyByteArray, attempts))
      }
    }
    result.get
  }

  def hostOf(url: String): String =
    try new java.net.URI(url).getHost match { case null => ""; case h => h }
    catch { case _: Exception => "" }

  /** Deterministic sorted-key JSON encoding of headers (reference
    * json.dumps(sort_keys=True), http_client.py:152). */
  def headersJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{", ", ", "}")

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
