package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.pipeline._
import graft.streaming.WatermarkSync
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** APS live skip-pagination (dossier :683–689, :708): stub-server tests for
  * the skip-until-empty loop, the page-size-cap robustness rule (APS-V8),
  * and the full T3 wiring — one watermark advance per sync, overlap rows
  * deduped by the anti-join. */
class ApsPaginationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val mapper = new ObjectMapper()

  /** Stub APS search endpoint paging over `corpus` (id, ts) by the skip in
    * the POST body; page size = min(requested take, serverCap). */
  private def withApsServer(corpus: () => Vector[(String, String)], serverCap: Int = 10)(
      f: (Int, () => Vector[Int]) => Unit): Unit = {
    val seenSkips = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      val skip = body.get("skip").asInt()
      val take = math.min(body.get("take").asInt(), serverCap)
      seenSkips.add(skip)
      val hits = corpus().slice(skip, skip + take)
        .map { case (id, ts) => s"""{"id":"$id","ts":"$ts"}""" }
      val resp = s"""{"results":[${hits.mkString(",")}]}""".getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try f(server.getAddress.getPort,
      () => { import scala.jdk.CollectionConverters._; seenSkips.asScala.toVector })
    finally server.stop(0)
  }

  private def doc(i: Int, ts: String): (String, String) = (f"ML$i%05d", ts)

  private def project(df: DataFrame): DataFrame = df.select(
    get_json_object(col("hit_json"), "$.id").as("doc_id"),
    to_timestamp(get_json_object(col("hit_json"), "$.ts")).as("ts"))

  test("skip-until-empty: three pages then the empty terminator, offsets advance by page size") {
    val corpus = (0 until 30).map(i => doc(i, "2026-01-01 00:00:00")).toVector
    withApsServer(() => corpus) { (port, skips) =>
      val pages = ApsPagination.fetchPages(HttpSource.jdkTransport(),
        s"http://127.0.0.1:$port/search", """{"q":"reactor"}""", take = 10)
      assert(pages.size == 4, "3 data pages + the fetched empty terminator")
      assert(skips() == Vector(0, 10, 20, 30))
      assert(pages.map(_.status_code).forall(_ == 200))
      val hits = ApsPagination.hitsDF(spark, pages)
      assert(hits.count() == 30)
      assert(hits.select("hit_index").distinct().count() == 10,
        "hit_index is per-page; skip column carries the global offset")
      assert(hits.select((col("skip") + col("hit_index")).as("g"))
        .distinct().count() == 30, "skip + hit_index covers every hit once")
    }
  }

  test("APS-V8: server silently caps the page size — skip advances by ACTUAL hits, none skipped") {
    val corpus = (0 until 12).map(i => doc(i, "2026-01-01 00:00:00")).toVector
    withApsServer(() => corpus, serverCap = 5) { (port, skips) =>
      val pages = ApsPagination.fetchPages(HttpSource.jdkTransport(),
        s"http://127.0.0.1:$port/search", """{"q":"reactor"}""", take = 100)
      assert(skips() == Vector(0, 5, 10, 12),
        "advancing by the requested take=100 would have skipped hits 5..99")
      val ids = ApsPagination.hitsDF(spark, pages)
        .select(get_json_object(col("hit_json"), "$.id")).distinct().count()
      assert(ids == 12, "every hit surfaced exactly once despite the cap")
    }
  }

  test("maxPages overrun fails loudly instead of truncating silently") {
    val corpus = (0 until 50).map(i => doc(i, "2026-01-01 00:00:00")).toVector
    withApsServer(() => corpus) { (port, _) =>
      val e = intercept[IllegalStateException] {
        ApsPagination.fetchPages(HttpSource.jdkTransport(),
          s"http://127.0.0.1:$port/search", "{}", take = 10, maxPages = 3)
      }
      assert(e.getMessage.contains("maxPages"))
    }
  }

  test("mid-loop 429/500 retries the SAME skip: no page skipped, none double-fetched") {
    // The untested seam between T3 (skip-offset pagination) and T6 (retry
    // machine): a transient failure on an interior page must be retried at
    // the SAME skip — advancing past it would silently drop hits, and
    // re-fetching an already-consumed page would double-land them. The
    // server 429s (with Retry-After) the first attempt at skip=10 and 500s
    // the first attempt at skip=20; both then succeed on retry.
    val corpus = (0 until 30).map(i => doc(i, "2026-01-01 00:00:00")).toVector
    val seenSkips = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      val skip = body.get("skip").asInt()
      seenSkips.add(skip)
      if ((skip == 10 || skip == 20) && failedOnce.add(skip)) {
        val status = if (skip == 10) 429 else 500
        if (skip == 10) ex.getResponseHeaders.add("Retry-After", "2")
        ex.sendResponseHeaders(status, -1L)
        ex.close()
      } else {
        val hits = corpus.slice(skip, skip + 10)
          .map { case (id, ts) => s"""{"id":"$id","ts":"$ts"}""" }
        val resp = s"""{"results":[${hits.mkString(",")}]}""".getBytes(UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val pages = ApsPagination.fetchPages(HttpSource.jdkTransport(),
        s"http://127.0.0.1:${server.getAddress.getPort}/search",
        """{"q":"reactor"}""", take = 10,
        sleeper = ms => sleeps.synchronized { sleeps += ms; () })
      // the captured page chain is clean: 3 data pages + empty terminator,
      // every returned page a 200 (failures were absorbed by the retry
      // machine, not surfaced as pages)
      assert(pages.size == 4 && pages.forall(_.status_code == 200))
      // request log: each failed skip re-requested exactly once, in order,
      // with no offset skipped or revisited after success
      import scala.jdk.CollectionConverters._
      assert(seenSkips.asScala.toVector == Vector(0, 10, 10, 20, 20, 30),
        s"retry must re-request the same skip: ${seenSkips.asScala.toVector}")
      // Retry-After: 2 was authoritative for the 429's backoff
      assert(sleeps.contains(2000L), s"Retry-After must drive the delay: $sleeps")
      // and the hit stream is complete with no duplicates
      val g = ApsPagination.hitsDF(spark, pages)
        .select(get_json_object(col("hit_json"), "$.id").as("id"))
      assert(g.count() == 30 && g.distinct().count() == 30,
        "every hit exactly once across the fault")
    } finally server.stop(0)
  }

  test("T3 sync: watermark advances once per sync, overlap rows dedup, reissues land once") {
    @volatile var corpus = (0 until 25).map(i => doc(i, "2026-01-03 10:00:00")).toVector
    withApsServer(() => corpus) { (port, _) =>
      val state = Files.createTempDirectory("aps_sync").toString
      def runSync() = ApsPagination.sync(spark, HttpSource.jdkTransport(),
        s"http://127.0.0.1:$port/search", """{"q":"reactor"}""", state,
        project, tsCol = "ts", keyCols = Seq("doc_id"), take = 10)

      val r1 = runSync()
      assert(r1.appended == 25)
      val wm1 = WatermarkSync.readWatermark(state)
      assert(wm1.contains(r1.watermarkMicros), "watermark persisted exactly once per sync")

      // next poll re-serves the same window (source overlap) plus 5 new
      // docs one hour later — only the new ones may land
      corpus = corpus ++ (100 until 105).map(i => doc(i, "2026-01-03 11:00:00"))
      val r2 = runSync()
      assert(r2.appended == 5, s"overlap must dedup, appended=${r2.appended}")
      assert(r2.watermarkMicros > r1.watermarkMicros, "watermark advanced to the new max")

      val landed = WatermarkSync.stored(spark, state).get
      assert(landed.count() == 30)
      assert(landed.select("doc_id").distinct().count() == 30, "no duplicate keys landed")
    }
  }
}
