package graft.pipeline

import graft.streaming.WatermarkSync
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper

/** APS live skip-pagination (reference dossier :683–689: pagination is
  * offset-based via `skip`; :708 MVP step 3: "Page by skip until results
  * array is empty"; :752 APS-V6 stop condition; :754 APS-V8 page-size cap):
  * the source-internal microbatch loop that T3 watermark syncs consume.
  *
  * Shape: pages are a SERIAL chain (page N's emptiness decides whether
  * page N+1 is requested), so the loop runs on the driver, one
  * [[HttpSource.liveFetch]] per page — each page still gets the full
  * retry/backoff/rate-limit machinery, and the per-(subscription-key, host)
  * APS budget holds because one loop = one RateLimiter. The fetched pages
  * then explode into one row per hit as a DataFrame, and
  * [[WatermarkSync.syncBatch]] does horizon filtering, anti-join dedup, and
  * watermark advance exactly as for any other incoming batch.
  *
  * Driver memory is bounded by take × maxPages hit envelopes per sync —
  * a sync microbatch, not the corpus; the landed table under
  * `WatermarkSync` is the thing that grows, and it lives in partitioned
  * parquet. `skip` advances by the ACTUAL hit count of each page, not by
  * `take`: APS-V8 documents that servers may silently cap the page size,
  * and advancing by the request's `take` would then skip unseen hits.
  */
object ApsPagination {

  private def mapper = new ObjectMapper()

  /** Envelope precedence mirrors the extract chain (results > Results >
    * documents, Connectors P2). */
  private val envelopes = Seq("results", "Results", "documents")

  /** Base search params + this page's skip/take, as the POST body. */
  private[graft] def pageParams(baseParamsJson: String, skip: Int, take: Int): String = {
    val m = mapper
    val node = Option(baseParamsJson).filter(_.trim.nonEmpty)
      .map(m.readTree) match {
      case Some(o: com.fasterxml.jackson.databind.node.ObjectNode) => o
      case _ => m.createObjectNode()
    }
    node.put("skip", skip)
    node.put("take", take)
    m.writeValueAsString(node)
  }

  /** JSON strings of the hits in a page body, from the first present
    * envelope array; empty for non-JSON bodies, missing envelopes, and the
    * `count: 0` terminal shape (APS-V6 lists both stop signals — an empty
    * array and a zero count both yield no hits here). */
  private[graft] def pageHits(body: Array[Byte]): Vector[String] = {
    val root =
      try mapper.readTree(body)
      catch { case _: Exception => null }
    if (root == null || !root.isObject) Vector.empty
    else envelopes.iterator
      .map(root.get)
      .collectFirst { case arr if arr != null && arr.isArray && arr.size() > 0 =>
        (0 until arr.size()).map(i => arr.get(i).toString).toVector }
      .getOrElse(Vector.empty)
  }

  /** POST the search repeatedly, skip = 0, then += each page's hit count,
    * until a page comes back empty (the dossier's stop condition) — the
    * terminal empty page is included in the returned captures (it was
    * fetched; the capture sinks should see it). A non-200 page after
    * retries fails the sync loudly (F2 status gate — a half-paginated sync
    * that looks complete is worse than a failed one), as does overrunning
    * `maxPages` (no silent truncation). */
  def fetchPages(
      transport: HttpSource.Transport,
      url: String,
      baseParamsJson: String,
      take: Int = 100,
      maxPages: Int = 1000,
      config: HttpSource.HttpConfig = HttpSource.HttpConfig(),
      provider: String = "nrc_adams_aps",
      maxArtifactBytes: Long = 50L * 1024 * 1024,
      sleeper: Long => Unit = Thread.sleep): Vector[Model.CapturedFetch] = {
    val limiter = new RateLimiter
    var pages = Vector.empty[Model.CapturedFetch]
    var skip = 0
    var done = false
    var pageNo = 0
    while (!done) {
      if (pageNo >= maxPages)
        throw new IllegalStateException(
          s"APS pagination exceeded maxPages=$maxPages at skip=$skip — refusing to truncate silently")
      pageNo += 1
      val req = Model.FetchRequest(provider, pageNo - 1, "metadata", "POST",
        url, pageParams(baseParamsJson, skip, take), "search.json")
      val page = HttpSource.liveFetch(limiter, transport, req, maxArtifactBytes,
        sleeper = sleeper, config = config)
      if (page.status_code != 200)
        throw new IllegalStateException(
          s"APS search page at skip=$skip failed with status ${page.status_code} after retries")
      pages :+= page
      val n = pageHits(page.body).size
      if (n == 0) done = true else skip += n
    }
    pages
  }

  /** One row per hit across the fetched pages:
    * (page_index, skip, hit_index, hit_json). The driver already parsed
    * each body for the stop probe; re-emitting the hit strings costs
    * nothing extra, and everything AFTER this point — projection, horizon
    * filter, anti-join, landing — is distributed. */
  def hitsDF(spark: SparkSession, pages: Seq[Model.CapturedFetch]): DataFrame = {
    import spark.implicits._
    var skip = 0
    pages.zipWithIndex.flatMap { case (page, pi) =>
      val hits = pageHits(page.body)
      val rows = hits.zipWithIndex.map { case (h, hi) => (pi, skip, hi, h) }
      skip += hits.size
      rows
    }.toDF("page_index", "skip", "hit_index", "hit_json")
  }

  /** A full live sync: skip-paginate the search, explode hits, project them
    * to sync rows (`project` maps hit_json to `tsCol` + `keyCols` — schema
    * is connector-specific), then [[WatermarkSync.syncBatch]] dedups the
    * overlap window and advances the watermark exactly once. */
  def sync(
      spark: SparkSession,
      transport: HttpSource.Transport,
      url: String,
      baseParamsJson: String,
      stateDir: String,
      project: DataFrame => DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      take: Int = 100,
      maxPages: Int = 1000,
      overlap: String = "48 hours",
      config: HttpSource.HttpConfig = HttpSource.HttpConfig(),
      sleeper: Long => Unit = Thread.sleep): WatermarkSync.SyncResult = {
    val pages = fetchPages(transport, url, baseParamsJson, take, maxPages,
      config, sleeper = sleeper)
    WatermarkSync.syncBatch(spark, project(hitsDF(spark, pages)), stateDir,
      tsCol, keyCols, overlap)
  }
}
