package graft.pipeline

import org.apache.spark.sql.types._

/** Core record types of the ingest spine, mirroring the reference's
  * dataclasses and DDL (SURVEY.md §1.1).
  *
  * - `CapturedResponse` ← reference http_client.py:14–21
  * - `responses` table  ← reference storage/db.py:7–17
  * - `artifacts` table  ← reference storage/db.py:19–30 (UNIQUE(source_url, sha256))
  * - parse_error dict   ← reference sec_edgar.py:37–44, nrc_adams_aps.py:38–46
  */
object Model {

  /** One work item from a connector's plan (reference connectors/base.py:18–20). */
  case class PlanItem(provider: String, item_index: Int, params_json: String)

  /** A fetch request flowing into the source (method, url, optional JSON
    * body, fixture name for offline mode). */
  case class FetchRequest(
      provider: String,
      item_index: Int,
      stage: String, // "metadata" | "artifact"
      method: String,
      url: String,
      params_json: String,
      fixture_name: String)

  /** One HTTP attempt record — the observer side-output feeding the capture
    * sinks (reference http_client.py:24–35, run_capture.py:25–36). */
  case class AttemptRecord(
      provider: String,
      item_index: Int,
      stage: String,
      method: String,
      url: String,
      attempt_number: Int,
      status_code: Int,
      request_headers: Map[String, String],
      response_headers: Map[String, String],
      error_type: String,
      error_message: String)

  /** The captured response for a request, with its attempt trail.
    * status_code == 0 → transport failure after retries
    * (reference http_client.py:195–213). */
  case class CapturedFetch(
      provider: String,
      item_index: Int,
      stage: String,
      method: String,
      url: String,
      params_json: String,
      status_code: Int,
      headers_json: String,
      body: Array[Byte],
      attempts: Seq[AttemptRecord])

  /** Dead-letter record (reference parse_error dicts; F6 routing). */
  case class ParseError(
      provider: String,
      stage: String,
      message: String,
      url: String,
      item_index: Int,
      response_id: Long)

  val responsesSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("provider", StringType, nullable = false),
    StructField("method", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("params_json", StringType, nullable = true),
    StructField("status_code", IntegerType, nullable = false),
    StructField("headers_json", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("created_at", TimestampType, nullable = false)))

  val artifactsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("provider", StringType, nullable = false),
    StructField("source_url", StringType, nullable = false),
    StructField("sha256", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("blob_path", StringType, nullable = false),
    StructField("response_id", LongType, nullable = true),
    StructField("created_at", TimestampType, nullable = false)))

  /** SEC submissions payload schema — PERMISSIVE from_json reproduces the
    * reference's `_safe_json` + guarded traversal (sec_edgar.py:65–83);
    * unknown fields drop, missing fields go null. */
  val secSubmissionsSchema: StructType = StructType(Seq(
    StructField("cik", StringType),
    StructField("name", StringType),
    StructField("filings", StructType(Seq(
      StructField("recent", StructType(Seq(
        StructField("accessionNumber", ArrayType(StringType)),
        StructField("primaryDocument", ArrayType(StringType))))))))))

  /** APS search response schema covering both envelope case-variants and
    * all pdf-url fallback keys (nrc_adams_aps.py:92–111; dossier :600–634).
    * NOTE: usable for from_json only under spark.sql.caseSensitive=true —
    * the case-variant sibling keys are ambiguous to the default resolver;
    * NrcAdamsApsConnector.extract therefore uses explicit JSON paths. */
  val apsResultSchema: StructType = StructType(Seq(
    StructField("accessionNumber", StringType),
    StructField("pdfUrl", StringType),
    StructField("PdfUrl", StringType),
    StructField("Url", StringType),
    StructField("url", StringType),
    StructField("document", StructType(Seq(
      StructField("Url", StringType),
      StructField("url", StringType))))))

  val apsSearchSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(apsResultSchema)),
    StructField("Results", ArrayType(apsResultSchema)),
    StructField("documents", ArrayType(apsResultSchema))))

  /** Sensitive header keys (reference run_capture.py:11–22); a key is also
    * sensitive when it contains token/secret/pass (run_capture.py:234–237). */
  val sensitiveKeys: Set[String] = Set(
    "authorization", "proxy-authorization", "cookie", "set-cookie",
    "x-api-key", "api-key", "apikey", "x-subscription-key",
    "subscription-key", "ocp-apim-subscription-key")

  val redactedValue = "***REDACTED***"
}
