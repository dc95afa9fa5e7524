package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dossier's shared emission contract (reference
  * docs/Golden_Record_API_Dossiers.md:792–827, Appendix A): every provider
  * normalizes to one record shape so downstream consumers join/dedupe on
  * provider-neutral keys:
  *
  *   _schema_version, provider, accession_number, docket_number,
  *   document_date DATE, date_added_timestamp TIMESTAMP, url, sha256,
  *   bytes, fetched_at TIMESTAMP, retention_allowed
  *
  * Mapping is pure column expressions (`coalesce` across the provider's
  * case/location variants, permissive casts) — the APS compatibility
  * mapper of SURVEY.md §7 step 4.
  */
object EmissionContract {

  val schemaVersion = "1"

  val columns: Seq[String] = Seq(
    "_schema_version", "provider", "accession_number", "docket_number",
    "document_date", "date_added_timestamp", "url", "sha256", "bytes",
    "fetched_at", "retention_allowed")

  private def firstExisting(df: DataFrame, names: Seq[String]): Column = {
    val present = names.filter(df.columns.contains)
    if (present.isEmpty) lit(null).cast("string")
    else coalesce(present.map(col): _*)
  }

  /** Normalize APS search-result rows (field variants per dossier
    * :600–634: AccessionNumber/accessionNumber, DocumentDate, DocketNumber,
    * DateAddedTimestamp, pdfUrl/PdfUrl/Url/url). Expects one row per
    * result with provider-native column names; absent columns → null. */
  def fromAps(results: DataFrame): DataFrame =
    results.select(
      lit(schemaVersion).as("_schema_version"),
      lit("nrc_adams_aps").as("provider"),
      firstExisting(results, Seq("AccessionNumber", "accessionNumber"))
        .as("accession_number"),
      firstExisting(results, Seq("DocketNumber", "docketNumber"))
        .as("docket_number"),
      to_date(firstExisting(results, Seq("DocumentDate", "documentDate")))
        .as("document_date"),
      to_timestamp(firstExisting(results,
        Seq("DateAddedTimestamp", "dateAddedTimestamp"))).as("date_added_timestamp"),
      firstExisting(results, Seq("pdfUrl", "PdfUrl", "Url", "url")).as("url"),
      firstExisting(results, Seq("sha256")).as("sha256"),
      firstExisting(results, Seq("bytes")).cast("long").as("bytes"),
      firstExisting(results, Seq("fetched_at")).cast("timestamp").as("fetched_at"),
      coalesce(firstExisting(results, Seq("retention_allowed")), lit("unknown"))
        .as("retention_allowed"))

  /** Normalize EDGAR filing rows (dossier :174–191: accessionNumber,
    * filingDate, acceptanceDateTime arrays already exploded to rows). */
  def fromEdgar(filings: DataFrame): DataFrame =
    filings.select(
      lit(schemaVersion).as("_schema_version"),
      lit("sec_edgar").as("provider"),
      firstExisting(filings, Seq("accessionNumber", "accession_number"))
        .as("accession_number"),
      lit(null).cast("string").as("docket_number"),
      to_date(firstExisting(filings, Seq("filingDate", "filing_date")))
        .as("document_date"),
      to_timestamp(firstExisting(filings,
        Seq("acceptanceDateTime", "acceptance_date_time"))).as("date_added_timestamp"),
      firstExisting(filings, Seq("url", "artifact_url")).as("url"),
      firstExisting(filings, Seq("sha256")).as("sha256"),
      firstExisting(filings, Seq("bytes")).cast("long").as("bytes"),
      firstExisting(filings, Seq("fetched_at")).cast("timestamp").as("fetched_at"),
      coalesce(firstExisting(filings, Seq("retention_allowed")), lit("unknown"))
        .as("retention_allowed"))

  /** The dossier's dual accession forms — "your idempotency keys and join
    * keys between discovery JSON and Archives artifacts" (dossier :168). */
  def withAccessionForms(df: DataFrame): DataFrame =
    df.withColumn("accession_nodash", regexp_replace(col("accession_number"), "-", ""))
      .withColumn("accession_dashed",
        when(col("accession_number").contains("-"), col("accession_number"))
          .otherwise(concat_ws("-",
            substring(col("accession_number"), 1, 10),
            substring(col("accession_number"), 11, 2),
            substring(col("accession_number"), 13, 6))))
}
