package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed `responses` / `artifacts` provenance tables
  * (reference storage/db.py:6–31), with:
  *
  * - K1 ordered id assignment: `row_number` over a DECLARED ordering
  *   (provider, item_index, stage) offset by the current max id —
  *   SQLite-AUTOINCREMENT-equivalent, deterministic, FK-join-safe
  *   (SURVEY.md §7 hard parts). This is a global sort: acceptable at
  *   provenance-table cardinality (one row per API call), and the one
  *   place the Spark plan is deliberately more expensive than the
  *   reference's counter.
  * - K2 dedup append: `dropDuplicates + left_anti` against the existing
  *   table = the reference's INSERT OR IGNORE on UNIQUE(source_url, sha256)
  *   (storage/db.py:76; dossier :266 idempotency rule).
  */
final class ProvenanceStore(spark: SparkSession, warehouseDir: String) {

  private val responsesPath = s"$warehouseDir/responses"
  private val artifactsPath = s"$warehouseDir/artifacts"

  def responses: DataFrame =
    readOrEmpty(responsesPath, Model.responsesSchema)

  def artifacts: DataFrame =
    readOrEmpty(artifactsPath, Model.artifactsSchema)

  private def readOrEmpty(path: String, schema: org.apache.spark.sql.types.StructType) =
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def maxId(df: DataFrame): Long =
    df.agg(coalesce(max(col("id")), lit(0L))).head().getLong(0)

  /** Append response rows, assigning contiguous ids after the current max.
    * Input columns: provider, method, url, params_json, status_code,
    * headers_json, body, item_index, stage (ordering keys).
    * Returns the appended rows WITH ids (for FK propagation, J1/J2). */
  def appendResponses(rows: DataFrame): DataFrame = {
    val base = maxId(responses)
    val w = Window.orderBy(col("provider"), col("item_index"), col("stage"), col("url"))
    val withIds = rows
      .withColumn("id", row_number().over(w) + lit(base))
      .withColumn("created_at", current_timestamp())
      .select(Model.responsesSchema.fieldNames.toIndexedSeq.map(col) :+ col("item_index") :+ col("stage"): _*)
    withIds.drop("item_index", "stage")
      .write.mode(SaveMode.Append).parquet(responsesPath)
    withIds
  }

  /** Dedup-append artifacts on (source_url, sha256); returns only the rows
    * actually inserted (the reference returns None for dups,
    * storage/db.py:64–83). Input: provider, source_url, sha256, bytes,
    * blob_path, response_id. */
  def appendArtifacts(rows: DataFrame): DataFrame = {
    val base = maxId(artifacts)
    val existing = artifacts.select("source_url", "sha256")
    val fresh = rows
      .dropDuplicates("source_url", "sha256")
      .join(existing, Seq("source_url", "sha256"), "left_anti")
    val w = Window.orderBy(col("provider"), col("source_url"), col("sha256"))
    val withIds = fresh
      .withColumn("id", row_number().over(w) + lit(base))
      .withColumn("created_at", current_timestamp())
      .select(Model.artifactsSchema.fieldNames.toIndexedSeq.map(col): _*)
    withIds.write.mode(SaveMode.Append).parquet(artifactsPath)
    withIds
  }
}
