package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(spark, sfDir)` and reads
  * only the tables it needs — column pruning + filter pushdown then reach
  * the parquet scan, which is what keeps this viable at 100 TB (scan only
  * what the query touches, never a driver-side collect).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Reads events.parquet tolerating either physical `ts` encoding the
    * driver has shipped: TIMESTAMP(NANOS) (surfaces as int64 under the
    * legacy `nanosAsLong` conf) or plain timestamp[us] (surfaces as
    * TIMESTAMP / TIMESTAMP_NTZ). Schema drift at this one physical
    * boundary must not take queries down — the engine-side analogue of the
    * reference's tolerate-unknown-fields mandate (SURVEY §1;
    * Golden_Record_API_Dossiers.md:23,302, sec_edgar.py:65-71 `_safe_json`).
    *
    * The legacy conf, when the nanos encoding needs it, must be set at
    * SESSION BUILD (Bench/Verify/Main/test wrapper all do) — a loader
    * mutating session conf on every call is a global side effect this
    * deliberately refuses to repeat; for µs-typed data the conf is a no-op. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    try spark.read.parquet(s"$dir/events.parquet")
    catch {
      case e: Throwable
          if String.valueOf(e.getMessage).contains("NANOS") &&
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true" =>
        throw new IllegalStateException(
          "events.parquet is TIMESTAMP(NANOS): set " +
            "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession " +
            "builder (see graft.Bench/Verify/Main)", e)
    }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** Normalizes `ts` to session-zoned TimestampType (µs) regardless of the
    * physical encoding on disk:
    *  - int64 nanos (legacy conf path): floor-truncate ns→µs — the same
    *    truncation DuckDB/pandas apply when downcasting, so oracle
    *    comparisons stay exact;
    *  - timestamp[us] not adjusted to UTC (TIMESTAMP_NTZ): reinterpret in
    *    the session zone (UTC everywhere in this repo) — value-preserving;
    *  - timestamp[us] adjusted to UTC (TIMESTAMP): already the target type. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.parquet ts has unsupported physical type $other " +
          "(expected int64-nanos, timestamp, or timestamp_ntz)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
