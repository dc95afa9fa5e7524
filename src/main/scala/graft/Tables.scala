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

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read the raw int64 nanos (legacy conf) and floor-truncate to
    * Spark's native microsecond timestamps — same truncation DuckDB/pandas
    * apply when downcasting ns→us, so oracle comparisons stay exact.
    *
    * The legacy conf must be set at SESSION BUILD (Bench/Verify/Main/test
    * wrapper all do) — a loader mutating session conf on every call is a
    * global side effect this deliberately refuses to repeat. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      throw new IllegalStateException(
        "events.parquet is TIMESTAMP(NANOS): set " +
          "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession " +
          "builder (see graft.Bench/Verify/Main)")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    eventsRaw(spark, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
