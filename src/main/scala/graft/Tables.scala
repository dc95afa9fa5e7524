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

  /** Deterministic hash key per table for [[spread]] — the table's id
    * column (high-cardinality, so 32-way hashing is even; never rand()). */
  private val spreadKeys: Map[String, String] = Map(
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Below this input size the single-task scan finishes faster than the
    * extra exchange + N-task scheduling round it would take to spread it. */
  private val minSpreadBytes = 256L * 1024

  /** (path, mtime) → total input bytes; a stat per table per process,
    * cached so repeated bench runs don't re-stat (it caches a FILE SIZE
    * only — never data or results). Keyed on modification time so a
    * dataset regenerated in-process at a different size gets a fresh
    * spread decision, and FAILED stats are never cached (both r16
    * ADVICE): a transient FS error returns 0 for THIS call only —
    * NonFatal-only, so OOM/interrupts propagate. */
  private val sizeCache = new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]

  private def inputBytes(spark: SparkSession, path: String): Long =
    try {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(hp)) 0L
      else {
        val mtime = fs.getFileStatus(hp).getModificationTime
        sizeCache.computeIfAbsent((path, mtime),
          _ => fs.getContentSummary(hp).getLength)
      }
    } catch { case scala.util.control.NonFatal(_) => 0L }

  /** Scale-adaptive split-deficiency fix (optimization guide §2.5 input
    * skew / §6 split size): the driver's test parquet ships ONE row group
    * per file, so byte-range splitting cannot parallelize the scan and
    * every operator fused into the scan stage runs on a single core
    * while the other 31 idle — measured (JobProfile r16) as the dominant
    * cost of the hash-fold headline lanes at sf0.1: q55b's md5-plane
    * margin fold 2.7 s / q52's md5 signature fold 2.1 s, each one task.
    * The fix is [[operators.Multimodal.spreadByDocId]]'s repartition,
    * generalized but GATED ON MEASURED INPUT SIZE: spread only when the
    * scan's size-estimated split count is below the session's
    * parallelism (and the input is big enough for the exchange to pay
    * for itself). At production scale inputBytes/maxPartitionBytes
    * vastly exceeds any core count, so this is a structural no-op —
    * never a constant tuned for local[32].
    *
    * Applied PER CONSUMER, not in [[load]]: a blanket spread was A/B'd
    * across the full headline (r16 opt round, OPTIMIZATION_r16.md) and
    * the exchange it adds only pays where heavy per-row expression work
    * (md5/shingle folds over every row) is fused into the scan stage —
    * q55b 4.04→1.40 s, q52 2.77→1.40 s — while lanes whose scan feeds
    * cheap work ate the exchange as pure cost (q03 +1.3 s, q24/q36/q09
    * +0.5 s each). Only the measured winners call these entry points.
    * Partition count is EXPLICIT (repartition(n, key)): AQE would
    * coalesce a column-only repartition of small data straight back to
    * one partition — the failure being fixed, since the cost is CPU in
    * downstream expressions, invisible to size-based coalescing.
    *
    * Known bound (r16 ADVICE): the split estimate is bytes-based, so a
    * LARGE input laid out as few single-row-group files would pass the
    * gate yet still scan under-parallel. Production inputs are assumed
    * to have properly sized row groups (the write path's own shard
    * sizing guarantees it for engine-written data); the bytes gate is
    * deliberate — a row-group count would need a footer read per file
    * on the driver, which the 100 TB listing budget does not want. */
  private def spread(spark: SparkSession, dir: String, name: String,
      df: DataFrame): DataFrame =
    spreadKeys.get(name) match {
      case Some(key) =>
        val bytes = inputBytes(spark, s"$dir/$name.parquet")
        val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
        val estSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
        val par = spark.sparkContext.defaultParallelism
        if (bytes >= minSpreadBytes && estSplits < par)
          df.repartition(par, org.apache.spark.sql.functions.col(key))
        else df
      case None => df
    }

  /** [[documents]] with the split-deficiency spread — for consumers whose
    * scan stage fuses corpus-sized hash/fold work (see [[spread]]). */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    spread(spark, dir, "documents", documents(spark, dir))

  /** [[embeddings]] with the split-deficiency spread — see [[spread]]. */
  def embeddingsSpread(spark: SparkSession, dir: String): DataFrame =
    spread(spark, dir, "embeddings", embeddings(spark, dir))

  /** Partition count for an exchange feeding CPU-heavy per-row work
    * (guide §2.5): never below the session's core count or its configured
    * shuffle partitions. Used as an EXPLICIT repartition count where AQE's
    * byte-based coalescing would otherwise serialize a compute-bound
    * stage — coalescing targets ~64 MB of shuffle bytes per partition and
    * cannot see expression cost, so a few MB of candidate rows whose
    * verify work is seconds of CPU lands on 1–2 tasks (measured on q78:
    * two 2-task stages at ~0.95 s CPU per task). At production scale both
    * inputs to the max are deployment-sized (cluster cores / configured
    * shuffle partitions), so nothing here is a local constant. */
  def computeParallelism(spark: SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)

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
