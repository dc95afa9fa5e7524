package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental watermark sync — the T2/T3 contract (reference dossier
  * :224–241, :692–725) in its batch form:
  *
  *   1. read the persisted watermark W (checkpoint hook, base.py:32–34)
  *   2. take incoming rows with ts >= W - overlap (re-read the overlap
  *      window to catch late re-issues)
  *   3. anti-join stored keys (the K2 idempotency rule) so the overlap
  *      never duplicates
  *   4. append survivors, advance W to max(ts) observed
  *
  * State layout under `stateDir`: `data/` (parquet) + `watermark` (epoch
  * micros text). At scale, `data/` is a partitioned table and the anti-join
  * runs against only the partitions inside the overlap horizon — bounded
  * work regardless of history size.
  */
object WatermarkSync {

  case class SyncResult(appended: Long, watermarkMicros: Long)

  private def wmPath(stateDir: String) = Paths.get(stateDir, "watermark")
  private def dataPath(stateDir: String) = s"$stateDir/data"

  def readWatermark(stateDir: String): Option[Long] = {
    val p = wmPath(stateDir)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  def stored(spark: SparkSession, stateDir: String): Option[DataFrame] =
    if (new java.io.File(dataPath(stateDir)).exists())
      Some(spark.read.parquet(dataPath(stateDir)))
    else None

  /** One sync batch. `incoming` must carry `tsCol` (timestamp) and
    * `keyCols`; rows whose key already landed are dropped (reissues with
    * the SAME key are deduped — hash-diff reissue handling is
    * [[Streams.reconcile]]'s job, a separate reconciliation pass). */
  def syncBatch(
      spark: SparkSession,
      incoming: DataFrame,
      stateDir: String,
      tsCol: String,
      keyCols: Seq[String],
      overlap: String = "48 hours"): SyncResult = {
    Files.createDirectories(Paths.get(stateDir))
    val horizon = readWatermark(stateDir) match {
      case Some(wm) =>
        incoming.filter(
          col(tsCol) >= timestamp_micros(lit(wm)) - expr(s"INTERVAL $overlap"))
      case None => incoming
    }
    val fresh = stored(spark, stateDir) match {
      case Some(existing) =>
        horizon.join(existing.select(keyCols.map(col): _*).dropDuplicates(),
          keyCols, "left_anti")
      case None => horizon
    }
    val deduped = fresh.dropDuplicates(keyCols)
    val n = deduped.count()
    if (n > 0) deduped.write.mode(SaveMode.Append).parquet(dataPath(stateDir))
    val newWm = stored(spark, stateDir).get
      .agg(max(unix_micros(col(tsCol)))).head().getLong(0)
    Files.write(wmPath(stateDir), newWm.toString.getBytes("UTF-8"))
    SyncResult(n, newWm)
  }
}
