package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-addressed blob sink (reference storage/blob_store.py:4–14):
  * `root/<sha256[:2]>/<sha256>`, write-if-absent.
  *
  * Spark-native: a `foreachPartition` writer over (sha256, body) — Spark
  * has no binary-file writer (K3/K5). Write-if-absent makes the sink
  * idempotent under task re-execution: same key ⇒ same bytes, so a
  * re-executed partition is a no-op. Writes go via a temp file + atomic
  * move so a killed task never leaves a torn blob.
  */
object BlobStore {

  def blobPath(root: String, sha256: String): String =
    s"$root/${sha256.substring(0, 2)}/$sha256"

  /** Write every distinct (sha256, body) into the store. Input df must
    * have columns `sha256` (string) and `body` (binary). */
  def put(df: DataFrame, root: String): Unit = {
    df.select(col("sha256"), col("body"))
      .dropDuplicates("sha256")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val sha = r.getString(0)
          val body = r.getAs[Array[Byte]](1)
          val target = Paths.get(blobPath(root, sha))
          if (!Files.exists(target)) {
            Files.createDirectories(target.getParent)
            val tmp = Files.createTempFile(target.getParent, s".$sha", ".tmp")
            try {
              Files.write(tmp, body)
              Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
            } finally Files.deleteIfExists(tmp)
          }
        }
      }
  }
}
