package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY with typed
  * metadata, processed partition-batch-wise.
  *
  * The Spark-side plumbing — schema, partition-parallel batch processing,
  * row shape — is real and tested; the codec itself is STUBBED with a
  * deterministic fake (this container has no image/audio libraries). On a
  * real cluster, [[StubCodec]] is the one seam to swap for JavaCV/ffmpeg
  * bindings; everything else (batching, schema, partitioning) is
  * production-shaped. Binary payloads never shuffle: decode/feature steps
  * are narrow mapPartitions over the scan, and only the small extracted
  * features flow onward.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  case class MediaAsset(asset_id: Long, mime: String, bytes: Array[Byte])

  /** Decoded image features (the stub derives them deterministically from
    * the bytes so tests are stable). */
  case class ImageFeatures(asset_id: Long, width: Int, height: Int,
      n_bytes: Long, feature: Array[Float])

  /** One sampled video frame reference. */
  case class FrameSample(asset_id: Long, frame_index: Int, frame_sha: String)

  /** STUB codec — deterministic fake decode keyed on content bytes.
    * Swap for a real decoder (JavaCV / TwelveMonkeys / ffmpeg) on a
    * cluster with media libraries. */
  object StubCodec extends Serializable {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val h = java.util.Arrays.hashCode(bytes)
      val width = 64 + math.abs(h % 512)
      val height = 64 + math.abs((h / 512) % 512)
      val feature = Array.tabulate(8)(i =>
        (((h * 31 + i * 2654435761L) & 0xffff).toFloat) / 65535.0f)
      (width, height, feature)
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + (bytes.length % 7)
  }

  /** Decode + feature-extract, batch-per-partition (the mapInPandas shape:
    * iterator-of-batches in, iterator-of-batches out — here Scala's
    * mapPartitions, which is the idiomatic JVM equivalent). */
  def imageFeatures(assets: Dataset[MediaAsset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (w, h, f) = StubCodec.decodeImage(a.bytes)
        ImageFeatures(a.asset_id, w, h, a.bytes.length.toLong, f)
      }
    }
  }

  /** Frame sampling: every k-th frame of each video, frames addressed by
    * content hash (K3-compatible keys for a downstream blob store). */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int = 2): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { a =>
        val n = StubCodec.frameCount(a.bytes)
        (0 until n by everyK).map { i =>
          md.reset()
          md.update(a.bytes)
          md.update(BigInt(i).toByteArray)
          FrameSample(a.asset_id, i, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Oracle-checked query: binary-column plumbing over real testdata —
    * text encoded to BINARY, hashed and measured as opaque bytes (the same
    * X0/X8 path artifact bodies take). */
  def defs: Map[String, QueryDef] = Map(
    "q60_binary_columns" -> QueryDef.sql(
      """SELECT doc_id,
        |  sha256(text) AS body_sha256,
        |  octet_length(encode(text)) AS body_bytes,
        |  substring(sha256(text), 1, 2) AS blob_shard
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text").cast("binary").as("body"))
        .select(col("doc_id"),
          sha2(col("body"), 256).as("body_sha256"),
          octet_length(col("body")).cast("long").as("body_bytes"),
          substring(sha2(col("body"), 256), 1, 2).as("blob_shard"))
        .orderBy("doc_id")
    }
  )
}
