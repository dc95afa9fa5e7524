package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import net.jpountz.xxhash.XXHashFactory

/** Typed `Aggregator[IN, BUF, OUT]` — the custom-UDAF extension surface
  * (SURVEY.md §2.10): folds a group's shingle strings into a MinHash
  * signature in one pass. Compared to the expression form in
  * operators.Dedup (numHashes separate min() columns), this computes all
  * lanes per row in a single buffer update — the shape a 100 TB dedup job
  * wants, because the partial buffers merged across partitions are a
  * constant numHashes longs per group.
  *
  * Hashing: xxhash64 (lz4-java ships with Spark) with lane-index seeds —
  * same family as the expression form.
  */
class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  @transient private lazy val factory = XXHashFactory.fastestInstance()

  private def hash(s: String, seed: Long): Long = {
    val bytes = s.getBytes("UTF-8")
    factory.hash64().hash(bytes, 0, bytes.length, seed)
  }

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = hash(shingle, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity of two signatures = lane agreement. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
