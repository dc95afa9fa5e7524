package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory mergeable summaries as typed `Aggregator`s (SURVEY.md
  * §2.10 extension surface, the [[MinHashAgg]] pattern): each map task
  * folds its partition into a FIXED-SIZE buffer and only those buffers
  * cross the wire — the shapes that turn full-corpus shuffles into
  * O(partitions × capacity) merges at 100 TB.
  */
object SketchAggs {

  /** Misra–Gries frequent-items summary with `capacity` counters.
    *
    * Classic guarantee (Misra & Gries 1982; merge rule from Agarwal et
    * al. PODS'12 "Mergeable Summaries"): after summarizing N items, every
    * item with true frequency > N / (capacity + 1) is PRESENT in the
    * summary, and each kept counter underestimates by at most
    * N / (capacity + 1). It is a candidate GENERATOR — a second exact
    * pass over the candidates (a broadcast semi-join, corpus-shuffle
    * bounded by capacity × partitions) yields exact heavy hitters, which
    * is how [[graft.operators.Sketches]] uses it.
    *
    * reduce: increment if tracked; insert if space; else decrement every
    * counter by 1 (dropping zeros). merge: sum counters, then if over
    * capacity subtract the (capacity+1)-th largest value and drop ≤0 —
    * the mergeable-summaries rule that preserves the error bound. */
  class MisraGriesAgg(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], t: String): Map[String, Long] =
      buf.get(t) match {
        case Some(c) => buf.updated(t, c + 1)
        case None if buf.size < capacity => buf.updated(t, 1L)
        case None =>
          buf.collect { case (k, v) if v > 1 => k -> (v - 1) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      }
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count from everything
        val thresh = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.collect { case (k, v) if v > thresh => k -> (v - thresh) }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** K-minimum-values distinct sketch (Bar-Yossef et al. RANDOM'02;
    * unbiased estimator and set-operation forms from Beyer et al.
    * SIGMOD'07): the buffer holds the k smallest DISTINCT 63-bit hash
    * values of the items seen. Distinct count estimates as (k−1)/x_k
    * (x_k = the kth smallest normalized to (0,1)); with fewer than k
    * distinct items the sketch IS the distinct hash set and estimates
    * are exact. Unlike HLL, KMV supports a DIRECT intersection
    * estimator (ρ·D_∪ with ρ the fraction of the union sketch present
    * in both sides) whose error scales with the intersection itself —
    * inclusion–exclusion on HLLs amplifies error on near-disjoint
    * pairs, which is exactly where a source-overlap audit looks.
    * Deterministic (xxhash64 seed 42), mergeable (merge = sorted-merge
    * + truncate, associative and commutative), buffer ≤ k longs. */
  class KmvAgg(k: Int, family: String = "xxhash64")
      extends Aggregator[String, Seq[Long], Seq[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(family == "xxhash64" || family == "md5",
      s"unknown KMV hash family '$family' (expected md5|xxhash64)")

    /** xxhash64: the production lane. md5: the engine-agnostic lane —
      * the first 60 bits of md5 (= the first 15 hex chars, exactly
      * DuckDB's CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)), the
      * q52/q123 family trade that lets the oracle replay the sketch. */
    private def h63(s: String): Long = family match {
      case "xxhash64" =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L) &
          Long.MaxValue
      case "md5" =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        // big-endian first 8 bytes >>> 4 == first 15 hex chars (60 bits)
        val top = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
        top >>> 4
    }

    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], s: String): Seq[Long] = {
      val h = h63(s)
      if (buf.size >= k && h >= buf.last) buf
      else if (buf.contains(h)) buf
      else {
        val i = buf.indexWhere(_ > h) match { case -1 => buf.size; case n => n }
        val withH = (buf.take(i) :+ h) ++ buf.drop(i)
        if (withH.size > k) withH.take(k) else withH
      }
    }

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(buf: Seq[Long]): Seq[Long] = buf

    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Exact bottom-k per group over (group, sortKey, id) rows: keeps the k
    * lexicographically smallest (sortKey, id) pairs. The
    * map-side-combining alternative to a per-group row_number window —
    * each partial buffer is ≤ k rows, so a group's shuffle traffic is
    * k × partitions rows instead of the group's full row count, and
    * nothing ever sorts the corpus (the window form's per-group sort is
    * the part that breaks on a skewed 100 TB group).
    *
    * Buffer is an insertion-sorted Seq (k is small); merge is a bounded
    * merge of two sorted runs. */
  class MinKAgg(k: Int)
      extends Aggregator[(String, String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

    private val ord = Ordering.Tuple2[String, Long]

    override def zero: Seq[(String, Long)] = Vector.empty

    override def reduce(buf: Seq[(String, Long)], row: (String, String, Long)): Seq[(String, Long)] = {
      val x = (row._2, row._3)
      if (buf.size >= k && ord.gteq(x, buf.last)) buf
      else {
        val i = buf.indexWhere(ord.gt(_, x)) match { case -1 => buf.size; case n => n }
        val withX = (buf.take(i) :+ x) ++ buf.drop(i)
        if (withX.size > k) withX.take(k) else withX
      }
    }

    override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      (a ++ b).sorted(ord).take(k)

    override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** [[MinKAgg]] with a payload column carried through the buffer —
    * rows are (group, sortKey, id, payload), kept by smallest (sortKey,
    * id). Same bounded-buffer contract: partial buffers are ≤ k rows, so
    * weighted sampling never sorts a group. */
  class MinKRowAgg(k: Int)
      extends Aggregator[(String, String, Long, Long),
        Seq[(String, Long, Long)], Seq[(String, Long, Long)]] {

    private val ord =
      Ordering.by[(String, Long, Long), (String, Long)](t => (t._1, t._2))

    override def zero: Seq[(String, Long, Long)] = Vector.empty

    override def reduce(buf: Seq[(String, Long, Long)],
        row: (String, String, Long, Long)): Seq[(String, Long, Long)] = {
      val x = (row._2, row._3, row._4)
      if (buf.size >= k && ord.gteq(x, buf.last)) buf
      else {
        val i = buf.indexWhere(ord.gt(_, x)) match { case -1 => buf.size; case n => n }
        val withX = (buf.take(i) :+ x) ++ buf.drop(i)
        if (withX.size > k) withX.take(k) else withX
      }
    }

    override def merge(a: Seq[(String, Long, Long)],
        b: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
      (a ++ b).sorted(ord).take(k)

    override def finish(buf: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = buf

    override def bufferEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }
}
