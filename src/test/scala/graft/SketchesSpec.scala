package graft

import graft.operators.Sketches
import graft.functions.SketchAggs.MisraGriesAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the exact-answer sketch operators (q127/q128): the MG
  * theoretical guarantees on planted skew, face-equality pins (sketch
  * path == direct path), and partition-count independence of the
  * mergeable buffers. */
class SketchesSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // Planted Zipf-ish stream: token t_i appears ceil(600 / i) times —
  // real skew, unlike the near-uniform synthetic corpus.
  private lazy val zipf: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill((600 + i - 1) / i)(s"t$i"))
  private lazy val trueCounts: Map[String, Long] =
    zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("Misra-Gries keeps every item above N/(capacity+1) at tight capacity") {
    val cap = 8
    val n = zipf.size.toLong
    val bound = n.toDouble / (cap + 1)
    // shuffle deterministically so heavy items are interleaved, then
    // aggregate across several partitions to exercise merge()
    val stream = zipf.sortBy(s => (s.hashCode * 2654435761L).toHexString)
    val mg = udaf(new MisraGriesAgg(cap))
    val summary = stream.toDS().repartition(7)
      .select(mg(col("value")).as("s"))
      .as[Map[String, Long]].head()
    assert(summary.size <= cap, s"summary exceeded capacity: ${summary.size}")
    val mustKeep = trueCounts.filter(_._2 > bound).keySet
    assert(mustKeep.subsetOf(summary.keySet),
      s"MG dropped guaranteed-frequent items: ${mustKeep -- summary.keySet}")
    // each kept counter underestimates by at most the bound
    summary.foreach { case (t, c) =>
      assert(c <= trueCounts(t), s"$t overcounted: $c > ${trueCounts(t)}")
      assert(trueCounts(t) - c <= bound.ceil.toLong,
        s"$t undercount ${trueCounts(t) - c} exceeds bound $bound")
    }
  }

  test("Misra-Gries summary is independent of partitioning") {
    val cap = 8
    val mg = udaf(new MisraGriesAgg(cap))
    def run(parts: Int): Map[String, Long] =
      zipf.toDS().repartition(parts, col("value"))
        .select(mg(col("value")).as("s"))
        .as[Map[String, Long]].head()
    // hash-partitioned by value: each token's occurrences are co-located,
    // so the merge order may differ but the result set must still cover
    // the guaranteed-frequent items identically
    val n = zipf.size.toLong
    val bound = n.toDouble / (cap + 1)
    val mustKeep = trueCounts.filter(_._2 > bound).keySet
    Seq(1, 3, 8).foreach { p =>
      val s = run(p)
      assert(mustKeep.subsetOf(s.keySet), s"parts=$p dropped $mustKeep -- ${s.keySet}")
    }
  }

  test("q127 heavy hitters equal the direct group-by-having result") {
    val docs = Tables.documents(spark, sf001)
    val toks = docs.select(explode(expr("filter(split(trim(text), ' '), x -> x != '')")).as("w"))
    val n = toks.count()
    val direct = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") > lit(0.03) * lit(n))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.all("q127_heavy_hitters").fn(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === direct)
    assert(got.nonEmpty, "phi chosen so the result is non-trivial")
    // and non-total: the threshold must actually exclude something
    val vocab = toks.distinct().count()
    assert(got.size < vocab, "heavy-hitter set must be a strict subset")
  }

  test("q127 planted-skew pipeline is exact under a tight capacity") {
    val docs = zipf.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    val got = Sketches.mgHeavyHitters(docs, phi = 0.12, capacity = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = zipf.size
    val expected = trueCounts.filter { case (_, c) => c > 0.12 * n }
    assert(got === expected)
  }

  test("q128 min-k sample equals the window face and ranks are contiguous") {
    val docs = Tables.documents(spark, sf001)
    val a = Sketches.minKSamplePerSource(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sketches.windowSamplePerSource(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    val bySource = a.groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._3).toSeq.sorted === (1L to rows.size).toSeq, src)
    }
  }

  test("q128 result is independent of input partitioning") {
    val docs = Tables.documents(spark, sf001)
    val base = Sketches.minKSamplePerSource(docs, k = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Seq(1, 13).foreach { p =>
      val got = Sketches.minKSamplePerSource(docs.repartition(p), k = 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === base, s"parts=$p")
    }
  }

  private def wsRow(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))

  test("q135 aggregator face equals the window face row-for-row") {
    val docs = Tables.documents(spark, sf001)
    val a = Sketches.weightedSamplePerSource(docs, k = 10).collect().map(wsRow).toSet
    val b = Sketches.windowWeightedSamplePerSource(docs, k = 10).collect().map(wsRow).toSet
    assert(a === b)
  }

  test("q135 matches an independent plain-Scala E-S reference and prefers heavy docs") {
    import spark.implicits._
    // one source: doc 7 carries 500x the weight of its 40 siblings
    val docs = ((1L to 40L).map(i => (i, "x" * 10, "s")) :+ (7L, "y" * 5000, "s"))
      .groupBy(_._1).map(_._2.last).toSeq // doc 7 replaced, not duplicated
      .toDF("doc_id", "text", "source")
    val got = Sketches.weightedSamplePerSource(docs, k = 5).collect().map(wsRow)
      .sortBy(_._5)

    def esKey(id: Long, w: Long): BigDecimal = {
      val u = (((id * 2654435761L) % 4294967296L).toDouble) / 4294967296.0
      BigDecimal(math.pow(u, 1.0 / w)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val all = ((1L to 40L).map(i => (i, 10L)).filterNot(_._1 == 7L) :+ (7L, 5000L))
    val expected = all.map { case (id, w) => (id, w, esKey(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(5)
    assert(got.map(_._2).toSeq === expected.map(_._1))
    assert(got.map(_._3).toSeq === expected.map(_._2))
    assert(got.map(_._4).toSeq === expected.map(_._3.toDouble))
    // the 500x doc must be in the sample — its key u^(1/5000) ≈ 1
    assert(got.exists(_._2 == 7L), s"heavy doc must win a slot: ${got.toSeq}")
  }

  test("q138 label balance: every class keeps exactly the min class count") {
    import spark.implicits._
    // labels 0/1/2 with 7/3/5 members — quota must be 3 for every class
    val emb = ((1L to 7L).map((_, 0)) ++ (8L to 10L).map((_, 1)) ++
      (11L to 15L).map((_, 2))).toDF("vec_id", "label")
    val got = Sketches.labelBalancedSample(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map(0 -> 3, 1 -> 3, 2 -> 3))
    // ranks contiguous per class; picks = hash-order bottom-3, verified
    // against a local md5 reference
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect0 = (1L to 7L).sortBy(id => (md5hex(id.toString), id)).take(3).toSet
    assert(got.filter(_._2 == 0).map(_._1).toSet === expect0)
    got.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("q135 result is independent of input partitioning") {
    val docs = Tables.documents(spark, sf001)
    val base = Sketches.weightedSamplePerSource(docs, k = 6).collect().map(wsRow).toSet
    Seq(1, 13).foreach { p =>
      val got = Sketches.weightedSamplePerSource(docs.repartition(p), k = 6)
        .collect().map(wsRow).toSet
      assert(got === base, s"parts=$p")
    }
  }

  test("q175 aggregator top-k equals the q09 window face on real orders") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf001)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = orders.select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val agg = Sketches.topKOrdersPerCustomer(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(agg.toSeq === win.toSeq)
  }

  test("q175 partial buffers are bounded and ties break on order key") {
    import spark.implicits._
    // 6 same-price orders for one customer: the cut must take the 3
    // LOWEST order keys; a second customer checks group isolation
    val orders = Seq(
      (1L, 101L, 50.0), (1L, 105L, 50.0), (1L, 103L, 50.0),
      (1L, 102L, 50.0), (1L, 104L, 50.0), (1L, 106L, 99.99),
      (2L, 201L, 10.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val got = Sketches.topKOrdersPerCustomer(orders.repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 106L, 1L), (1L, 101L, 2L), (1L, 102L, 3L),
      (2L, 201L, 1L)))
  }
}
