package graft

import graft.operators.{Dedup, Skew}
import graft.pipeline.{ProvenanceStore, Redaction}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 test plan) over generated inputs with
  * fixed seeds — deterministic, no flaky randomness. Each property is the
  * reference's own invariant: dedup idempotence (db.py:28,76), redaction
  * stability (run_capture.py:229–244), sketch consistency, join
  * equivalence under salting. */
class PropertySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val urlGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "d", "e").map(s => s"https://x.test/$s")
  private val shaGen: Gen[String] = Gen.oneOf("s1", "s2", "s3")
  private val batchGen: Gen[List[(String, String)]] =
    Gen.listOfN(12, Gen.zip(urlGen, shaGen))

  test("property: artifacts dedup-append is idempotent for arbitrary batches") {
    samples(batchGen, 3, seed = 7L).zipWithIndex.foreach { case (batch, i) =>
      val wh = java.nio.file.Files.createTempDirectory(s"propwh$i").toString
      val store = new ProvenanceStore(spark, wh)
      def rows = batch.toDF("source_url", "sha256")
        .withColumn("provider", lit("p"))
        .withColumn("bytes", lit(1L))
        .withColumn("blob_path", concat(lit("/b/"), col("sha256")))
        .withColumn("response_id", lit(1L))
      store.appendArtifacts(rows)
      store.appendArtifacts(rows) // replay
      val distinctKeys = batch.distinct.size
      assert(store.artifacts.count() == distinctKeys,
        s"batch $batch must land exactly its distinct (url, sha) pairs")
      // unique ids despite the replay
      val ids = store.artifacts.select("id").as[Long].collect()
      assert(ids.distinct.length == ids.length)
    }
  }

  private val headerGen: Gen[Map[String, String]] = Gen.mapOfN(6, Gen.zip(
    Gen.oneOf("Authorization", "Content-Type", "X-Api-Key", "Accept",
      "session-token", "My-Password-Hint", "ETag"),
    Gen.alphaNumStr.map(_.take(12))))

  test("property: header redaction is idempotent and key-preserving") {
    samples(headerGen, 5, seed = 11L).foreach { headers =>
      val df = Seq(headers).toDF("h")
      val once = df.select(Redaction.redactMap(col("h")).as("h"))
      val twice = once.select(Redaction.redactMap(col("h")).as("h"))
      val a = once.as[Map[String, String]].head()
      val b = twice.as[Map[String, String]].head()
      assert(a == b, "redact ∘ redact == redact")
      assert(a.keySet == headers.keySet, "redaction never drops keys")
      a.foreach { case (k, v) =>
        if (Redaction.isSensitive(k)) assert(v == graft.pipeline.Model.redactedValue)
        else assert(v == headers(k), s"non-sensitive $k must pass through")
      }
    }
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu")
  private val docGen: Gen[String] =
    Gen.listOfN(20, wordGen).map(_.mkString(" "))

  test("property: minhash signature equality tracks set identity") {
    val docs = samples(docGen, 6, seed = 23L).distinct
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // duplicate every doc under a shifted id: each (i, i+n) pair identical
    val n = docs.size
    val dup = docs.zipWithIndex.map { case (t, i) => ((i + n).toLong, t) }
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df.union(dup), numHashes = 16, bands = 4)
      .select("d1", "d2", "est_jaccard").as[(Long, Long, Double)].collect()
    val est = pairs.map(p => (p._1, p._2) -> p._3).toMap
    (0 until n).foreach { i =>
      assert(est.get((i.toLong, (i + n).toLong)).contains(1.0),
        s"identical docs $i/${i + n} must estimate J=1.0: ${pairs.toSeq}")
    }
    pairs.foreach { case (_, _, j) => assert(j >= 0.0 && j <= 1.0) }
  }

  test("property: as-of join equals the naive inequality-join argmax") {
    import graft.operators.TemporalJoins
    val rowGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L),
      Gen.choose(0, 999).map(_.toDouble))
    Seq(0, 1, 2).foreach { i =>
      val lRows = samples(rowGen, 25, seed = 41L + i).zipWithIndex
        .map { case ((k, t, v), id) => (id.toLong, k,
          new java.sql.Timestamp(1700000000000L + t * 60000L), v) }
      val rRows = samples(rowGen, 25, seed = 141L + i).zipWithIndex
        .map { case ((k, t, v), id) => (100L + id, k,
          new java.sql.Timestamp(1700000000000L + t * 60000L), v) }
      val l = lRows.toDF("event_id", "k", "ts", "value")
      val r = rRows.toDF("event_id", "k", "ts", "value")
      val got = TemporalJoins.asofJoinKeys(l, r, Seq("k"), "ts",
        rightOrder = "event_id", rightPayload = Seq("event_id"), prefix = "r_")
        .select("event_id", "r_event_id")
        .as[(Long, Option[Long])].collect().toMap
      // naive reference: per left row, argmax over ALL at-or-before right
      // rows by (ts, event_id) — quadratic, fine at property scale
      val expected = lRows.map { case (id, k, ts, _) =>
        val cands = rRows.filter(rr => rr._2 == k && !rr._3.after(ts))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(rr => (rr._3.getTime, rr._1))._1))
      }.toMap
      assert(got == expected, s"round $i")
    }
  }

  test("property: prefix-filtered jaccard equals exact on random doc corpora") {
    import graft.operators.Dedup
    // small vocabulary forces heavy shingle overlap — the regime where the
    // prefix + positional filters are most at risk of dropping a true pair
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, wordGen))
    Seq(0, 1, 2).foreach { i =>
      val docs = samples(docGen, 30, seed = 71L + i).zipWithIndex
        .map { case (ws, id) => (id.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      Seq(0.4, 0.6, 0.8).foreach { t =>
        val exact = Dedup.exactJaccardPairs(docs, t)
          .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
        Seq("hash", "df").foreach { ord =>
          val pref = Dedup.prefixJaccardPairs(docs, t, ord)
            .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
          assert(pref == exact,
            s"round $i t=$t order=$ord: prefix diverged from exact " +
              s"(missing=${exact -- pref}, extra=${pref -- exact})")
        }
      }
    }
  }

  test("property: keyset pages partition the sorted table for arbitrary data and page sizes") {
    val rowGen = Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 500L))
    Seq(3, 7, 17).zipWithIndex.foreach { case (pageSize, i) =>
      // duplicate order-prefix values on purpose: (k1) ties are broken by
      // the unique k2, which is what makes the ordering total
      val rows = samples(rowGen, 50, seed = 97L + i)
        .zipWithIndex.map { case ((k1, _), idx) => (k1, idx.toLong) }
      val df = rows.toDF("k1", "k2")
      val sortedIds = df.orderBy("k1", "k2").select("k2").as[Long].collect().toSeq
      var lastKey: Option[Seq[org.apache.spark.sql.Column]] = None
      var walked = Vector.empty[Long]
      var done = false
      var guard = 0
      while (!done && guard < 100) {
        guard += 1
        val page = graft.operators.Relational.keysetPage(
          df, Seq("k1", "k2"), lastKey, pageSize).collect()
        if (page.isEmpty) done = true
        else {
          walked ++= page.map(_.getLong(1))
          val last = page.last
          lastKey = Some(Seq(lit(last.getLong(0)), lit(last.getLong(1))))
          if (page.length < pageSize) done = true
        }
      }
      assert(walked == sortedIds,
        s"pageSize=$pageSize: pages must concatenate to the sorted order")
    }
  }

  test("property: rrf fusion scores decompose into the two rank reciprocals") {
    val rankGen = Gen.zip(Gen.choose(0L, 3L), Gen.choose(1L, 20L))
    val lexRows = samples(rankGen, 30, seed = 41L).distinct
      .groupBy(_._1).toSeq.flatMap { case (q, rs) =>
        rs.map(_._2).distinct.sorted.zipWithIndex.map { case (_, i) => (q, 100L + i, i + 1L) }
      }
    val semRows = samples(rankGen, 30, seed = 42L).distinct
      .groupBy(_._1).toSeq.flatMap { case (q, rs) =>
        rs.map(_._2).distinct.sorted.zipWithIndex.map { case (_, i) => (q, 100L + 2 * i, i + 1L) }
      }
    val lex = lexRows.toDF("qid", "doc_id", "rank")
    val sem = semRows.toDF("qid", "doc_id", "rank")
    val lexM = lexRows.map { case (q, d, r) => (q, d) -> r }.toMap
    val semM = semRows.map { case (q, d, r) => (q, d) -> r }.toMap
    val got = graft.operators.Retrieval.rrfFusion(lex, sem, k = 1000)
      .select("qid", "doc_id", "rrf").as[(Long, Long, Double)].collect()
    got.foreach { case (q, d, rrf) =>
      val expect = BigDecimal(
        lexM.get((q, d)).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          semM.get((q, d)).map(r => 1.0 / (60 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf == expect, s"($q,$d): $rrf != $expect")
    }
    // full outer: every input (qid, doc_id) appears exactly once
    val gotKeys = got.map(t => (t._1, t._2)).toSet
    assert(gotKeys == (lexM.keySet ++ semM.keySet))
  }

  test("property: salted join equals plain join for random data and bucket counts") {
    val kvGen = Gen.zip(Gen.choose(1L, 8L), Gen.alphaNumStr.map(_.take(6)))
    Seq(1, 3, 7).zipWithIndex.foreach { case (buckets, i) =>
      val bigRows = samples(kvGen, 60, seed = 31L + i)
      val big = bigRows.toDF("k", "v")
      val small = Seq((1L, "d1"), (2L, "d2"), (8L, "d8")).toDF("k", "dim")
      val plain = big.join(small, "k").select("k", "v", "dim")
        .collect().map(_.toSeq).toSet
      val salted = Skew.saltedJoin(big, small, "k", buckets)
        .select("k", "v", "dim").collect().map(_.toSeq).toSet
      assert(salted == plain, s"buckets=$buckets")
    }
  }

  test("property: funnel stage counts are monotone non-increasing for arbitrary streams") {
    import java.sql.Timestamp
    val evGen = Gen.zip(Gen.choose(1L, 9L),
      Gen.oneOf("view", "click", "purchase", "other"),
      Gen.choose(0L, 96L))
    samples(Gen.listOfN(80, evGen), 3, seed = 101L).foreach { evs =>
      val df = evs.map { case (u, t, h) =>
        (u, t, new Timestamp(1704067200000L + h * 3600000L))
      }.toDF("user_id", "event_type", "ts")
      val counts = operators.EventAnalytics.eventFunnel(df)
        .collect().map(_.getLong(1)).toSeq
      assert(counts.size == 3 &&
        counts.sliding(2).forall(p => p(0) >= p(1)),
        s"funnel must be monotone: $counts for $evs")
    }
  }

  test("property: weighted sample size and membership bounds for arbitrary corpora") {
    val docGen = Gen.zip(Gen.choose(1L, 500L), Gen.choose(1, 40),
      Gen.oneOf("s0", "s1"))
    Seq(2, 5, 11).zipWithIndex.foreach { case (k, i) =>
      val rows = samples(docGen, 50, seed = 211L + i)
        .map { case (id, w, s) => (id, "x" * w, s) }
        .groupBy(_._1).map(_._2.head).toSeq // unique doc ids
      val df = rows.toDF("doc_id", "text", "source")
      val picks = operators.Sketches.weightedSamplePerSource(df, k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      // per-source: at most k rows, ranks contiguous from 1, picks ⊆ docs
      picks.groupBy(_._1).foreach { case (src, g) =>
        val n = rows.count(_._3 == src)
        assert(g.size == math.min(k, n), s"k=$k src=$src")
        assert(g.map(_._3).sorted.toSeq == (1L to g.size).toSeq)
      }
      assert(picks.map(_._2).toSet.subsetOf(rows.map(_._1).toSet))
    }
  }

  test("property: label balance emits identical per-class counts for arbitrary skews") {
    val skews = Seq(Seq(3, 9, 4), Seq(1, 20, 5), Seq(7, 7, 7))
    skews.foreach { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, lbl) =>
        (1 to n).map(i => (lbl * 1000L + i, lbl))
      }
      val got = operators.Sketches.labelBalancedSample(rows.toDF("vec_id", "label"))
        .collect().map(r => r.getInt(1))
      val quota = sizes.min
      assert(got.groupBy(identity).values.map(_.length).toSet == Set(quota),
        s"sizes=$sizes")
      assert(got.length == quota * sizes.size)
    }
  }
}
