package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // Planted corpus: 0/1 exact dups; 2/3 and 5/6 near dups (last word
  // changed → word-3-gram Jaccard ≈ 0.91, inside the LSH design range);
  // 4 unrelated; 7 short doc. Docs are ~24 words because MinHash/SimHash
  // need a real shingle population — a one-word edit on a 12-word doc is
  // J≈0.54, legitimately below a 0.6-threshold sketch.
  private val base2 = "spark runs distributed queries over very large datasets " +
    "with columnar storage and adaptive execution planning across many worker " +
    "nodes while caching hot partitions in memory"
  private val base5 = "data pipelines ingest clean filter join aggregate and " +
    "write results downstream every day with checkpoint recovery watermark " +
    "tracking and exactly once delivery into warehouse tables"
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, base2),
    (3L, base2.replaceAll("memory$", "ram")),
    (4L, "completely different content about cooking pasta with tomato sauce and fresh basil herbs"),
    (5L, base5),
    (6L, base5.replaceAll("tables$", "marts")),
    (7L, "tiny doc")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val groups = docs.groupBy(sha2(col("text"), 256).as("k"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    val dup = groups.filter(col("n") > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keep") == 0L)
    assert(groups.count() == 7) // 8 docs, one pair collapsed
  }

  test("exact jaccard finds planted near-dup pairs and nothing else") {
    val pairs = Dedup.exactJaccardPairs(docs, threshold = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair")
    assert(pairs.contains((2L, 3L)), "near dup pair 2-3")
    assert(pairs.contains((5L, 6L)), "near dup pair 5-6")
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }, "unrelated doc clean")
  }

  test("exact jaccard of identical docs is 1.0") {
    val j = Dedup.exactJaccardPairs(docs, threshold = 0.5)
      .filter(col("d1") === 0 && col("d2") === 1)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("minhash LSH recalls the planted near-dup pairs") {
    val cand = Dedup.minhashLshPairs(docs, numHashes = 16, bands = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 1L)))
    assert(cand.contains((2L, 3L)))
    assert(cand.contains((5L, 6L)))
    assert(!cand.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("md5-lane minhash/simhash (the q52/q53 oracle family) recalls the planted pairs too") {
    // both families stay gated: xxhash64 is the production default, the
    // per-lane-salted md5 lanes are the oracle-checkable declared
    // faces — same planted-corpus recall contract for each
    val cand = Dedup.minhashLshPairsMd5(docs, numHashes = 16, bands = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 1L)) && cand.contains((2L, 3L)) && cand.contains((5L, 6L)))
    assert(!cand.exists { case (a, b) => a == 4L || b == 4L })
    val est = Dedup.minhashLshPairsMd5(docs, numHashes = 16, bands = 4)
      .filter(col("d1") === 0 && col("d2") === 1)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0, "identical docs agree on every md5 lane")
    val sk = Dedup.simhashSketchMd5(docs)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sk(a) ^ sk(b))
    assert(ham(0L, 1L) == 0, "identical docs have hamming 0")
    assert(ham(2L, 3L) < ham(2L, 4L) && ham(5L, 6L) < ham(5L, 4L),
      "near-dups closer than unrelated under the md5 bit family")
    val pairs = Dedup.simhashPairsFromSketches(Dedup.simhashSketchMd5(docs), 8)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect()
    pairs.foreach { case (a, b, d) =>
      assert(d == ham(a, b), "banding preserves md5-family distance")
    }
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
  }

  test("md5 lane family is statistically sound — the K-M degeneracy gate") {
    // r12's Kirsch–Mitzenmacher lanes (h1 + i·h2) were oracle-green yet
    // DEGENERATE: a corpus-common shingle with a small h2 dominated every
    // high lane's min, so docs sharing one boilerplate trigram agreed on
    // 12/16 lanes (sf0.001: 153 surfaced pairs, mean audit error 0.59,
    // 123 gross). The salted per-lane family must stay in the honest
    // MinHash band: candidate count near the xxhash production family's
    // and audit error bounded. A regression re-fails THIS, not just the
    // (estimator-agnostic) oracle hash.
    val d = Tables.documents(spark, sf001)
    val audit = Dedup.minhashErrorAuditMd5(d).collect().head
    val nPairs = audit.getAs[Long]("n_pairs")
    val meanErr = audit.getAs[Double]("mean_abs_err")
    val nGross = audit.getAs[Long]("n_gross")
    val nXx = Dedup.minhashErrorAudit(d).collect().head.getAs[Long]("n_pairs")
    assert(nPairs <= 2 * nXx,
      s"md5 family surfaces $nPairs pairs vs xxhash's $nXx — degenerate banding")
    assert(meanErr <= 0.15, s"md5 lane mean audit error $meanErr above the 16-lane band")
    assert(nGross <= nPairs / 10, s"$nGross of $nPairs pairs grossly mis-estimated")
  }

  test("minhash estimated jaccard is 1.0 for identical docs") {
    val est = Dedup.minhashLshPairs(docs, numHashes = 16, bands = 4)
      .filter(col("d1") === 0 && col("d2") === 1)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sk = Dedup.simhashSketch(docs)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sk(a) ^ sk(b))
    assert(ham(0L, 1L) == 0, "identical docs have hamming 0")
    assert(ham(2L, 3L) < ham(2L, 4L), "near-dup closer than unrelated")
    assert(ham(5L, 6L) < ham(5L, 4L), "near-dup closer than unrelated")
    // banded candidate pairs carry exact hamming and always include
    // identical docs (all chunks equal)
    val pairs = Dedup.simhashPairs(docs, maxHamming = 8)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((0L, 1L)).contains(0))
    byPair.foreach { case ((a, b), d) =>
      assert(d == java.lang.Long.bitCount(sk(a) ^ sk(b)), "banding preserves distance")
    }
  }

  test("simhash banding recalls a hamming-5 pair whose flips touch all four 16-bit quarters") {
    // regression for the old 4×16-bit chunk banding, which only guaranteed
    // recall for hamming <= 3: five flipped bits, at least one in every
    // 16-bit quarter, so NO 16-bit chunk survives — the combination
    // banding must still produce the candidate
    val s0 = 0x0123456789ABCDEFL
    val s1 = s0 ^ ((1L << 3) | (1L << 17) | (1L << 33) | (1L << 49) | (1L << 60))
    val sk = Seq((1L, s0), (2L, s1)).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairsFromSketches(sk, maxHamming = 6)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 5)), s"hamming-5 pair missed: $pairs")
  }

  test("simhash banded pairs equal brute-force hamming pairs on random+planted sketches") {
    val rnd = new scala.util.Random(42)
    // planted companions at every distance 0..6 (random bit positions, so
    // flips land in arbitrary blocks) + random background sketches
    val planted = (0 to 6).flatMap { d =>
      val base = rnd.nextLong()
      val flipped = rnd.shuffle((0 until 64).toList).take(d)
        .foldLeft(base)((x, k) => x ^ (1L << k))
      Seq(base, flipped)
    }
    val all = (planted ++ (0 until 30).map(_ => rnd.nextLong()))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val expected = (for {
      (i, si) <- all; (j, sj) <- all
      if i < j && java.lang.Long.bitCount(si ^ sj) <= 6
    } yield (i, j, java.lang.Long.bitCount(si ^ sj))).toSet
    assert(expected.size >= 7, "planted pairs present")
    val got = Dedup.simhashPairsFromSketches(all.toDF("doc_id", "simhash"), maxHamming = 6)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == expected, s"banded=${got.size} brute=${expected.size}")
  }

  test("simhash bucket cap drops a degenerate all-identical bucket before the self-join") {
    val sk = (0L until 200L).map(i => (i, 0x5555AAAA5555AAAAL)).toDF("doc_id", "simhash")
    assert(Dedup.simhashPairsFromSketches(sk, maxHamming = 6).count() == 200L * 199 / 2,
      "default cap is a no-op at this scale")
    assert(Dedup.simhashPairsFromSketches(sk, maxHamming = 6, maxBucketSize = 50).count() == 0,
      "capped bucket contributes no candidate pairs")
  }

  test("incremental paths cap the COMBINED bucket, matching the self-join over the union") {
    // 30 corpus + 30 batch rows share one sketch: each side alone is under
    // the cap (50) but the combined bucket (60) is over it, so the
    // self-join over the union drops the bucket entirely — and the
    // incremental path must drop it too, or a skewed key slips through
    // with up to cap² join rows (the blow-up the cap exists to stop)
    val sk = 0x5555AAAA5555AAAAL
    val corpusSk = (0L until 30L).map(i => (i, sk)).toDF("doc_id", "simhash")
    val batch = (100L until 130L).map(i => (i, base2)).toDF("doc_id", "text")
    val batchSk = Dedup.simhashSketch(batch).select(col("doc_id"), lit(sk).as("simhash"))
    assert(Dedup.simhashPairsFromSketches(corpusSk.union(batchSk), maxHamming = 6,
      maxBucketSize = 50).count() == 0, "self-join over the union drops the bucket")
    // feed the incremental form docs whose sketch lands in the same bucket:
    // identical text → identical sketch → identical block keys
    val incSim = Dedup.incrementalSimhashPairs(
      batch, corpusSk.select(col("doc_id"), lit(Dedup.simhashSketch(batch)
        .select("simhash").as[Long].head()).as("simhash")),
      maxHamming = 6, maxBucketSize = 50)
    assert(incSim.count() == 0,
      "incremental simhash must drop the combined-over-cap bucket")
    val corpusDocs = (0L until 30L).map(i => (i, base2)).toDF("doc_id", "text")
    val corpusSigs = Dedup.minhashSignatures(corpusDocs, numHashes = 16)
    assert(Dedup.incrementalMinhashPairs(batch, corpusSigs,
      numHashes = 16, bands = 4, maxBucketSize = 50).count() == 0,
      "incremental minhash must drop the combined-over-cap bucket")
    // both sides stay under the cap combined → pairs flow as before
    assert(Dedup.incrementalMinhashPairs(batch, corpusSigs,
      numHashes = 16, bands = 4, maxBucketSize = 100).count() == 30L * 30,
      "under-cap combined bucket joins fully")
  }

  test("minhash bucket cap drops a degenerate all-identical bucket before the self-join") {
    val many = (100L until 300L).map(i => (i, base2)).toDF("doc_id", "text")
    assert(Dedup.minhashLshPairs(many, numHashes = 16, bands = 4, maxBucketSize = 50)
      .count() == 0, "capped bucket contributes no candidate pairs")
    // the planted near-dup corpus is unaffected by the default cap
    val cand = Dedup.minhashLshPairs(docs, numHashes = 16, bands = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(cand.contains((2L, 3L)))
  }

  test("dedup apply keeps exactly the keepers plus all unclustered docs") {
    val clusters = Dedup.duplicateClusters(Dedup.exactJaccardPairs(docs, 0.6))
    val kept = Dedup.dedupApply(docs, clusters)
      .select("doc_id").as[Long].collect().toSet
    val keepers = clusters.filter(col("is_keeper"))
      .select("doc_id").as[Long].collect().toSet
    val members = clusters.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(kept == keepers ++ (all -- members),
      s"kept=$kept keepers=$keepers unclustered=${all -- members}")
    // planted corpus: 0/1 exact dups and the two near-dup pairs each
    // lose exactly one member
    assert((all -- kept).size == 3, s"dropped=${all -- kept}")
  }

  test("dedup apply never forces a broadcast of the dropped set (adversarial dup rate)") {
    // Web-crawl dedup drops 30–80% of the corpus; at 100 TB the dropped-id
    // set is billions of rows. A broadcast() HINT overrides the size
    // threshold, so disabling broadcast by config distinguishes the two
    // shapes: a hinted plan still contains a BroadcastExchange, an
    // unhinted one honors the config and shuffles. Majority-duplicate
    // corpus: 900 of 1000 docs are dropped cluster members.
    val corpus = spark.range(0, 1000)
      .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    val clusters = spark.range(0, 950)
      .select(col("id").as("doc_id"), (col("id") % 50).as("cluster_id"),
        (col("id") < 50).as("is_keeper"))
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAdaptive =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val kept = Dedup.dedupApply(corpus, clusters)
      val ids = kept.select("doc_id").as[Long].collect().toSet
      assert(ids == ((0L until 50L) ++ (950L until 1000L)).toSet,
        "keepers plus unclustered docs survive")
      val p = kept.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"dedupApply must not force a broadcast of the dropped set: $p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      prevAdaptive match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("cluster split: near-dup cluster members always share a split, assignment is deterministic") {
    val clusters = Dedup.duplicateClusters(Dedup.exactJaccardPairs(docs, 0.6))
    val split = Dedup.clusterSplit(docs, clusters)
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(split.map(_._1) == docs.select("doc_id").as[Long].collect().sorted.toSeq,
      "every document gets exactly one split row")
    // members of one cluster inherit the cluster's group → identical split
    val byGroup = split.groupBy(_._2).values
    byGroup.foreach(g => assert(g.map(_._3).distinct.size == 1,
      s"cluster straddles splits: $g"))
    // the planted 0/1 exact-dup pair specifically
    val m = split.map(r => r._1 -> r._3).toMap
    assert(m(0L) == m(1L), "exact dups must train/test together")
    // deterministic: a second run assigns identically
    val again = Dedup.clusterSplit(docs, clusters)
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(again == split)
  }

  test("keep-best dedup keeps the highest-quality cluster member, not the min id") {
    val corpus = Seq(
      (10L, "!!! ??? ### $$$ %%%"), // low quality, min id of its cluster
      (11L, "the quick brown fox jumps over the lazy dog and runs to the " +
        "river bank in the morning light today again and again"), // high quality
      (12L, ""), // degenerate singleton: NULL quality (n_chars=0), must survive
      (13L, "an unclustered normal document about data"),
      (20L, "same words here exactly"), // tie cluster: identical text
      (21L, "same words here exactly")
    ).toDF("doc_id", "text")
    val clusters = Seq(
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (21L, 20L, false)
    ).toDF("doc_id", "cluster_id", "is_keeper")
    val kept = Dedup.dedupKeepBest(corpus, clusters)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(kept.map(_._1) == Seq(11L, 12L, 13L, 20L), s"kept=$kept")
    val m = kept.map(r => r._1 -> r).toMap
    // cluster {10,11}: 11 wins on quality despite the larger id — the
    // exact case where dedupApply's min-id keeper ships the worse copy
    assert(m(11L)._2 == 10L && m(11L)._3 == 2L)
    // tie cluster {20,21}: equal quality → lowest doc_id
    assert(m(20L)._2 == 20L && m(20L)._3 == 2L)
    // NULL-quality singleton survives and stays NULL (not the −1 sentinel)
    assert(m(12L)._4.isEmpty && m(12L)._3 == 1L)
    assert(m(13L)._4.nonEmpty)
    // contrast with min-id apply: it would keep 10, not 11
    val minId = Dedup.dedupApply(corpus, clusters)
      .select("doc_id").as[Long].collect().toSet
    assert(minId.contains(10L) && !minId.contains(11L))
  }

  test("duplicate clusters merge transitive chains to one keeper") {
    // chain: 10~11 and 11~12 are edges, 10~12 is not — one component {10,11,12}
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("d1", "d2")
    val clusters = Dedup.duplicateClusters(pairs)
      .select("doc_id", "cluster_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(clusters.map(c => c._1 -> c._2).toMap ==
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    assert(clusters.filter(_._3).map(_._1).toSeq == Seq(10L, 20L),
      "exactly one keeper per component, the min doc_id")
  }

  test("large-star/small-star CC: planted 1000-node path converges within the round bound") {
    // worst case for min-label propagation (diameter 999 → ~999 joins);
    // the star algorithm must close it in its logarithmic round bound
    // (maxIters default 50 — it throws rather than return wrong labels)
    val pairs = spark.range(0, 999)
      .select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val out = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 1000)
    assert(out.forall(_._2 == 0L), "one component rooted at the min node")
    assert(out.filter(_._3).map(_._1).toSeq == Seq(0L), "only node 0 keeps")
  }

  test("large-star/small-star CC agrees with label propagation on branching components") {
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (11L, 14L), (14L, 15L), // tree
      (20L, 21L), (21L, 22L), (22L, 20L),                          // cycle
      (30L, 31L)).toDF("d1", "d2")
    val star = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val prop = Dedup.duplicateClusters(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(star == prop, s"star=$star prop=$prop")
  }

  test("duplicateClusters falls back to star CC when the graph outlives maxIters") {
    // 64-node path with maxIters=3: label propagation cannot converge, so
    // the fallback must produce the CORRECT labels anyway
    val pairs = spark.range(0, 63).select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val out = Dedup.duplicateClusters(pairs, maxIters = 3)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 64)
    assert(out.forall(_._2 == 0L), "fallback labels must be converged, not partial")
  }

  test("prefix-filtered jaccard equals the exact inverted-index result") {
    // planted corpus at two thresholds (0.5 exercises pairs near the
    // size-ratio boundary; 0.6 is the production threshold), both prefix
    // orders (in-row hash default; classic PPJoin df-ranked)
    for (t <- Seq(0.5, 0.6); ord <- Seq("hash", "df")) {
      val exact = Dedup.exactJaccardPairs(docs, t)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.prefixJaccardPairs(docs, t, ord)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(pref == exact, s"t=$t order=$ord: prefix-filter diverged from exact")
    }
    // real testdata: identical pair sets and scores, both orders
    val real = Tables.documents(spark, sf001)
    val exactR = Dedup.exactJaccardPairs(real, 0.6)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    Seq("hash", "df").foreach { ord =>
      val prefR = Dedup.prefixJaccardPairs(real, 0.6, ord)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(prefR == exactR, s"order=$ord diverged from exact on testdata")
    }
    assert(exactR.nonEmpty)
  }

  test("prefix filter indexes strictly less than the full inverted index") {
    // the whole point of q78: the self-joined relation is ~1/(1+t) of the
    // full index. Measure the actual indexed row counts on real data.
    val real = Tables.documents(spark, sf001)
    val fullIndexRows = Dedup.fullIndexSize(real)
    Seq("hash", "df").foreach { ord =>
      val prefixRows = Dedup.prefixIndexSize(real, 0.6, ord)
      assert(prefixRows < fullIndexRows / 2,
        s"$ord prefix index $prefixRows not < half of full index $fullIndexRows")
    }
  }

  test("native simhash sketch equals the declarative 64-aggregate form exactly") {
    // planted docs AND real testdata: the native one-pass expression must
    // reproduce the shuffle-based sketch bit-for-bit (same xxhash64 seed,
    // same ±1 vote rule, same sign convention, same empty-doc exclusion)
    val planted = docs.union(Seq((99L, "   ")).toDF("doc_id", "text"))
    val nat = Dedup.simhashSketch(planted)
      .as[(Long, Long)].collect().toMap
    val dec = Dedup.simhashSketchDeclarative(planted)
      .as[(Long, Long)].collect().toMap
    assert(nat == dec, s"sketch mismatch: ${nat.toSet.diff(dec.toSet)}")
    assert(!nat.contains(99L), "token-less docs excluded in both forms")
    val real = Tables.documents(spark, sf001)
    val natR = Dedup.simhashSketch(real).as[(Long, Long)].collect().toMap
    val decR = Dedup.simhashSketchDeclarative(real).as[(Long, Long)].collect().toMap
    assert(natR == decR)
    assert(natR.size == 500)
  }

  test("minhash recall vs exact on real testdata documents") {
    val real = Tables.documents(spark, sf001)
    val exact = Dedup.exactJaccardPairs(real, threshold = 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val cand = Dedup.minhashLshPairs(real, numHashes = 16, bands = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata has planted near-dups")
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall below 0.9 on J>=0.8 pairs")
  }

  test("incremental minhash vs persisted corpus signatures equals the cross slice of the self-join") {
    val real = Tables.documents(spark, sf001)
    val corpus = real.filter(col("doc_id") < 400)
    val batch = real.filter(col("doc_id") >= 400)
    // persist + reload the corpus index — the scheduled-pipeline shape:
    // later batches never re-read (or re-shingle) the corpus text
    val dir = java.nio.file.Files.createTempDirectory("mhsig").toString
    Dedup.minhashSignatures(corpus, numHashes = 16)
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val incremental = Dedup.incrementalMinhashPairs(batch, reloaded,
        numHashes = 16, bands = 4)
      .select("d1", "d2", "est_jaccard").as[(Long, Long, Double)].collect().toSet
    // ground truth: the full self-join over the union, restricted to
    // pairs with one side in the corpus and one in the batch
    val full = Dedup.minhashLshPairs(real, numHashes = 16, bands = 4)
      .select("d1", "d2", "est_jaccard").as[(Long, Long, Double)].collect()
      .filter { case (d1, d2, _) => d1 < 400 && d2 >= 400 }.toSet
    assert(incremental == full,
      s"incremental diverged from the self-join's cross slice:\n" +
        s" only incremental: ${(incremental -- full).take(5)}\n" +
        s" only full:        ${(full -- incremental).take(5)}")
    assert(incremental.nonEmpty, "testdata should have cross-batch near-dups")
  }

  test("incremental simhash vs persisted corpus sketches equals the cross slice of the self-join") {
    val real = Tables.documents(spark, sf001)
    val corpus = real.filter(col("doc_id") < 400)
    val batch = real.filter(col("doc_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("shsk").toString
    Dedup.simhashSketch(corpus).write.mode("overwrite").parquet(dir)
    val incremental = Dedup.incrementalSimhashPairs(batch,
        spark.read.parquet(dir), maxHamming = 6)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect().toSet
    val full = Dedup.simhashPairs(real, maxHamming = 6)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect()
      .filter { case (d1, d2, _) => d1 < 400 && d2 >= 400 }.toSet
    assert(incremental == full,
      s"incremental simhash diverged from the self-join's cross slice:\n" +
        s" only incremental: ${(incremental -- full).take(5)}\n" +
        s" only full:        ${(full -- incremental).take(5)}")
    assert(incremental.nonEmpty, "testdata should have cross-batch hamming<=6 pairs")
  }

  test("contrastive triples: positive from the cluster, hard negative the " +
      "best out-of-cluster overlap, null when nothing overlaps") {
    // cluster {1,2} (jaccard 7/9); doc 3 shares exactly the 3-shingle
    // prefix with both (sub-threshold -> hard negative, c=3);
    // cluster {5,6} (jaccard 3/5 = 0.6, boundary-inclusive); doc 4
    // overlaps doc 5 on one shingle ("p q r") but doc 6 on none
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "a b c d e x y z w v"),
      (4L, "p q r s t u"),
      (5L, "m n o p q r"),
      (6L, "m n o p q s")
    ).toDF("doc_id", "text")
    val got = Dedup.contrastivePairs(docs, threshold = 0.6)
      .as[(Long, Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, Some(3L), Some(3L)),
      (2L, 1L, Some(3L), Some(3L)),
      (5L, 6L, Some(4L), Some(1L)),
      (6L, 5L, None, None)),
      s"got=$got")
  }

  test("q130 pagerank: star hub dominates, leaves tie, mass ≈ 1") {
    val docs = (0L to 4L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // star: hub 0 connected to 1..4 with equal weight
    val pairs = (1L to 4L).map(i => (0L, i, 0.5)).toDF("d1", "d2", "jaccard")
    val out = Dedup.pageRank(docs, pairs, damping = 0.85, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) > out(1L) * 2, s"hub must dominate: $out")
    assert((1L to 4L).map(out).distinct.size == 1, s"leaves must tie: $out")
    assert(math.abs(out.values.sum - 1.0) < 1e-6, s"mass: ${out.values.sum}")
  }

  test("q130 pagerank matches an independent local reference on real data") {
    val docs = Tables.documents(spark, sf001)
    val pairs = Dedup.exactJaccardPairs(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nodeIds = docs.select("doc_id").collect().map(_.getLong(0))
    val n = nodeIds.length
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mirror the engine op-for-op: decimal(18,6) weight sums, 9-dp share,
    // 9-dp contributions summed as exact decimals, 9-dp rank update
    val both = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wu = both.groupBy(_._1).view.mapValues(es =>
      es.map { case (_, _, w) =>
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP) }.sum).toMap
    val edges = both.map { case (u, v, w) => (u, v, round9(w / wu(u).toDouble)) }
    val d = 0.85
    var rank: Map[Long, Double] = nodeIds.map(_ -> round9(1.0 / n)).toMap
    (1 to 5).foreach { _ =>
      val sums = edges.groupBy(_._2).view.mapValues(es =>
        es.map { case (u, _, share) =>
          BigDecimal(round9(share * rank(u)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) }.sum).toMap
      rank = nodeIds.map { v =>
        v -> round9((1.0 - d) / n + d * sums.get(v).map(_.toDouble).getOrElse(0.0))
      }.toMap
    }
    val got = SparkEntry.all("q130_pagerank").fn(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === rank)
    // the graph is non-trivial: someone must sit above the teleport floor
    assert(got.values.max > round9((1.0 - d) / n) * 1.5)
  }

  test("q147 split leakage: clustered pairs never cross where a naive id split would") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def naiveSplit(id: Long) = {
      val h = md5hex(id.toString).take(2)
      if (h < "e6") "train" else if (h < "f3") "valid" else "test"
    }
    // find a doc-id pair a NAIVE per-doc hash split would separate
    val (idA, idB) = (1L to 500L).flatMap(a =>
      (a + 1 to a + 50).find(b => naiveSplit(a) != naiveSplit(b)).map((a, _))).head
    val dupText = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq((idA, dupText), (idB, dupText),
      // an unrelated doc sharing ONE 3-gram with the dup text: a weak pair
      (9999L, "tok1 tok2 tok3 zzz yyy xxx www vvv uuu ttt sss rrr"))
      .toDF("doc_id", "text")
    val got = operators.Dedup.splitLeakageAudit(docs).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // the identical pair is clustered and does NOT cross — though the
    // naive split would have separated exactly these two ids
    assert(got(("clustered", false)) === 1L)
    assert(!got.contains(("clustered", true)))
    // the weak pairs exist and appear in the matrix (crossing or not —
    // their split follows the md5 of their own singleton group ids)
    assert(got.keys.count(_._1 == "weak") >= 1)
  }

  test("q147 split leakage on real data: the clustered band has zero crossings") {
    val got = SparkEntry.all("q147_split_leakage").fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(got.contains(("clustered", false)), "clustered pairs exist")
    assert(!got.contains(("clustered", true)), s"LEAKAGE: $got")
    assert(got.keys.exists(_._1 == "weak"), "background band is non-vacuous")
  }

  test("q146 unique accounting: cross-source duplicates charge the later source") {
    import spark.implicits._
    // doc 1 (X, 4 tokens) duplicated as doc 10 (Y) — Y's copy loses to
    // the global min-id keeper; docs 2 (X) and 11 (Y) are unique
    val docs = Seq(
      (1L, "a b c d", "X"), (2L, "e f", "X"),
      (10L, "a b c d", "Y"), (11L, "g h i", "Y"))
      .toDF("doc_id", "text", "source")
    val got = operators.Dedup.uniqueTokenAccounting(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got("X") === ((2L, 2L, 6L, 6L, 0.0, 0.0)))
    assert(got("Y") === ((2L, 1L, 7L, 3L, 0.5,
      BigDecimal(1.0 - 3.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("q141 triangle cohesion on a planted graph: clique, chain, and hub") {
    import spark.implicits._
    // 4-clique {1,2,3,4}; chain 5-6-7; hub 8 over {9,10,11} with one
    // closing edge 9-10 (degrees deliberately skewed so the
    // degree-ordered orientation actually reorders edges)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L),
      (8L, 9L), (8L, 10L), (8L, 11L), (9L, 10L))
      .toDF("d1", "d2")
    val got = operators.Dedup.triangleCohesionFromPairs(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // clique: deg 3, 3 triangles each, coefficient 1
    Seq(1L, 2L, 3L, 4L).foreach(v =>
      assert(got(v) === ((3L, 3L, Some(1.0))), s"clique node $v"))
    // chain: no triangles; middle node coeff 0, endpoints null (deg 1)
    assert(got(6L) === ((2L, 0L, Some(0.0))))
    assert(got(5L) === ((1L, 0L, None)) && got(7L) === ((1L, 0L, None)))
    // hub: deg 3, one triangle (8,9,10), coeff 2·1/(3·2) = 1/3
    assert(got(8L) === ((3L, 1L, Some(0.333333))))
    assert(got(9L) === ((2L, 1L, Some(1.0))) && got(10L) === ((2L, 1L, Some(1.0))))
    assert(got(11L) === ((1L, 0L, None)))
  }

  test("q192 containment: a fully-quoted small doc surfaces; Jaccard alone would miss it") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val container = quote + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quote), (2L, container),
      (3L, "completely different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5), r.getDouble(6),
        r.getLong(7)))
    assert(got.length === 1)
    val (d1, d2, j, c, contained) = got.head
    assert((d1, d2, contained) === ((1L, 2L, 1L)))
    assert(c === 1.0, "every shingle of the quote is inside the container")
    assert(j < 0.6, "symmetric Jaccard sits under the dedup threshold")
    // and the symmetric dedup face indeed misses the pair
    assert(Dedup.exactJaccardPairs(docs, 0.6).count() === 0L)
  }

  test("q189 error audit: identical docs measure zero signature error") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again today okay"
    val docs = Seq((1L, a), (2L, a),
      (3L, "completely different content with nothing shared at all here now"))
      .toDF("doc_id", "text")
    val r = Dedup.minhashErrorAudit(docs).collect().head
    assert(r.getLong(0) >= 1L, "the identical pair must surface")
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0,
      "identical docs: est = exact = 1 → zero error")
    assert(r.getLong(3) === 0L)
  }

  test("q186 explanation: rarest shared shingles first, boilerplate last") {
    import spark.implicits._
    // d1/d2 near-identical (jaccard 5/6); d3 shares only the lead
    // 3-gram, making "alpha beta gamma" df=3 — too common for evidence
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta extra"),
      (3L, "alpha beta gamma unrelated tail")).toDF("doc_id", "text")
    val got = Dedup.nearDupExplanation(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.length === 1)
    val (d1, d2, j, ev) = got.head
    assert((d1, d2) === ((1L, 2L)))
    assert(j === BigDecimal(5.0 / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the three df=2 shared shingles in text order; the df=3 one is cut
    assert(ev === "beta gamma delta | delta epsilon zeta | epsilon zeta eta")
  }

  test("q177 sweep: rung counts are non-increasing and match per-threshold replays") {
    import spark.implicits._
    // near-identical pair (high sim), a mid-sim pair, and unrelated docs
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, a), (2L, a + " extra"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "alpha beta gamma delta epsilon zeta unrelated tail words here"),
      (5L, "completely different content with nothing shared at all okay"))
      .toDF("doc_id", "text")
    val got = Dedup.thresholdSweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) === Seq(0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
    // monotone: raising the threshold never adds pairs or docs
    assert(got.zip(got.drop(1)).forall { case (lo, hi) =>
      hi._2 <= lo._2 && hi._3 <= lo._3 }, s"non-monotone: $got")
    // each rung equals an independent exactJaccardPairs run at that rung
    got.foreach { case (t, nPairs, nDocs) =>
      val p = Dedup.exactJaccardPairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(p.length.toLong === nPairs, s"pairs at $t")
      assert(p.flatMap(x => Seq(x._1, x._2)).distinct.length.toLong === nDocs,
        s"docs at $t")
    }
    assert(got.head._2 > got.last._2, "planted mid-sim pair must separate rungs")
  }

  test("q170 histogram: planted clusters — singleton row fills the remainder") {
    import spark.implicits._
    // 10 docs; clusters {1,2,3} and {4,5} -> sizes 3 and 2; 5 singletons
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters = Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 4L, false))
      .toDF("doc_id", "cluster_id", "is_keeper")
    val got = Dedup.componentSizeHistogram(docs, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 5L, 5L, 0.5),
      (2L, 1L, 2L, 0.2),
      (3L, 1L, 3L, 0.3)))
  }

  test("q170 histogram: no clusters -> one all-singleton row") {
    import spark.implicits._
    val docs = (1L to 4L).map(i => (i, s"d $i")).toDF("doc_id", "text")
    val clusters = Seq.empty[(Long, Long, Boolean)]
      .toDF("doc_id", "cluster_id", "is_keeper")
    val got = Dedup.componentSizeHistogram(docs, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 4L, 4L, 1.0)))
  }

  /** Independent plain-Scala reference for q210: sliding character
    * windows, cross-document duplication, integer ppm. */
  private def substrDupRef(rows: Seq[(Long, String)], L: Int): Seq[(Long, Long, Long, Long)] = {
    val wins = rows.flatMap { case (id, t) =>
      if (t.length >= L) t.sliding(L).map(w => (id, w)) else Nil }
    val docsPerWin = wins.groupBy(_._2).view
      .mapValues(ws => ws.map(_._1).distinct.size).toMap
    rows.filter(_._2.length >= L).map { case (id, t) =>
      val ws = t.sliding(L).toSeq
      val n = ws.size.toLong
      val d = ws.count(w => docsPerWin(w) >= 2).toLong
      (id, n, d, d * 1000000L / n)
    }.sortBy(_._1)
  }

  test("q210 exact substring dup matches a plain-Scala sliding-window reference") {
    // planted: 0/1 identical (all windows dup), 2/3 share a long prefix
    // (prefix windows dup, suffix windows unique), 4 unrelated, 7 short
    // (below the window length -> absent from the output)
    val L = 20
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = substrDupRef(rows, L)
    val got = Dedup.exactSubstringDup(docs, windowLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._4 == 1000000L, "identical doc: every window duplicated")
    assert(byId(1L)._4 == 1000000L)
    assert(byId(4L)._4 == 0L, "unrelated doc: zero duplicated windows")
    assert(byId(2L)._3 > 0 && byId(2L)._4 < 1000000L, "near dup: partial share")
    assert(!byId.contains(7L), "doc shorter than the window is absent")
  }

  /** Independent reference for q212: literal interval union via a BitSet
    * of covered character offsets — no lead() identity involved. */
  private def coverageRef(rows: Seq[(Long, String)], L: Int): Seq[(Long, Long, Long, Long)] = {
    val docsPerWin = rows.flatMap { case (id, t) =>
      if (t.length >= L) t.sliding(L).map(w => (w, id)) else Nil }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    rows.filter(_._2.length >= L).map { case (id, t) =>
      val cov = scala.collection.mutable.BitSet.empty
      (0 to t.length - L).foreach { i =>
        if (docsPerWin(t.substring(i, i + L)) >= 2) cov ++= (i until i + L)
      }
      val n = t.length.toLong
      (id, n, cov.size.toLong, cov.size.toLong * 1000000L / n)
    }.sortBy(_._1)
  }

  test("q212 coverage matches a BitSet interval-union reference; bounded by q210 windows") {
    val L = 20
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = coverageRef(rows, L)
    val got = Dedup.substringDupCoverage(docs, windowLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._3 == byId(0L)._2, "identical doc: every char covered")
    assert(byId(4L)._3 == 0L, "unrelated doc: zero covered chars")
    // a doc with SOME dup windows covers more chars than windows but at
    // most windows × L (the union can't exceed the naive sum)
    val dupWin = Dedup.exactSubstringDup(docs, windowLen = L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, _, cov, _) =>
      assert(cov <= dupWin(id) * L, s"doc $id union exceeds naive sum")
      assert(cov >= (if (dupWin(id) > 0) L.toLong else 0L),
        s"doc $id with a dup window must cover at least one window's chars")
    }
  }

  test("q212 on real data matches the reference; byHash face is identical") {
    val d = Tables.documents(spark, sf001)
    val rows = d.select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(Dedup.substringDupCoverage(d, 40).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === coverageRef(rows, 40))
    assert(Dedup.substringDupCoverage(d, 40, byHash = true).collect()
      .map(_.toString).toSeq
      === Dedup.substringDupCoverage(d, 40).collect().map(_.toString).toSeq)
  }

  test("q213 window store: build+update probe equals one-shot q210; compact preserves; fresh probe works") {
    import graft.operators.SubstrDupStore
    val dir = java.nio.file.Files.createTempDirectory("substr-store").toString
    val L = 20
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val oldDocs = docs.filter(col("doc_id").isin(0L, 2L, 4L, 7L))
    val newDocs = docs.filter(!col("doc_id").isin(0L, 2L, 4L, 7L))
    SubstrDupStore.build(oldDocs, dir, windowLen = L)
    SubstrDupStore.update(newDocs, dir)
    // the incremental store must answer exactly like the one-shot face
    val oneShot = rows(Dedup.exactSubstringDup(docs, windowLen = L))
    assert(rows(SubstrDupStore.statsAgainst(docs, dir)) === oneShot)
    // a NOT-ingested probe doc that quotes ingested text reports dups
    // without touching the store
    val probe = Seq((99L, docs.filter(col("doc_id") === 2L)
      .select("text").as[String].head())).toDF("doc_id", "text")
    val p = SubstrDupStore.statsAgainst(probe, dir).collect().head
    assert(p.getLong(3) == 1000000L, "fully-quoted probe doc must be all-dup")
    val freshProbe = Seq((99L, "completely novel text never ingested by anyone " +
      "anywhere with enough length to window")).toDF("doc_id", "text")
    assert(SubstrDupStore.statsAgainst(freshProbe, dir)
      .collect().head.getLong(3) == 0L, "novel probe doc must be zero-dup")
    // replayed update wave folds away
    SubstrDupStore.update(newDocs, dir)
    assert(rows(SubstrDupStore.statsAgainst(docs, dir)) === oneShot,
      "replayed wave must not change the folded answers")
    // compact: fewer files, identical folded relation and answers
    val foldedBefore = rows(SubstrDupStore.folded(spark, dir).orderBy("h"))
    val (b, a) = SubstrDupStore.compact(spark, dir)
    assert(b > a, s"three waves must compact: $b -> $a files")
    assert(rows(SubstrDupStore.folded(spark, dir).orderBy("h")) === foldedBefore)
    assert(rows(SubstrDupStore.statsAgainst(docs, dir)) === oneShot)
    // and post-compaction updates still fold in
    SubstrDupStore.update(Seq((100L, docs.filter(col("doc_id") === 4L)
      .select("text").as[String].head())).toDF("doc_id", "text"), dir)
    val after = SubstrDupStore.statsAgainst(docs, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(after(4L) == 1000000L,
      "doc 4 must become all-dup once its copy is ingested")
  }

  /** Independent reference for q214: literal per-position cut decision
    * (window in ≥ 2 distinct docs AND this doc is not the min-id owner),
    * BitSet interval union, character-by-character surgery — none of the
    * fold machinery the Spark face uses. */
  private def applyRef(rows: Seq[(Long, String)], L: Int): Seq[(Long, Long, String, Long)] = {
    val mn = scala.collection.mutable.Map.empty[String, Long]
    val mx = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { case (id, t) =>
      if (t.length >= L) t.sliding(L).foreach { w =>
        mn(w) = math.min(mn.getOrElse(w, Long.MaxValue), id)
        mx(w) = math.max(mx.getOrElse(w, Long.MinValue), id)
      }
    }
    rows.filter(_._2.length >= L).map { case (id, t) =>
      val cov = scala.collection.mutable.BitSet.empty
      (0 to t.length - L).foreach { i =>
        val w = t.substring(i, i + L)
        if (mn(w) != mx(w) && mn(w) != id) cov ++= (i until i + L)
      }
      val kept = t.zipWithIndex.collect { case (c, i) if !cov(i) => c }.mkString
      (id, t.length.toLong, kept, (t.length - kept.length).toLong)
    }.sortBy(_._1)
  }

  test("q214 apply strips non-canonical duplicated spans; the canonical copy survives") {
    val L = 20
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val byText = rows.toMap
    val want = applyRef(rows, L)
    val got = Dedup.substringDedupApply(docs, windowLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === want)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._3 == byText(0L), "canonical (min-id) copy unchanged")
    assert(byId(1L)._3 == "", "exact-dup doc fully stripped")
    assert(byId(1L)._4 == byId(1L)._2)
    assert(byId(2L)._3 == byText(2L), "near-dup pair: min-id side unchanged")
    assert(byId(3L)._4 > 0 && byId(3L)._4 < byId(3L)._2,
      "near-dup pair: non-canonical side partially stripped")
    assert(byId(4L)._4 == 0L, "unrelated doc loses nothing")
    assert(!byId.contains(7L), "doc shorter than the window is absent")
    // exactly one copy of the duplicated text survives: total corpus
    // chars removed equals doc 1's full length plus doc 3's/6's cuts
    assert(got.map(_._4).sum == byId(1L)._2 + byId(3L)._4 + byId(6L)._4)
  }

  test("q214 on real data matches the reference; byHash face is identical") {
    val d = Tables.documents(spark, sf001)
    val rows = d.select("doc_id", "text").as[(Long, String)].collect().toSeq
    def run(byHash: Boolean) = Dedup.substringDedupApply(d, 40, byHash).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val exact = run(byHash = false)
    assert(exact === applyRef(rows, 40))
    assert(run(byHash = true) === exact,
      "hash face must reproduce the exact face (8 bytes/position production shape)")
  }

  test("q215 store-backed apply: ingested parity, at-ingest scrub, corpus-canonical asymmetry") {
    import graft.operators.SubstrDupStore
    val dir = java.nio.file.Files.createTempDirectory("substr-apply").toString
    val L = 20
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    SubstrDupStore.build(docs.filter(col("doc_id") < 4), dir, windowLen = L)
    SubstrDupStore.update(docs.filter(col("doc_id") >= 4), dir)
    val oneShot = rows(Dedup.substringDedupApply(docs, windowLen = L))
    assert(rows(SubstrDupStore.applyAgainst(docs, dir)) === oneShot,
      "fully-ingested corpus: store apply == one-shot apply")
    // a NOT-ingested probe quoting ingested text is scrubbed at ingest
    val quoted = docs.filter(col("doc_id") === 2L).select("text").as[String].head()
    assert(SubstrDupStore.applyAgainst(
        Seq((99L, quoted)).toDF("doc_id", "text"), dir)
      .collect().head.getString(2) == "", "quoted probe doc fully scrubbed")
    // corpus-canonical asymmetry: even a probe with a SMALLER id than
    // every ingested doc is scrubbed — the store cannot retroactively
    // cut already-ingested text (documented min/max-state limitation)
    assert(SubstrDupStore.applyAgainst(
        Seq((-5L, quoted)).toDF("doc_id", "text"), dir)
      .collect().head.getString(2) == "", "corpus copy is canonical regardless of id")
    // novel probe content passes through untouched
    assert(SubstrDupStore.applyAgainst(
        Seq((99L, "totally novel probe content that was never ingested " +
          "anywhere at all by anything")).toDF("doc_id", "text"), dir)
      .collect().head.getLong(3) == 0L, "novel probe doc untouched")
    // replayed update wave folds away
    SubstrDupStore.update(docs.filter(col("doc_id") >= 4), dir)
    assert(rows(SubstrDupStore.applyAgainst(docs, dir)) === oneShot,
      "replayed wave must not change the scrub")
  }

  test("q210 on real data matches the reference; byHash face is identical") {
    val d = Tables.documents(spark, sf001)
    val rows = d.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = substrDupRef(rows, 40)
    def run(byHash: Boolean) = Dedup.exactSubstringDup(d, 40, byHash).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val exact = run(byHash = false)
    assert(exact === want)
    assert(run(byHash = true) === exact,
      "hash face must reproduce the exact face (8 bytes/position production shape)")
  }
}
