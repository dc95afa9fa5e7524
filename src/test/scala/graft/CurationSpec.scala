package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the curation operators beyond oracle parity: the
  * oracle proves Spark and DuckDB agree; these prove the answers are
  * RIGHT — planted PII is found and fully redacted, repetition counts
  * match a brute-force Scala computation, and decontamination flags an
  * exact benchmark copy while never matching a doc against itself. */
class CurationSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("PII scan finds exactly the planted PII and redaction removes all of it") {
    val docs = Seq(
      (1L, "reach me at alice.smith+work@sub.example.co.uk thanks"),
      (2L, "call 415-555-1234 or 650-555-9876 today"),
      (3L, "server at 10.0.14.98 and 192.168.1.1"),
      (4L, "ssn is 123-45-6789"),
      (5L, "all of it: bob@x.io 555-867-5309 127.0.0.1 987-65-4321"),
      (6L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val (counts, redacted) = Curation.piiScan(col("text"))
    val out = docs.select(
      Seq(col("doc_id")) ++ counts.map { case (n, c) => c.as(s"n_$n") } :+
        redacted.as("redacted"): _*)
      .as[(Long, Long, Long, Long, Long, String)].collect().sortBy(_._1)
    // (doc_id, n_email, n_ssn, n_phone, n_ip, redacted)
    assert(out(0) == ((1L, 1L, 0L, 0L, 0L, "reach me at [EMAIL] thanks")))
    assert(out(1)._4 == 2L && out(1)._6 == "call [PHONE] or [PHONE] today")
    assert(out(2)._5 == 2L && out(2)._6 == "server at [IP] and [IP]")
    assert(out(3)._3 == 1L && out(3)._6 == "ssn is [SSN]")
    assert(out(4) == ((5L, 1L, 1L, 1L, 1L, "all of it: [EMAIL] [PHONE] [IP] [SSN]")))
    assert(out(5) == ((6L, 0L, 0L, 0L, 0L, "nothing sensitive here at all")))
    // the redacted text must itself scan clean — no detector fires on it
    val (rescans, _) = Curation.piiScan(col("redacted"))
    val residual = docs.select(redacted.as("redacted"))
      .select(rescans.map(_._2).reduce(_ + _).as("n")).as[Long].collect().sum
    assert(residual == 0L, s"redacted text still contains $residual PII matches")
  }

  test("repetition stats match a brute-force computation on planted docs") {
    val docs = Seq(
      (1L, "a b a b a c"),       // top bigram "a b" x2 of 5; top trigram "a b a" x2 of 4
      (2L, "x x x x"),           // top bigram "x x" x3 of 3; top trigram x2 of 2
      (3L, "one two three four"),// all unique: dup 0, top grams 1
      (4L, "solo")               // 1 word: no grams at all
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs)
      .as[(Long, Long, Long, Double, Long, Double, Long, Double)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 6L, 3L, 0.5, 2L, 0.4, 2L, 0.5)))
    assert(out(1) == ((2L, 4L, 1L, 0.75, 3L, 1.0, 2L, 1.0)))
    assert(out(2) == ((3L, 4L, 4L, 0.0, 1L, 0.333333, 1L, 0.5)))
    assert(out(3) == ((4L, 1L, 1L, 0.0, 0L, 0.0, 0L, 0.0)))
  }

  test("repetition stats are shuffle-free: no exchange in the plan") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val plan = Curation.repetitionStats(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("decontamination flags a benchmark copy, excludes self-matches") {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"$eight tail1 tail2"),      // bench member
      (2L, s"$eight tail1 tail2"),      // exact copy of bench doc 1 -> 100%
      (3L, s"prefix $eight suffix"),    // partial overlap with doc 1
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8 q9") // disjoint vocabulary -> 0
    ).toDF("doc_id", "text")
    val bench = Seq(1L).toDF("bench_id")
    val out = Curation.decontaminationScan(docs, bench)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toList
    val byId = out.map(r => r._1 -> r).toMap
    // doc 1 is the bench doc itself: self-pairs excluded -> clean
    assert(byId(1L) == ((1L, 3L, 0L, 0.0, false)), s"got ${byId(1L)}")
    // doc 2 shares every one of its 3 shingles with bench doc 1
    assert(byId(2L) == ((2L, 3L, 3L, 1.0, true)), s"got ${byId(2L)}")
    // doc 3 has 3 shingles ("prefix w1..w7", "w1..w8", "w2..w8 suffix"),
    // exactly one of which ("w1..w8") is in the bench doc
    assert(byId(3L) == ((3L, 3L, 1L, 0.333333, false)), s"got ${byId(3L)}")
    assert(byId(4L) == ((4L, 2L, 0L, 0.0, false)), s"got ${byId(4L)}")
  }

  test("token-budget mix matches a brute-force greedy fill, one shuffle by source") {
    val docs = Seq(
      (1L, "s1", "aa bb cc"), (2L, "s1", "dd ee"), (3L, "s1", "ff gg hh ii"),
      (4L, "s1", "jj"), (5L, "s2", "kk ll mm nn oo"), (6L, "s2", "pp"),
      (7L, "s2", "qq rr ss tt uu vv ww xx yy zz")
    ).toDF("doc_id", "source", "text")
    val budget = 6L
    val out = Curation.tokenBudgetMix(docs, budget)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    // brute force: per source, order docs by (md5(text), doc_id); take a doc
    // iff the running token total BEFORE it is under budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Seq(
      (1L, "s1", "aa bb cc"), (2L, "s1", "dd ee"), (3L, "s1", "ff gg hh ii"),
      (4L, "s1", "jj"), (5L, "s2", "kk ll mm nn oo"), (6L, "s2", "pp"),
      (7L, "s2", "qq rr ss tt uu vv ww xx yy zz"))
      .groupBy(_._2).toSeq.flatMap { case (_, ds) =>
        var cum = 0L
        ds.sortBy(d => (md5hex(d._3), d._1)).flatMap { case (id, src, text) =>
          val n = text.split(" ").count(_.nonEmpty).toLong
          val before = cum; cum += n
          if (before < budget) Some((id, src, n, before + n)) else None
        }
      }.sortBy(_._1).toList
    assert(out == expected, s"greedy fill mismatch:\n got $out\n exp $expected")
    // every source crosses or meets its budget exactly once (the last doc
    // taken may overshoot; nothing after it is taken)
    out.groupBy(_._2).foreach { case (src, rows) =>
      val maxCum = rows.map(_._4).max
      assert(maxCum >= budget || rows.size == docs.filter($"source" === src).count(),
        s"$src stopped early at $maxCum")
      assert(rows.count(_._4 >= budget) <= 1, s"$src took a doc past the crossing")
    }
    // scale shape: exactly one exchange (by source) feeding the window
    val nExchanges = "Exchange".r.findAllIn(
      Curation.tokenBudgetMix(docs, budget).queryExecution.executedPlan.toString).size
    assert(nExchanges == 1, s"expected one shuffle by source, saw $nExchanges")
  }

  test("stratified sample takes at most n per stratum, deterministically") {
    val docs = (1L to 60L).map(i => (i, s"lang${i % 3}", s"doc text $i"))
      .toDF("doc_id", "lang", "text")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    def sample() = docs
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
    val a = sample().as[(Long, String, String, Long)].collect().sortBy(r => (r._2, r._4))
    val b = sample().as[(Long, String, String, Long)].collect().sortBy(r => (r._2, r._4))
    assert(a.toSeq == b.toSeq, "stratified sample is not deterministic")
    val perLang = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 5), s"per-stratum cap violated: $perLang")
    // ranks are contiguous 1..5 within each stratum
    a.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to 5L), s"$lang ranks: ${rows.map(_._4).toSeq}")
    }
  }

  test("bigram LM score separates typical text from gibberish, matches brute force") {
    // 10 docs of recurring everyday bigrams train the model; one
    // gibberish doc has bigrams seen nowhere else → every one falls back
    // to the smoothing floor and its mean NLL must be the highest
    val typical = (0L until 10L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
    val gibberish = (10L, "zxq wvv qqa plo mnb vcx asd fgh jkl qwe rty uio")
    val docs = (typical :+ gibberish).toDF("doc_id", "text")
    val got = Curation.lmBigramScore(docs)
      .select("doc_id", "n_bigrams", "lm_nll").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val worstTypical = got.collect { case (id, (_, nll)) if id < 10 => nll }.max
    assert(got(10L)._2 > worstTypical, s"gibberish must score worst: $got")
    // brute-force parity on the exact rounded contract
    val texts = ((typical :+ gibberish)).toMap
    def toks(s: String) = s.trim.split(" ").filter(_.nonEmpty).toSeq
    val allBi = texts.toSeq.flatMap { case (id, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(p => (id, p(0), p(1))).toSeq
    }
    val c12 = allBi.groupBy(b => (b._2, b._3)).view.mapValues(_.size)
    val c1 = allBi.groupBy(_._2).view.mapValues(_.size)
    val v = allBi.map(_._3).distinct.size
    val expected = allBi.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, w1, w2) =>
        BigDecimal(-math.log((c12((w1, w2)) + 0.5) / (c1(w1) + 0.5 * v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> (bs.size.toLong,
        (s / bs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // BigDecimal(sum)/n then round-6 can differ from (sum.toDouble/n)
    // rounded at the last ulp; compare through the operator's own form
    val expected2 = allBi.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, w1, w2) =>
        BigDecimal(-math.log((c12((w1, w2)) + 0.5) / (c1(w1) + 0.5 * v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> (bs.size.toLong,
        BigDecimal(s.toDouble / bs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == expected2 || got == expected,
      s"got $got\nexpected $expected2")
  }

  test("bpe pair counts match brute force and pick the right first merge") {
    // "banana" ×3, "bandana" ×1: (a,n) appears 2×/word in banana (×3=6)
    // and 2× in bandana (wait: b-a-n-d-a-n-a → (a,n) at positions 2,5 → 2)
    // → 3×2 + 1×2 = 8, the clear first merge
    val docs = Seq(
      (1L, "banana banana"),
      (2L, "banana bandana")
    ).toDF("doc_id", "text")
    val got = Curation.bpePairCounts(docs, topK = 100)
      .select("l", "r", "pair_count").as[(String, String, Long)].collect()
    val texts = Seq("banana", "banana", "banana", "bandana")
    val wc = texts.groupBy(identity).view.mapValues(_.size)
    val expected = wc.toSeq.flatMap { case (w, c) =>
      w.sliding(2).map(p => (p(0).toString, p(1).toString, c.toLong)).toSeq
    }.groupBy(t => (t._1, t._2)).map { case ((l, r), xs) => (l, r, xs.map(_._3).sum) }
      .toSeq.sortBy(t => (-t._3, t._1, t._2))
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexpected $expected")
    assert(got.head._1 == "a" && got.head._2 == "n" && got.head._3 == 8L,
      s"first merge must be (a,n)=8: ${got.head}")
  }

  test("hll vocab sketches: accurate vs exact, and incremental merge equals full recompute") {
    val docs = Tables.documents(spark, sf001)
    // accuracy: within the HLL error band of exact per-source counts
    val approx = Curation.vocabCardinality(Curation.vocabSketches(docs))
      .as[(String, Double)].collect().toMap
    val exact = docs.select(col("source"),
        explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source").agg(countDistinct("w").as("v"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, v) =>
      val rel = math.abs(approx(src) - v) / v.toDouble
      assert(rel <= 0.05, s"$src: approx ${approx(src)} vs exact $v (rel $rel)")
    }
    // incremental contract: sketch the two halves separately, persist +
    // reload the "corpus" half, union — the ESTIMATES must equal the
    // single-pass sketch exactly (HLL union is exactly associative)
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    Curation.vocabSketches(corpus).write.mode("overwrite").parquet(dir)
    val merged = Curation.vocabCardinality(
        Curation.mergeVocabSketches(spark.read.parquet(dir), Curation.vocabSketches(batch)))
      .as[(String, Double)].collect().toMap
    assert(merged == approx,
      s"incremental merge diverged from full recompute:\n merged=$merged\n full=$approx")
  }

  test("repeated spans find planted boilerplate and respect occurrence vs doc counts") {
    val boiler = "this content is provided under the standard license terms"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon"),
      // doc 3 repeats the boilerplate TWICE: occurrences (4) > docs (3)
      (3L, s"$boiler zeta $boiler"),
      (4L, "totally unrelated text with no shared spans whatsoever here")
    ).toDF("doc_id", "text")
    val got = Curation.repeatedSpans(docs, n = 9, minDocs = 2, topK = 10)
      .select("span", "n_occurrences", "n_docs")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty, "planted boilerplate must surface")
    val top = got.head
    assert(top._1 == boiler, s"top span must be the planted boilerplate: $top")
    assert(top._2 == 4L && top._3 == 3L,
      s"4 occurrences across 3 docs expected: $top")
    // nothing from the unrelated doc qualifies
    assert(got.forall(r => !r._1.contains("whatsoever")))
  }

  test("n-gram novelty: unique docs score 1.0, a verbatim mirror scores 0.0, partial overlap in between") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, shared),                           // mirrored by doc 2 → novelty 0
      (2L, shared),
      (3L, "one two three four five six"),    // fully novel → 1.0
      // shares its first 3-gram window with nothing, but 4/4 of doc 4's
      // grams also appear in doc 5's prefix
      (4L, "red orange yellow green blue sky"),
      (5L, "red orange yellow green blue sky extra tail words here")
    ).toDF("doc_id", "text")
    val got = Curation.ngramNovelty(docs, n = 3)
      .select("doc_id", "n_shingles", "n_unique", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1L)._4 == 0.0 && m(2L)._4 == 0.0, s"mirror pair must be 0-novel: $got")
    assert(m(3L)._4 == 1.0, s"unique doc must be fully novel: $got")
    assert(m(4L)._4 == 0.0, "every gram of the prefix doc appears in the longer doc")
    // doc 5: 8 grams, the first 4 shared with doc 4, the last 4 unique
    assert(m(5L)._2 == 8L && m(5L)._3 == 4L && m(5L)._4 == 0.5, s"$got")
  }

  test("boilerplate strip removes planted spans and leaves clean docs untouched") {
    val boiler = "this content is provided under the standard license terms today"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon"),
      (3L, "totally unrelated text with no shared spans whatsoever in here")
    ).toDF("doc_id", "text")
    val got = Curation.boilerplateStrip(docs, n = 8, minDocs = 2, topK = 10)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1L)._4 && m(2L)._4, s"boilerplate docs must change: $got")
    assert(!m(3L)._4 && m(3L)._2 == m(3L)._3, s"clean doc must not change: $got")
    // three overlapping 8-token windows of the 10-token boilerplate are
    // detected; the fold replaces the lexicographically FIRST (tokens
    // 1..8, "content is ... terms") with one space, which destroys the
    // other two — so each doc shrinks by exactly len(that window) - 1
    val replaced = boiler.split(" ").slice(1, 9).mkString(" ")
    assert(m(1L)._2 - m(1L)._3 == replaced.length - 1, s"$got")
    assert(m(2L)._2 - m(2L)._3 == replaced.length - 1, s"$got")
  }

  test("source overlap matrix counts shared 8-grams exactly on a planted corpus") {
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8", "A"),            // 1 shingle
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 b9", "B"),         // 2 shingles, 1 shared w/ A
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8", "C")             // 1 shingle, disjoint
    ).toDF("doc_id", "text", "source")
    val got = Curation.sourceOverlapMatrix(docs)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.size == 6, s"full off-diagonal matrix: $got")
    assert(got(("A", "B")) == ((1L, 1L, 1.0)), s"$got")
    assert(got(("B", "A")) == ((2L, 1L, 0.5)), s"$got")
    assert(got(("A", "C")) == ((1L, 0L, 0.0)), s"$got")
    assert(got(("C", "A")) == ((1L, 0L, 0.0)), s"$got")
    assert(got(("B", "C")) == ((2L, 0L, 0.0)), s"$got")
    assert(got(("C", "B")) == ((1L, 0L, 0.0)), s"$got")
  }

  test("BPE training reproduces the hand-computed merge table on the Sennrich corpus") {
    // low x5, lower x2, newest x6, widest x3 — the classic BPE example.
    // Hand-derived rounds (count desc, then (l, r) lexicographic ties):
    //   1: (e,s)=9 ties (s,t)=9 -> e < s     2: (es,t)=9
    //   3: (l,o)=7 ties (o,w)=7 -> l < o     4: (lo,w)=7
    //   5: (n,e)=(e,w)=(w,est)=6 -> (e,w)
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ") + " lower lower"),
      (2L, Seq.fill(6)("newest").mkString(" ") + " widest widest widest")
    ).toDF("doc_id", "text")
    val got = Curation.bpeTrainMerges(docs, nMerges = 5)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L), (5L, "e", "w", 6L)))
  }

  test("BPE merge replacement is greedy left-to-right and exhaustion rounds emit nothing") {
    // "aaa" x2: round 1 counts BOTH adjacent (a,a) positions (4 total)
    // and merges greedily -> [aa, a], NOT [aa, aa]; round 2 then sees
    // (aa,a)=2. A double-merge bug changes both rows.
    val aaa = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val gotA = Curation.bpeTrainMerges(aaa, nMerges = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(gotA.toSeq == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)))
    // pair exhaustion: "ab" collapses after one merge; the remaining
    // rounds hit the sentinel and are filtered from the output
    val ab = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val gotB = Curation.bpeTrainMerges(ab, nMerges = 5)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(gotB.toSeq == Seq((1L, "a", "b", 3L)))
  }

  test("BPE training releases every per-round barrier it pins") {
    val docs = Seq((1L, "low lower newest widest word words wording")).toDF("doc_id", "text")
    val before = Barriers.persistentRddCount(spark)
    val out = Curation.bpeTrainMerges(docs, nMerges = 4)
    out.collect()
    // only the result's own pin may remain beyond the entry state
    assert(Barriers.persistentRddCount(spark) <= before + 1,
      s"BPE loop leaked barriers: ${Barriers.persistentRddCount(spark)} vs $before")
    Barriers.release(out)
    assert(Barriers.persistentRddCount(spark) <= before)
  }

  test("BPE tokenize applies merges in rank order and reports exact fertility") {
    val merges = Seq((1L, "e", "s", 9L), (2L, "es", "t", 9L))
      .toDF("merge_rank", "l", "r", "pair_count")
    val docs = Seq(
      (1L, "newest widest"), // n,e,w,est (4) + w,i,d,est (4)
      (2L, "low"),           // untouched: l,o,w (3)
      (3L, "est set")        // est -> e,s,t ->(e,s)-> es,t ->(es,t)-> est (1); set -> s,et? no: s,e,t ->(e,s) no adjacent e,s? s-e, e-t -> no merge applies except... (e,s) needs l=e,r=s adjacent; "set" = s,e,t: pairs (s,e),(e,t) -> no merge; stays 3
    ).toDF("doc_id", "text")
    val got = Curation.bpeTokenize(docs, merges)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 8L, 4.0), (2L, 1L, 3L, 3.0), (3L, 2L, 4L, 2.0)))
    // subword-level exactness incl. rank ORDER mattering: (e,s) must run
    // before (es,t) for "est" to collapse to one token
    val sub = Curation.bpeVocabSubwords(docs, merges)
      .as[(String, Seq[String])].collect().toMap
    assert(sub("newest") == Seq("n", "e", "w", "est"))
    assert(sub("widest") == Seq("w", "i", "d", "est"))
    assert(sub("est") == Seq("est"))
    assert(sub("set") == Seq("s", "e", "t"))
    assert(sub("low") == Seq("l", "o", "w"))
  }

  // ---- independent reference BPE (r9 verdict #3): a from-scratch
  //      Sennrich-style implementation on plain Scala collections — no
  //      Spark, no shared code with Curation — asserted merge-for-merge
  //      and subword-for-subword equal to the distributed result on a few
  //      hundred real fixture words. The q51/q78 "two independent faces
  //      must agree" pattern applied to the one family whose queries/
  //      goldens were previously self-referential. ----

  /** UTF-8 binary string order — Spark compares strings as UTF-8 bytes;
    * the reference must tie-break the same way. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Split into code-point symbols (Spark substring counts code points). */
  private def codePoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** The same greedy left-to-right single-pair merge the engine's in-row
    * fold performs, restated as a plain fold. */
  private def greedyMerge(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  /** Reference BPE trainer (Sennrich et al. 2016): corpus-weighted
    * adjacent-pair counts over the word vocabulary; each round merges the
    * (count desc, then (l, r) UTF-8-lexicographic) argmax. */
  private def referenceBpe(texts: Seq[String], nMerges: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Vector[String]]) = {
    // replicate Text.words: trim spaces, split on single-space regex,
    // drop empties
    val ws = texts.flatMap(t =>
      t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .split(" ").filter(_.nonEmpty))
    var vocab: Map[Vector[String], Long] =
      ws.groupBy(identity).map { case (w, g) => codePoints(w) -> g.size.toLong }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    val ranked = Vector.newBuilder[(String, String)]
    for (k <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.size) {
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq.reduceLeft { (a, b) =>
          val ((al, ar), ac) = a; val ((bl, br), bc) = b
          if (bc > ac) b
          else if (bc < ac) a
          else if (utf8Lt(bl, al) || (bl == al && utf8Lt(br, ar))) b
          else a
        }
        merges += ((k.toLong, l, r, cnt))
        ranked += ((l, r))
        vocab = vocab.toSeq
          .map { case (syms, c) => greedyMerge(syms, l, r) -> c }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    val mergeList = ranked.result()
    val subwords = ws.distinct.map { w =>
      w -> mergeList.foldLeft(codePoints(w)) { case (syms, (l, r)) =>
        greedyMerge(syms, l, r)
      }
    }.toMap
    (merges.result(), subwords)
  }

  test("distributed BPE equals an independent reference implementation " +
      "merge-for-merge on real fixture text") {
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 20)
      .select("doc_id", "text")
    val texts = docs.select("text").as[String].collect().toSeq
    assert(texts.map(_.split(" ").count(_.nonEmpty)).sum > 300,
      "fixture too small to be a meaningful cross-check")

    val (refMerges, refSubwords) = referenceBpe(texts, nMerges = 30)
    val merges = Curation.bpeTrainMerges(docs, nMerges = 30)
    val gotMerges = merges
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(gotMerges == refMerges,
      s"merge tables disagree:\n got=$gotMerges\n ref=$refMerges")

    // apply face: every distinct word's subword split must agree too
    val gotSub = Curation.bpeVocabSubwords(docs, merges)
      .as[(String, Seq[String])].collect().toMap
    assert(gotSub.keySet == refSubwords.keySet)
    val disagree = gotSub.collect {
      case (w, s) if s.toVector != refSubwords(w) => (w, s, refSubwords(w))
    }
    assert(disagree.isEmpty, s"subword splits disagree: ${disagree.take(5)}")
    Barriers.release(merges)
  }

  test("BPE train->tokenize roundtrip: subwords reconstruct every word exactly") {
    val docs = Seq(
      (1L, "low low low lower lowest newest newest widest wide widely"),
      (2L, "tokenize tokens token tokenizer")
    ).toDF("doc_id", "text")
    val merges = Curation.bpeTrainMerges(docs, nMerges = 8)
    val bad = Curation.bpeVocabSubwords(docs, merges)
      .filter(expr("concat_ws('', sub) != w")).count()
    assert(bad == 0L, "some word's subwords no longer concatenate to the word")
    // fertility must not exceed word length and must be >= 1 token/word
    val fert = Curation.bpeTokenize(docs, merges)
      .as[(Long, Long, Long, Double)].collect()
    fert.foreach { case (_, nw, ns, spw) =>
      assert(ns >= nw && spw >= 1.0, s"fertility out of range: $nw $ns $spw")
    }
  }

  test("span corruption: input + target reconstruct the original exactly; " +
      "spans are disjoint 3-token runs at the declared density") {
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 100)
      .select("doc_id", "text")
    val orig = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split(" ").filter(_.nonEmpty).toSeq }
      .toMap
    val out = Curation.spanCorruption(docs)
      .as[(Long, Long, Long, Long, Option[Double], String, String)].collect()
    assert(out.length == orig.size)
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { case (id, n, k, nMasked, frac, inp, tgt) =>
      assert(n == orig(id).size && k == n / 20 && nMasked == 3 * k)
      if (n > 0) assert(frac.contains(
        BigDecimal(3.0 * k / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      // parse target into span-index -> 3 tokens
      val tgtToks = tgt.split(" ").filter(_.nonEmpty).toSeq
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      tgtToks.foreach {
        case sentinel(i) => cur = i.toInt; spans(cur) = Vector.empty
        case t => spans(cur) = spans(cur) :+ t
      }
      assert(spans.keySet == (1 to k.toInt).toSet, s"doc $id sentinels: ${spans.keySet}")
      spans.values.foreach(s => assert(s.size == 3, s"doc $id span not 3 tokens: $s"))
      // splicing the spans back into the input reproduces the original
      val rebuilt = inp.split(" ").filter(_.nonEmpty).toSeq.flatMap {
        case sentinel(i) => spans(i.toInt)
        case t => Seq(t)
      }
      assert(rebuilt == orig(id), s"doc $id does not reconstruct")
    }
    // masked fraction across the corpus is ~15% (3 of every 20 tokens,
    // minus sub-20-token remainders)
    val totTok = out.map(_._2).sum.toDouble
    val totMask = out.map(_._4).sum.toDouble
    assert(totMask / totTok > 0.10 && totMask / totTok <= 0.15,
      s"corpus mask rate off: ${totMask / totTok}")
  }

  test("temperature mix: rates match brute force, small sources upweighted, " +
      "tiny sources cap at keep-everything") {
    // 90/10/2 source split — α=0.5 must upweight "small" relative to
    // "big", and "rare" is too small to meet its target so its rate caps
    // at 1.0 (keep everything, budget under-fills)
    val docs = (1L to 102L).map { id =>
      val src = if (id <= 90) "big" else if (id <= 100) "small" else "rare"
      (id, src, "plain words " * 4)
    }.toDF("doc_id", "source", "text")
    val out = Curation.temperatureMix(docs) // alpha 0.5, budgetFrac 0.5
      .as[(Long, String, Long, Double, Double)].collect().sortBy(_._1).toSeq

    // independent brute force with the same decimal discipline
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val n = Map("big" -> 90L, "small" -> 10L, "rare" -> 2L)
    val s = n.map { case (k, v) => k -> r9(math.pow(v.toDouble, 0.5)) }
    val tot = s.values.sum
    val budget = math.floor(102 * 0.5)
    val rate = n.map { case (k, v) =>
      k -> math.min(1.0,
        BigDecimal(budget * (s(k).toDouble / tot.toDouble) / v)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    def u(id: Long) = ((id * 2654435761L) % 4294967296L).toDouble / 4294967296.0
    val expect = (1L to 102L).flatMap { id =>
      val src = if (id <= 90) "big" else if (id <= 100) "small" else "rare"
      if (u(id) < rate(src)) Some((id, src, n(src), rate(src), 1.0 / rate(src)))
      else None
    }
    assert(out == expect, s"got=${out.take(5)} want=${expect.take(5)}")
    // α<1 upweights small sources; the 2-doc source keeps everything
    assert(rate("small") > rate("big"))
    assert(rate("rare") == 1.0)
    assert(out.count(_._2 == "rare") == 2)
  }

  test("importance sample keeps exactly the hash-predicted docs with 1/p weights") {
    // quality 1.0 by construction: >= 20 words, no punctuation, all
    // stopwords; quality 0.025: one non-stop word; NULL: whitespace-only
    val perfect = Seq.fill(20)("the").mkString(" ")
    val docs = (1L to 40L).map { id =>
      (id, if (id <= 20L) perfect else if (id <= 39L) "zzz" else "   ")
    }.toDF("doc_id", "text")
    def u(id: Long): Double = ((id * 2654435761L) % 4294967296L).toDouble / 4294967296.0
    val pLow = 0.1 + 0.9 * 0.025 // same IEEE ops as the operator
    val expected = (1L to 40L).flatMap { id =>
      if (id <= 20L) Some(id -> 1.0)                      // p = 1.0, u < 1 always
      else if (id <= 39L && u(id) < pLow) Some(id -> pLow)
      else None                                           // dropped or NULL quality
    }.toMap
    val got = Curation.importanceSample(docs)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSet == expected.keySet, s"kept set: ${got.map(_._1).toSeq}")
    // some low-quality docs must survive (soft filter, not a hard gate)
    assert(got.exists(_._1 > 20L), "no low-quality doc survived — hash or p broken")
    got.foreach { case (id, q, p, w) =>
      assert(p == expected(id), s"doc $id p_keep $p != ${expected(id)}")
      assert(w == 1.0 / p, s"doc $id weight not 1/p")
      assert(q == (if (id <= 20L) 1.0 else 0.025))
    }
    // Horvitz–Thompson: the weighted count estimates the population of
    // scorable docs (39 here). Deterministic given the fixed hash.
    val ht = got.map(_._4).sum
    assert(math.abs(ht - 39.0) / 39.0 < 0.5, s"HT estimate $ht far from 39")
  }

  test("fuzzy decontamination computes exact best-bench jaccard with attribution and ties") {
    def toks(ws: Seq[String]): String = ws.mkString(" ")
    val w12 = (1 to 12).map(i => s"w$i")
    val docs = Seq(
      // bench pair: 10 and 20 are exact duplicates of each other
      (10L, toks(w12)),
      (20L, toks(w12)),
      // near-copy of the bench text: last token changed -> 4 of 5
      // shingles shared, union 6, jaccard 4/6
      (1L, toks(w12.init :+ "x")),
      // shares exactly the first 8-gram -> inter 1, union 9
      (2L, toks(w12.take(8) ++ Seq("y1", "y2", "y3", "y4"))),
      // >= 8 tokens, disjoint -> row with null attribution
      (3L, toks((1 to 9).map(i => s"z$i"))),
      // < 8 tokens -> no shingles, no row
      (4L, "a b c")
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") >= 10L).select(col("doc_id").as("bench_id"))
    val got = Curation.fuzzyDecontaminationScan(docs, bench)
      .as[(Long, Long, Option[Long], Double, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 10L, 20L))
    // doc 1: ties 10 and 20 at 4/6 -> attribution resolves to min id 10
    assert(got(0) == ((1L, 5L, Some(10L), 0.666667, true)))
    assert(got(1) == ((2L, 5L, Some(10L), 0.111111, false)))
    assert(got(2) == ((3L, 2L, None, 0.0, false)))
    // bench docs score against the OTHER bench doc (never themselves):
    // exact duplicates -> jaccard 1.0
    assert(got(3) == ((10L, 5L, Some(20L), 1.0, true)))
    assert(got(4) == ((20L, 5L, Some(10L), 1.0, true)))
  }

  test("chunk windows split docs into overlapping spans covering every token") {
    val t70 = (1 to 70).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, t70),
      (2L, (1 to 10).map(i => s"s$i").mkString(" ")),
      (3L, "   ")                                       // no tokens -> no rows
    ).toDF("doc_id", "text")
    val got = Curation.chunkWindows(docs, chunkTokens = 64, stride = 32)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 64L), (1L, 32L, 38L), (2L, 64L, 6L)), s"${d1.toSeq}")
    assert(d1(0)._5 == (1 to 64).map(i => s"t$i").mkString(" "))
    assert(d1(2)._5 == (65 to 70).map(i => s"t$i").mkString(" "))
    // coverage: the union of [tok_start, tok_start + n_chunk_tokens)
    // spans of a doc must cover every token exactly through the end
    assert(d1.map(c => c._3 + c._4).max == 70L)
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(c => (c._2, c._3, c._4)).toSeq == Seq((0L, 0L, 10L)), s"${d2.toSeq}")
    assert(!got.exists(_._1 == 3L), "empty doc emits no chunks")
  }

  test("source profile computes exact percentiles, totals, and language mix on planted docs") {
    def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, doc(10), "en", "A"),
      (2L, doc(20), "en", "A"),
      (3L, doc(100), "de", "A"),
      (4L, doc(50), "fr", "B")
    ).toDF("doc_id", "text", "lang", "source")
    val got = Curation.sourceProfile(docs)
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = got("A")
    assert(a._2 == 3L && a._3 == 130L, s"$a")
    assert(a._4 == 20.0, s"p50 of (10,20,100) is 20: $a")
    // p95 at rank 0.95*(3-1)=1.9 -> 20 + 0.9*(100-20) = 92
    assert(a._5 == 92.0, s"interpolated p95: $a")
    // quality_p50 of 3 docs = the middle doc's quality (doc 2 here:
    // quality is monotone in n_words for these no-punct no-stop texts)
    val q2 = Curation.qualityScored(docs.filter(col("doc_id") === 2))
      .select("quality").as[Double].head()
    assert(a._6 == q2, s"quality p50 must be doc 2's score $q2: $a")
    // avg_chars integer-sum-then-divide; frac_en = 2/3
    val chars = Seq(doc(10), doc(20), doc(100)).map(_.length.toLong).sum
    assert(a._7 == math.round(chars.toDouble / 3 * 1e6) / 1e6, s"$a")
    assert(a._8 == math.round(2.0 / 3 * 1e6) / 1e6, s"$a")
    val b = got("B")
    assert(b._2 == 1L && b._3 == 50L && b._4 == 50.0 && b._5 == 50.0 && b._8 == 0.0, s"$b")
  }

  test("sketched source overlap tracks the exact matrix; merge equals full recompute") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val exact = Curation.sourceOverlapMatrix(docs)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    val approx = Curation.sourceOverlapSketched(Curation.sourceShingleSketches(docs))
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    assert(approx.keySet == exact.keySet, "same pair coverage")
    val cardErr = exact.map { case (k, (nA, _)) =>
      math.abs(approx(k)._1 / nA - 1.0) }.max
    val fracErr = exact.map { case (k, (_, f)) =>
      math.abs(approx(k)._2 - f) }.max
    info(f"max |n_a_approx/n_a - 1| = $cardErr%.4f, max |frac - exact| = $fracErr%.4f")
    assert(cardErr <= 0.05, f"per-source cardinality estimate off by $cardErr%.4f")
    assert(fracErr <= 0.08, f"overlap fraction off by $fracErr%.4f")
    // incremental: sketch two disjoint batches, merge, estimate — the
    // matrix must equal the full-corpus recompute EXACTLY (union is
    // register-wise max: associative, commutative, duplicate-absorbing)
    val h1 = Curation.sourceShingleSketches(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val h2 = Curation.sourceShingleSketches(docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    val merged = Curation.sourceOverlapSketched(
        Curation.mergeSourceShingleSketches(h1, h2))
      .as[(String, String, Double, Double, Double)].collect().sortBy(r => (r._1, r._2))
    val full = Curation.sourceOverlapSketched(Curation.sourceShingleSketches(docs))
      .as[(String, String, Double, Double, Double)].collect().sortBy(r => (r._1, r._2))
    assert(merged.toSeq == full.toSeq, "merged-batch estimates must equal full recompute")
  }

  test("q208 KMV overlap: exact below k, tracks the exact matrix, merge equals full recompute") {
    // sub-k regime: every source holds < 256 distinct shingles, so the
    // sketch IS the distinct hash set and every estimate must be EXACT
    val planted = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8", "A"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 b9", "B"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8", "C")
    ).toDF("doc_id", "text", "source")
    val subK = Curation.sourceOverlapKmv(Curation.sourceShingleKmv(planted))
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(subK(("A", "B")) == ((1.0, 1.0, 1.0)), s"$subK")
    assert(subK(("B", "A")) == ((2.0, 1.0, 0.5)), s"$subK")
    assert(subK(("A", "C")) == ((1.0, 0.0, 0.0)), s"$subK")
    // real corpus: both sketch families vs the exact matrix — record the
    // error comparison (the KMV direct estimator's selling point is the
    // near-disjoint regime, where inclusion–exclusion degrades)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val exact = Curation.sourceOverlapMatrix(docs)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3.toDouble, r._5))).toMap
    val kmv = Curation.sourceOverlapKmv(Curation.sourceShingleKmv(docs))
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    val hll = Curation.sourceOverlapSketched(Curation.sourceShingleSketches(docs))
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    assert(kmv.keySet == exact.keySet)
    val kmvCardErr = exact.map { case (k, (nA, _)) =>
      math.abs(kmv(k)._1 / nA - 1.0) }.max
    val kmvFracErr = exact.map { case (k, (_, f)) => math.abs(kmv(k)._2 - f) }.max
    val hllFracErr = exact.map { case (k, (_, f)) => math.abs(hll(k)._2 - f) }.max
    info(f"KMV: card err $kmvCardErr%.4f, frac err $kmvFracErr%.4f; HLL frac err $hllFracErr%.4f")
    assert(kmvCardErr <= 0.15, f"KMV cardinality off by $kmvCardErr%.4f (k=256 ≈ 6%% RSE)")
    assert(kmvFracErr <= 0.08, f"KMV overlap fraction off by $kmvFracErr%.4f")
    // incremental contract: disjoint halves, merge — estimates EXACTLY
    // equal the full recompute (sorted-merge+truncate is associative)
    val h1 = Curation.sourceShingleKmv(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val h2 = Curation.sourceShingleKmv(docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    val merged = Curation.sourceOverlapKmv(Curation.mergeSourceShingleKmv(h1, h2))
      .as[(String, String, Double, Double, Double)].collect().sortBy(r => (r._1, r._2))
    val full = Curation.sourceOverlapKmv(Curation.sourceShingleKmv(docs))
      .as[(String, String, Double, Double, Double)].collect().sortBy(r => (r._1, r._2))
    assert(merged.toSeq == full.toSeq, "merged-batch KMV must equal full recompute")
  }

  test("sketched source overlap separates a planted mirror from a disjoint source") {
    val base = (1 to 40).map(i => s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h w${i}i")
    val docs = (
      base.zipWithIndex.map { case (t, i) => (i.toLong, t, "A") } ++
      base.zipWithIndex.map { case (t, i) => (100L + i, t, "B") } ++          // mirror of A
      (1 to 40).map(i => (200L + i, s"z${i}a z${i}b z${i}c z${i}d z${i}e z${i}f z${i}g z${i}h z${i}i", "C"))
    ).toDF("doc_id", "text", "source")
    val got = Curation.sourceOverlapSketched(Curation.sourceShingleSketches(docs))
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(got(("A", "B")) >= 0.9 && got(("B", "A")) >= 0.9, s"mirror must read ~1: $got")
    assert(got(("A", "C")) <= 0.1 && got(("C", "A")) <= 0.1, s"disjoint must read ~0: $got")
    assert(got(("B", "C")) <= 0.1 && got(("C", "B")) <= 0.1, s"disjoint must read ~0: $got")
  }

  test("curation funnel drops the planted dup, low-quality, and contaminated docs in order") {
    val t1 = "the quick brown fox jumps over a lazy dog today"
    val bench = "the bench document holds nine distinct words exactly here" // 9 words
    val docs = Seq(
      (1L, t1, "s"),                                      // keeper of the dup pair
      (2L, t1, "s"),                                      // exact dup -> stage 1 drop
      (3L, "another unique document with plenty of the good words inside it today", "s"),
      (4L, "bad!!! doc??? with### lots$$$ of!!! punct%%%", "s"), // worst quality -> stage 2 drop
      (5L, s"$bench extra", "s"),                         // 2 of 3 shingles from bench -> stage 3 drop
      (6L, bench, "s")                                    // the bench doc itself: keeps
    ).toDF("doc_id", "text", "source")
    val benchIds = Seq(6L).toDF("bench_id")
    val got = Curation.curationFunnel(docs, benchIds, keepFrac = 0.8)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    def toks(ids: Long*): Long = docs.filter(col("doc_id").isin(ids: _*))
      .select(col("text")).as[String].collect()
      .map(_.trim.split("\\s+").length.toLong).sum
    assert(got.map(_._1).toSeq ==
      Seq("0_raw", "1_exact_dedup", "2_quality_gate", "3_decontaminated"))
    assert(got(0) == (("0_raw", 6L, toks(1, 2, 3, 4, 5, 6))), s"$got")
    assert(got(1) == (("1_exact_dedup", 5L, toks(1, 3, 4, 5, 6))), s"$got")
    assert(got(2) == (("2_quality_gate", 4L, toks(1, 3, 5, 6))), s"$got")
    assert(got(3) == (("3_decontaminated", 3L, toks(1, 3, 6))), s"$got")
  }

  test("hashed repeated spans equal the exact form (planted corpus and real data)") {
    val boiler = "this content is provided under the standard license terms"
    val planted = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon"),
      (3L, s"$boiler zeta $boiler"),
      (4L, "totally unrelated text with no shared spans whatsoever here")
    ).toDF("doc_id", "text")
    for ((name, docs) <- Seq(
        "planted" -> planted,
        "sf0.001" -> Tables.documents(spark, sf001))) {
      val exact = Curation.repeatedSpans(docs, n = 8, minDocs = 2, topK = 100)
        .as[(String, Long, Long)].collect().toSeq
      val hashed = Curation.repeatedSpansHashed(docs, n = 8, minDocs = 2, topK = 100)
        .as[(String, Long, Long)].collect().toSeq
      assert(hashed == exact,
        s"$name: hashed face diverged\n got ${hashed.take(5)}\n exp ${exact.take(5)}")
    }
  }

  test("persisted bench shingle set reproduces the direct decontamination scan") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 tail1 tail2"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 tail1 tail2"),
      (3L, "prefix w1 w2 w3 w4 w5 w6 w7 w8 suffix"),
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8 q9")
    ).toDF("doc_id", "text")
    val bench = Seq(1L).toDF("bench_id")
    val direct = Curation.decontaminationScan(docs, bench)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    // build once, persist, reload, scan against — the scheduled-pipeline shape
    val dir = java.nio.file.Files.createTempDirectory("benchsh").toString
    Curation.benchShingleSet(docs, bench).write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val incremental = Curation.decontaminationScanAgainst(docs, reloaded)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(incremental == direct,
      s"scan-against-persisted diverged:\n got $incremental\n exp $direct")
  }

  test("vocab coverage: counts exact vs brute force, top-k is distributed (no global sort)") {
    val docs = Seq(
      (1L, "a b a c a b"),
      (2L, "b c d"),
      (3L, "a  a")
    ).toDF("doc_id", "text")
    val got = Curation.vocabCoverage(docs, topN = 3)
      .select("word", "freq", "rnk", "cum_freq", "cum_frac")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._3)
    // brute force: a=5, b=3, c=2, d=1; total=11; top-3 cumulative 5,8,10
    assert(got.toSeq == Seq(
      ("a", 5L, 1L, 5L, math.rint(5.0 / 11 * 1e6) / 1e6),
      ("b", 3L, 2L, 8L, math.rint(8.0 / 11 * 1e6) / 1e6),
      ("c", 2L, 3L, 10L, math.rint(10.0 / 11 * 1e6) / 1e6)),
      s"got ${got.toSeq}")
    // the top-k must plan as TakeOrderedAndProject (per-partition top-N +
    // driver merge), never a global Sort of the whole vocabulary
    val plan = Curation.vocabCoverage(docs, topN = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-k not a distributed partial top-k:\n$plan")
  }

  test("quality percentile gate keeps exactly each source's top quartile") {
    val docs = Tables.documents(spark, sf001)
    val q = Curation.qualityPercentileFilter(docs, keepFrac = 0.25)
      .select("doc_id", "source", "quality").as[(Long, String, Double)].collect()
    val all = Curation.qualityPercentileFilter(docs, keepFrac = 1.0)
      .select("doc_id", "source", "quality").as[(Long, String, Double)].collect()
    all.groupBy(_._2).foreach { case (src, rows) =>
      val kept = q.filter(_._2 == src)
      // percent_rank <= f keeps floor((n-1)*f) + 1 rows
      val expected = math.floor((rows.length - 1) * 0.25).toInt + 1
      assert(kept.length == expected,
        s"source $src: kept ${kept.length}, expected $expected of ${rows.length}")
      // and they are the TOP ones: no dropped doc outscores a kept doc
      val dropped = rows.map(r => (r._1, r._3)).toSet -- kept.map(r => (r._1, r._3)).toSet
      if (dropped.nonEmpty && kept.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._2).max,
          s"source $src: a dropped doc outscores a kept doc")
    }
  }

  test("sequence packing: spans are contiguous per source and seq ids match brute force") {
    val docs = Seq(
      (1L, "srcA", "w1 w2 w3"),                    // 3 tokens
      (2L, "srcA", (1 to 600).map(i => s"t$i").mkString(" ")), // spans >1 seq
      (3L, "srcA", "a b"),
      (4L, "srcB", "x y z"),
      (5L, "srcB", "   "),                         // 0 tokens: excluded
      (6L, "srcB", (1 to 512).map(i => s"u$i").mkString(" "))  // exactly one seq
    ).toDF("doc_id", "source", "text")
    val got = Curation.sequencePacking(docs, seqLen = 512L)
      .select("doc_id", "source", "n_tokens", "start_off", "first_seq", "last_seq", "n_seqs")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    assert(!got.exists(_._1 == 5L), "zero-token doc must not pack")
    // brute force: per source, sort by (md5(text), doc_id), accumulate
    val texts = docs.as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.groupBy(_._2).foreach { case (src, rows) =>
      val expected = rows.map(_._1).map(texts)
        .sortBy { case (id, _, t) => (md5hex(t), id) }
      var off = 0L
      expected.foreach { case (id, _, t) =>
        val n = t.trim.split(" ").count(_.nonEmpty).toLong
        val r = rows.find(_._1 == id).get
        assert(r._4 == off, s"doc $id in $src: start_off ${r._4} != $off")
        assert(r._5 == off / 512 && r._6 == (off + n - 1) / 512,
          s"doc $id in $src: seq ids wrong")
        assert(r._7 == r._6 - r._5 + 1)
        off += n
      }
    }
    // doc 2 (600 tokens) must span 2 sequences wherever it starts
    assert(got.find(_._1 == 2L).get._7 == 2L)
    // doc 6 is 512 tokens: exactly 1 sequence if it starts on a boundary,
    // 2 otherwise — its start_off decides; verify the arithmetic directly
    val d6 = got.find(_._1 == 6L).get
    assert(d6._7 == (d6._4 + 511) / 512 - d6._4 / 512 + 1)
  }

  test("approx quality gate agrees with the exact percentile gate and never inverts scores") {
    val docs = Tables.documents(spark, sf001)
    val exact = Curation.qualityPercentileFilter(docs, keepFrac = 0.25)
      .select("doc_id").as[Long].collect().toSet
    val approx = Curation.qualityThresholdFilterApprox(docs, keepFrac = 0.25)
      .select("doc_id", "source", "quality").as[(Long, String, Double)].collect()
    val approxIds = approx.map(_._1).toSet
    // score monotonicity: within a source, nothing dropped outscores a keeper
    val all = Curation.qualityScored(docs)
      .select("doc_id", "source", "quality").as[(Long, String, Double)].collect()
    all.groupBy(_._2).foreach { case (src, rows) =>
      val kept = rows.filter(r => approxIds.contains(r._1)).map(_._3)
      val dropped = rows.filterNot(r => approxIds.contains(r._1)).map(_._3)
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.min >= dropped.max, s"source $src: approx gate inverted scores")
    }
    // agreement with the exact gate (differences live only in the
    // quantile's error band; measured 1.0 on the fixed corpus — gate with
    // margin) and a sane kept fraction
    val inter = (exact & approxIds).size.toDouble
    assert(inter / exact.size >= 0.9, s"approx gate recall ${inter / exact.size}")
    val frac = approxIds.size.toDouble / all.length
    assert(frac >= 0.15 && frac <= 0.40, s"kept fraction $frac far from 0.25")
    // plan shape: one aggregation + broadcast threshold join — never a
    // per-source window sort over the corpus
    val plan = Curation.qualityThresholdFilterApprox(docs, keepFrac = 0.25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"thresholds must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"approx gate must not window:\n$plan")
  }

  test("label quality profile: exact means on planted docs, vector column never read") {
    val docs = Seq(
      (0L, "srcA", "the cat sat on the mat today"),
      (1L, "srcA", "a dog runs fast"),
      (2L, "srcB", "completely different text here now")
    ).toDF("doc_id", "source", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.0f, 1.0f), 7),
      (2L, Array(1.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val got = Curation.labelQualityProfile(docs, emb)
      .select("label", "n_docs", "avg_quality", "avg_chars")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    // brute force from qualityScored itself (its formula is oracle-pinned
    // by q41/q81); the profile must average EXACTLY those rounded scores
    val q = Curation.qualityScored(docs)
      .select("doc_id", "n_chars", "quality")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def avg6(vs: Seq[Double]) = math.rint(vs.sum / vs.size * 1e6) / 1e6
    assert(got.length == 2)
    assert(got(0)._1 == 7 && got(0)._2 == 2L)
    assert(got(0)._3 == avg6(Seq(q(0L)._3, q(1L)._3)))
    assert(got(0)._4 == avg6(Seq(q(0L)._2.toDouble, q(1L)._2.toDouble)))
    assert(got(1) == ((9, 1L, q(2L)._3, q(2L)._2.toDouble)))
    // the join must shuffle ids + two numerics, never the vector: the
    // embeddings scan's read schema excludes `embedding`
    val p = Curation.labelQualityProfile(docs, emb)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val gotReal = Curation.labelQualityProfile(
      Tables.documents(spark, sf001), Tables.embeddings(spark, sf001))
    val scan = gotReal.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scan.contains("embedding:"), s"vector column must be pruned:\n$scan")
  }

  test("decontamination benchmark side joins as a broadcast") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val bench = Seq(1L).toDF("bench_id")
    val plan = Curation.decontaminationScan(docs, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join strategy:\n$plan")
  }

  test("perplexity buckets match brute force and split exact tertiles per source") {
    // Varied texts so the md5-prefix reference slice is a non-trivial
    // mix; brute force reimplements the full contract (reference-only
    // counts, add-k fallback for unseen histories, decimal rounding,
    // integer-tertile buckets) and the comparison is exact.
    val texts = (0L until 30L).map { i =>
      val filler = Seq("alpha", "beta", "gamma", "delta")(i.toInt % 4)
      (i, if (i % 2 == 0) "s1" else "s2",
        s"the quick $filler fox number $i jumps over the lazy dog again")
    }
    val docs = texts.toDF("doc_id", "source", "text")
    val got = Curation.perplexityBuckets(docs)
      .select("doc_id", "source", "n_bigrams", "lm_nll", "bucket")
      .as[(Long, String, Long, Double, String)].collect().sortBy(_._1)

    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(s: String) = s.trim.split(" ").filter(_.nonEmpty).toSeq
    val isRef = texts.map { case (id, _, t) => id -> (md5hex(t).head <= '3') }.toMap
    assert(isRef.values.exists(identity) && !isRef.values.forall(identity),
      s"planted corpus must mix ref and non-ref docs: $isRef")
    val allBi = texts.flatMap { case (id, src, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(p => (id, src, p(0), p(1)))
    }
    val refBi = allBi.filter(b => isRef(b._1))
    val c12 = refBi.groupBy(b => (b._3, b._4)).view.mapValues(_.size).toMap
    val c1 = refBi.groupBy(_._3).view.mapValues(_.size).toMap
    val v = refBi.map(_._4).distinct.size
    val scored = allBi.groupBy(b => (b._1, b._2)).map { case ((id, src), bs) =>
      val s = bs.map { case (_, _, w1, w2) =>
        BigDecimal(-math.log((c12.getOrElse((w1, w2), 0) + 0.5) / (c1.getOrElse(w1, 0) + 0.5 * v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (id, src, bs.size.toLong,
        BigDecimal(s.toDouble / bs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val expected = scored.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1))
      val n = ordered.size
      ordered.zipWithIndex.map { case ((id, src, nb, nll), i) =>
        val bucket = if (i * 3 < n) "head" else if (i * 3 < 2 * n) "middle" else "tail"
        (id, src, nb, nll, bucket)
      }
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected,
      s"got:\n${got.toSeq.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
    // each source's buckets are (ceil) tertiles of its doc count
    got.groupBy(_._2).foreach { case (src, rows) =>
      val byBucket = rows.groupBy(_._5).view.mapValues(_.length).toMap
      val n = rows.length
      val head = n - (2 * n / 3) // #ranks with (rn-1)*3 < n
      assert(byBucket.getOrElse("head", 0) == head, s"$src tertiles off: $byBucket")
    }
  }

  test("shard manifest: hierarchical prefix sum equals the sequential scan, " +
      "invariant to bucket size, shards respect the token budget") {
    val docs = (1L to 97L).map { id =>
      (id, s"src${id % 5}", ("w " * (3 + (id % 11)).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val got = Curation.shardManifest(docs, shardTokens = 50, bucketSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq

    // brute force: sort by the training-order key, running sum
    val byKey = got.map(r => (r._1, r._2, r._3)).sortBy(_._2)
    var cum = 0L
    val expect = byKey.map { case (id, key, n) =>
      val row = (id, key, n, cum, cum / 50); cum += n; row
    }
    assert(got == expect, s"got=${got.take(4)} want=${expect.take(4)}")
    // the decomposition must not depend on the bucket size
    val other = Curation.shardManifest(docs, shardTokens = 50, bucketSize = 7)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(other == got, "bucketSize must not change the result")
    // budget property: a shard's tokens stay under budget + its last doc
    got.groupBy(_._5).foreach { case (shard, rows) =>
      val tokens = rows.map(_._3).sum
      val lastDoc = rows.maxBy(_._2)._3
      assert(tokens < 50 + lastDoc, s"shard $shard holds $tokens tokens")
    }
    // partitioning invariance
    val rep = Curation.shardManifest(docs.repartition(13), shardTokens = 50,
      bucketSize = 16).as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(_._2).toSeq
    assert(rep == got, "manifest not partitioning-invariant")
  }

  test("q207 shard write: physical partitions match the manifest, text round-trips byte-true") {
    val docs = (1L to 97L).map { id =>
      (id, s"src${id % 5}", ("w " * (3 + (id % 11)).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val manifest = Curation.shardManifest(docs, shardTokens = 50, bucketSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect()
    val out = java.nio.file.Files.createTempDirectory("shard-write").toString
    val audit = Curation.writeShards(docs, out, shardTokens = 50, bucketSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // the audit read back from FILES equals the manifest's arithmetic
    val want = manifest.groupBy(_._5).map { case (sh, rows) =>
      (sh, rows.length.toLong, rows.map(_._3).sum,
        rows.map(_._2).min, rows.map(_._2).max)
    }.toSeq.sortBy(_._1)
    assert(audit.toSeq === want)
    // one directory per shard on disk
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(dirs.length == want.length, s"partition dirs: ${dirs.toSeq}")
    // spot-check payload integrity: a doc's text reads back byte-equal
    val back = spark.read.parquet(out)
      .filter(col("doc_id") === 42L).select("text").as[String].collect().head
    val orig = docs.filter(col("doc_id") === 42L).select("text").as[String]
      .collect().head
    assert(back === orig)
    // trainer contract: shards are order-contiguous (shard N's last key
    // precedes shard N+1's first)
    want.sliding(2).foreach {
      case Seq((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB, "shards must partition the training order")
      case _ =>
    }
  }

  test("source KL divergence matches brute force and attributes the drift " +
      "to the planted outlier word") {
    // three sources share a common vocabulary; "drift" additionally
    // hammers a private word — its KL must dominate and the argmax must
    // name that word
    val docs = Seq(
      (1L, "plain", "the cat sat on the mat"),
      (2L, "plain", "the dog sat on the rug"),
      (3L, "mixed", "the cat ran on the rug"),
      (4L, "mixed", "the dog ran on the mat"),
      (5L, "drift", "zebra zebra zebra zebra the cat"),
      (6L, "drift", "zebra zebra zebra zebra on mat")
    ).toDF("doc_id", "source", "text")
    val got = Curation.sourceKlDivergence(docs)
      .as[(String, Long, Long, Double, String, Double)].collect()
      .sortBy(_._1).toSeq

    // independent brute force with the same rounding discipline
    val texts = Seq(
      ("plain", "the cat sat on the mat"), ("plain", "the dog sat on the rug"),
      ("mixed", "the cat ran on the rug"), ("mixed", "the dog ran on the mat"),
      ("drift", "zebra zebra zebra zebra the cat"),
      ("drift", "zebra zebra zebra zebra on mat"))
    val cs = texts.flatMap { case (s, t) => t.split(" ").map(w => (s, w)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nS = cs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vS = cs.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val cw = cs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cw.values.sum
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val contribs = cs.map { case ((s, w), c) =>
      val p = c.toDouble / nS(s); val q = cw(w).toDouble / n
      (s, w) -> r9(p * math.log(p / q))
    }
    val expect = nS.keys.toSeq.sorted.map { s =>
      val mine = contribs.collect { case ((`s`, w), ct) => (w, ct) }.toSeq
      val kl = r6(mine.map(_._2).sum.toDouble)
      val (tw, tc) = mine.minBy { case (w, ct) => (-ct, w) }
      (s, nS(s), vS(s), kl, tw, r6(tc.toDouble))
    }
    assert(got == expect, s"got=$got\nwant=$expect")
    val byName = got.map(r => r._1 -> r).toMap
    // the pooled corpus mix absorbs part of zebra's mass, so the margin
    // is ~1.6x, not unbounded — deterministic on this fixed fixture
    assert(byName("drift")._4 > 1.5 * byName("plain")._4,
      s"planted drift source must dominate: $got")
    assert(byName("drift")._5 == "zebra", s"attribution: ${byName("drift")}")
  }

  test("Kneser-Ney score matches brute force; continuation counts separate " +
      "a rigid-phrase word from a diverse-history word at equal frequency") {
    // "francisco" appears 4x, ALWAYS after "san" (continuation count 1);
    // "thing" appears 4x after 4 DISTINCT words (continuation count 4).
    // Raw frequency ties; KN's backoff mass must differ.
    val docs = Seq(
      (1L, "san francisco san francisco"),
      (2L, "san francisco and san francisco"),
      (3L, "good thing bad thing odd thing new thing"),
      (4L, "and good and bad and odd and new")
    ).toDF("doc_id", "text")
    val got = Curation.knBigramScore(docs)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

    // independent brute force with the same decimal discipline
    val texts = Map(
      1L -> "san francisco san francisco",
      2L -> "san francisco and san francisco",
      3L -> "good thing bad thing odd thing new thing",
      4L -> "and good and bad and odd and new")
    val bigrams = texts.view.mapValues { t =>
      val ws = t.split(" ").toSeq; ws.zip(ws.tail)
    }.toMap
    val all = bigrams.values.flatten.toSeq
    val c12 = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1f = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = c12.size.toLong
    def nll(b: (String, String)): BigDecimal = {
      val p = (c12(b) - 0.75) / c1(b._1) +
        (0.75 * n1f(b._1) / c1(b._1)) * (n1b(b._2).toDouble / types)
      BigDecimal(-math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val expect = bigrams.toSeq.map { case (id, bs) =>
      val s = bs.map(nll).sum
      (id, bs.size.toLong,
        BigDecimal(s.toDouble / bs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(got == expect, s"got=$got want=$expect")
    // the KN-vs-add-k distinction: equal raw frequency (both occur 4x as
    // a bigram continuation), different continuation diversity
    assert(all.count(_._2 == "francisco") == 4 && all.count(_._2 == "thing") == 4,
      "fixture drifted: frequencies no longer tie")
    assert(n1b("francisco") == 1L && n1b("thing") == 4L,
      s"continuation counts: francisco=${n1b("francisco")} thing=${n1b("thing")}")
  }

  test("epoch mix: copies match brute force, small sources run past one epoch") {
    // token masses 900 vs 40 — α=0.5 must push the small source past
    // one epoch (upsampling: docs emit MULTIPLE copies) while the big
    // source runs under one
    val docs = (1L to 100L).map { id =>
      if (id <= 90) (id, "big", ("w " * 10).trim)   // 90 docs x 10 tokens
      else (id, "small", ("w " * 4).trim)           //  10 docs x 4 tokens
    }.toDF("doc_id", "source", "text")
    val out = Curation.epochMix(docs)
      .as[(Long, String, Double, Long, Long)].collect()
      .sortBy(r => (r._1, r._5)).toSeq

    // independent brute force with the same decimal discipline
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = Map("big" -> 900L, "small" -> 40L)
    val s = m.map { case (k, v) => k -> r9(math.pow(v.toDouble, 0.5)) }
    val sTot = s.values.sum
    val epochs = m.map { case (k, v) =>
      k -> r6(940.0 * (s(k).toDouble / sTot.toDouble) / v.toDouble)
    }
    def u(id: Long) = ((id * 2654435761L) % 4294967296L).toDouble / 4294967296.0
    val expect = (1L to 100L).flatMap { id =>
      val src = if (id <= 90) "big" else "small"
      val e = epochs(src)
      val copies = math.floor(e).toLong +
        (if (u(id) < e - math.floor(e)) 1L else 0L)
      (1L to copies).map(c => (id, src, e, copies, c))
    }
    assert(out == expect, s"got=${out.take(5)} want=${expect.take(5)}")
    assert(epochs("small") > 1.0, s"small source must upsample: $epochs")
    assert(epochs("big") < 1.0, s"big source must downsample: $epochs")
    // upsampling is real: some small-source doc emits >= 2 copies
    assert(out.exists(r => r._2 == "small" && r._4 >= 2L), s"no multi-copy doc")
    // realized token mass tracks the per-source target within the
    // +/-1-copy-per-doc coin granularity
    val smallTokens = out.count(_._2 == "small") * 4L
    val target = 940.0 * (s("small").toDouble / sTot.toDouble)
    assert(math.abs(smallTokens - target) <= 10 * 4,
      s"realized small-source tokens $smallTokens vs target $target")
  }

  test("PMI collocations match brute force and rank a planted collocation first") {
    // "alpha beta" always co-occur (collocation); "noise" is frequent but
    // pairs uniformly (independence -> PMI ~ 0); floor excludes rare pairs
    val phrase = Seq.fill(6)("alpha beta").mkString(" ")
    val docs = (1L to 10L).map { id =>
      (id, if (id <= 5) phrase else "noise " + (s"w$id noise " * 5).trim)
    }.toDF("doc_id", "text")
    val got = Curation.pmiCollocations(docs, minCount = 3, topK = 20)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq

    // independent brute force, same ops
    val texts = (1L to 10L).map { id =>
      if (id <= 5) phrase else "noise " + (s"w$id noise " * 5).trim
    }
    val toks = texts.map(_.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    val bi = toks.flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = bi.toSeq.collect {
      case ((w1, w2), c12) if c12 >= 3 =>
        val pmi = BigDecimal(math.log(c12.toDouble * n / (uni(w1).toDouble * uni(w2).toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (w1, w2, c12, uni(w1), uni(w2), pmi)
    }.sortBy(r => (-r._6, r._1, r._2)).take(20)
    assert(got == expect, s"got:\n${got.mkString("\n")}\nwant:\n${expect.mkString("\n")}")
    // the planted collocation outranks the independent pair
    assert(got.head._1 == "alpha" && got.head._2 == "beta", s"top: ${got.head}")
    val noisePmi = got.find(r => r._1 == "noise" && r._2 == "noise").map(_._6)
    assert(noisePmi.forall(_ < got.head._6), s"noise-noise $noisePmi not below top")
  }

  test("training order: unique resumable keys, exact round-robin on equal sources, " +
      "stable under repartitioning") {
    val docs = (1L to 60L).map { id =>
      (id, s"src${id % 3}", s"text of document number $id")
    }.toDF("doc_id", "source", "text")
    val out = Curation.trainingOrder(docs)
      .as[(Long, String, Long, Long)].collect().sortBy(_._4).toSeq
    assert(out.map(_._1).sorted == (1L to 60L), "every doc exactly once")
    // equal-sized sources: keys are contiguous 1..N and sources
    // round-robin in blocks of S
    assert(out.map(_._4) == (1L to 60L), s"keys not contiguous: ${out.map(_._4).take(9)}")
    out.grouped(3).foreach { block =>
      assert(block.map(_._2).sorted == Seq("src0", "src1", "src2"),
        s"block not a source round-robin: $block")
    }
    // the order is a shuffle, not doc_id order: within a source, rank
    // follows md5(text), which decorrelates from doc_id
    val firstSrc0 = out.find(_._2 == "src0").get
    assert(out.map(_._1) != (1L to 60L).toSeq, "order must not be corpus order")
    assert(firstSrc0._3 == 1L)
    // deterministic under input partitioning
    val out2 = Curation.trainingOrder(docs.repartition(7))
      .as[(Long, String, Long, Long)].collect().sortBy(_._4).toSeq
    assert(out2 == out, "order not partitioning-invariant")
    // unequal sources: keys stay unique and strictly ordered
    val skew = docs.filter(col("doc_id") <= 50) // src0:16 src1:17 src2:17
    val o3 = Curation.trainingOrder(skew)
      .as[(Long, String, Long, Long)].collect().sortBy(_._4).toSeq
    assert(o3.map(_._4).distinct.size == 50, "keys must stay unique")
    assert(o3.map(_._1).sorted == (1L to 50L))
  }

  test("q123 bloom face: no false negatives vs the exact bench-membership count, tiny FPR") {
    val docs = Tables.documents(spark, sf001)
    val benchIds = docs.filter(substring(md5(col("text")), 1, 1) === "0")
      .select(col("doc_id").as("bench_id"))
    // exact per-doc count of distinct shingles present in the GLOBAL
    // bench shingle set (self-inclusive — the bloom's semantics)
    val bench = Curation.benchShingleSet(docs, benchIds)
      .select(col("b_sh").as("sh")).distinct()
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(0, size(filter(split(trim(text),' '), x -> x != ''))-8), " +
            "i -> concat_ws(' ', slice(filter(split(trim(text),' '), x -> x != ''), i+1, 8)))")))
          .as("sh"))
    val exact = sh.join(bench, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.all("q123_bloom_decontamination").fn(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // one-sided error: n_maybe >= exact membership for every doc
    got.foreach { case (id, (_, maybe)) =>
      assert(maybe >= exact.getOrElse(id, 0L), s"false negative on doc $id")
    }
    exact.keys.foreach(id => assert(got.contains(id)))
    // measured FPR over all non-member probes
    val fp = got.map { case (id, (_, maybe)) => maybe - exact.getOrElse(id, 0L) }.sum
    val nonMembers = got.map { case (id, (n, _)) => n - exact.getOrElse(id, 0L) }.sum
    assert(nonMembers > 0)
    val fpr = fp.toDouble / nonMembers
    assert(fpr < 0.01, s"bloom FPR too high: $fpr ($fp / $nonMembers)")
  }

  test("q123 flags a planted verbatim benchmark copy (both hash families)") {
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, bench),                                   // the benchmark item
      (2L, s"pre $bench post"), // embeds it verbatim (majority of its shingles shared)
      (3L, "totally unrelated content with enough words to form shingles ok yes")
    ).toDF("doc_id", "text")
    Seq("md5", "xxhash64").foreach { family =>
      val out = Curation.bloomDecontaminationScan(docs,
          Seq(1L).toDF("bench_id"), family = family)
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      assert(out(1L), s"[$family] bench doc itself probes positive (self-inclusive)")
      assert(out(2L), s"[$family] embedding doc must be flagged")
      assert(!out(3L), s"[$family] clean doc must not be flagged")
    }
  }

  test("q123 fast family (xxhash64): superset guarantee and FPR hold on sf0.001") {
    // the engine-internal family isn't DuckDB-checkable; the same
    // one-sided-error gates the oracle-checked md5 face passes must hold
    val docs = Tables.documents(spark, sf001)
    val benchIds = docs.filter(substring(md5(col("text")), 1, 1) === "0")
      .select(col("doc_id").as("bench_id"))
    val bench = Curation.benchShingleSet(docs, benchIds)
      .select(col("b_sh").as("sh")).distinct()
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(0, size(filter(split(trim(text),' '), x -> x != ''))-8), " +
            "i -> concat_ws(' ', slice(filter(split(trim(text),' '), x -> x != ''), i+1, 8)))")))
          .as("sh"))
    val exact = sh.join(bench, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Curation.bloomDecontaminationScan(docs, benchIds, family = "xxhash64")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { case (id, (_, maybe)) =>
      assert(maybe >= exact.getOrElse(id, 0L), s"false negative on doc $id")
    }
    val fp = got.map { case (id, (_, maybe)) => maybe - exact.getOrElse(id, 0L) }.sum
    val nonMembers = got.map { case (id, (n, _)) => n - exact.getOrElse(id, 0L) }.sum
    assert(nonMembers > 0 && fp.toDouble / nonMembers < 0.01,
      s"fast-family FPR too high: $fp / $nonMembers")
  }

  test("q133 gopher rules: each planted doc fails exactly its targeted rule") {
    // 58 filler words + 'the a' = 60 words, mean length in range
    def filler(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      // passes every rule
      (1L, filler("word", 58) + " the a"),
      // 10 words: fails word-count only
      (2L, filler("word", 8) + " the a"),
      // mean word length (58*12+4)/60 = 11.67 > 10: fails mean-len only
      (3L, filler("aaaaaaaaaaaa", 58) + " the a"),
      // 10 '#' in 60 words = 0.167 > 0.1: fails symbol-ratio only
      // ('#' words still count as words; alpha 50/60 = 0.833 passes)
      (4L, filler("word", 48) + " the a " + filler("#", 10)),
      // 20 numeric words: alpha 40/60 = 0.667 < 0.8, fails alpha only
      (5L, filler("word", 38) + " the a " + filler("123", 20)),
      // only 1 required word present: fails required-words only
      (6L, filler("word", 59) + " the"),
      // empty doc: word-count + required fail; ratio rules coalesce false
      (7L, ""),
      // boundaries land inclusive: exactly 50 words, symbol ratio
      // exactly 5/50 = 0.1 — both pass
      (8L, filler("word", 43) + " the a " + filler("#", 5)))
      .toDF("doc_id", "text")
    val got = Curation.gopherRules(docs, Seq("the", "a")).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getBoolean(9), r.getBoolean(10), r.getInt(11), r.getBoolean(12))).toMap
    assert(got(1L) === ((true, true, true, true, true, 0, true)))
    assert(got(2L) === ((false, true, true, true, true, 1, false)))
    assert(got(3L) === ((true, false, true, true, true, 1, false)))
    assert(got(4L) === ((true, true, false, true, true, 1, false)))
    assert(got(5L) === ((true, true, true, false, true, 1, false)))
    assert(got(6L) === ((true, true, true, true, false, 1, false)))
    assert(got(7L) === ((false, false, false, false, false, 5, false)))
    assert(got(8L) === ((true, true, true, true, true, 0, true)))
  }

  test("q133 gopher rules: default required-word list is the published one") {
    // the face defaults to Gopher's English list; '...' counts as a
    // symbol alongside '#' (both halves of the published symbol rule)
    val docs = Seq((1L,
      Seq.fill(46)("word").mkString(" ") + " the be to of ... ... ... ... ... ... ..."))
      .toDF("doc_id", "text")
    val r = Curation.gopherRules(docs).collect().head
    assert(r.getLong(5) === 4L, "n_required counts the/be/to/of")
    // 7 '...' words in 57 words = 0.1228 > 0.1 — symbol rule fails
    assert(!r.getBoolean(8), "ellipsis tokens trip the symbol rule")
    assert(r.getBoolean(10), "4 >= 2 required words pass")
  }

  test("q149 padding waste: hand-computed batches and the sorted-wins invariant") {
    // B=2; lengths by doc_id: 1→10, 2→1, 3→10, 4→1, 5→10, 6→1
    // arrival batches (1,2)(3,4)(5,6): slots 20+20+20=60, tokens 33 → waste 27/60
    // sorted by len: (2,4)(6,1)(3,5): slots 2+20+20... order (nt, id):
    //   ids 2,4,6 (len 1), then 1,3,5 (len 10) → batches (2,4)(6,1)(3,5)
    //   slots 2 + 20 + 20 = 42 → waste 9/42
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    val docs = Seq(doc(1, 10), doc(2, 1), doc(3, 10), doc(4, 1), doc(5, 10), doc(6, 1))
      .toDF("doc_id", "text")
    val got = Curation.paddingWaste(docs, batchSize = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got("arrival") === ((6L, 3L, 33L, 60L,
      BigDecimal(27.0 / 60).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("sorted") === ((6L, 3L, 33L, 42L,
      BigDecimal(9.0 / 42).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // invariants: token mass is strategy-independent; sorting never loses
    assert(got("arrival")._3 === got("sorted")._3)
    assert(got("sorted")._5 <= got("arrival")._5)
  }

  test("q140 unimax: hand-computed waterfall with capped and uniform sources") {
    // masses A=10 B=20 C=100 D=110, budget = 9/10 · 240 = 216.
    // Ascending: A capped (10·4 < 216), B capped (20·3 < 206),
    // C not (100·2 = 200 ≥ 186) → fair share (216−30)/2 = 93
    def doc(id: Long, n: Int, src: String) =
      (id, Seq.fill(n)("w").mkString(" "), src)
    val docs = Seq(doc(1, 10, "A"), doc(2, 20, "B"),
      doc(3, 60, "C"), doc(4, 40, "C"), doc(5, 110, "D"))
      .toDF("doc_id", "text", "source")
    val got = Curation.unimaxAllocation(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got("A") === ((10L, true, 10.0, 1.0)))
    assert(got("B") === ((20L, true, 20.0, 1.0)))
    assert(got("C") === ((100L, false, 93.0, 0.93)))
    assert(got("D") === ((110L, false, 93.0,
      BigDecimal(93.0 / 110).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // the waterfall conserves the budget
    assert(math.abs(got.values.map(_._3).sum - 216.0) < 1e-6)
  }

  test("q140 unimax: equal sources split uniformly with nobody capped") {
    val docs = (1L to 4L).map(i => (i, Seq.fill(50)("w").mkString(" "), s"s$i"))
      .toDF("doc_id", "text", "source")
    val got = Curation.unimaxAllocation(docs).collect()
      .map(r => (r.getBoolean(3), r.getDouble(4), r.getDouble(5)))
    assert(got.forall(r => !r._1 && r._2 === 45.0 && r._3 === 0.9))
  }

  test("q134 dsir: target-vocabulary crawl docs outweigh crawl-vocabulary ones") {
    // reference slice speaks {alpha beta gamma}; crawl docs 100-103 speak
    // the target vocabulary, 104-107 speak {zeta eta theta}. DSIR's whole
    // point: the target-sounding crawl docs must carry the higher weights
    // and win the per-source top-25% selection.
    val ref = (0L until 8L).map(i => (i, s"alpha beta gamma alpha beta gamma", "src"))
    val target = (100L to 103L).map(i => (i, "alpha beta gamma alpha beta gamma", "src"))
    val offTopic = (104L to 115L).map(i => (i, "zeta eta theta zeta eta theta", "src"))
    val docs = (ref ++ target ++ offTopic).toDF("doc_id", "text", "source")
    val got = Curation.dsirWeights(docs, buckets = 512,
        isRef = col("doc_id") < 100).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    val tgtW = (100L to 103L).map(got(_)._1)
    val offW = (104L to 115L).map(got(_)._1)
    assert(tgtW.min > offW.max,
      s"every target-vocab crawl doc must outweigh every off-topic one: $got")
    // 24 docs in 'src' → top 6 selected: the 4 target crawl docs compete
    // with the 8 identical ref docs on the doc_id tie-break; all
    // off-topic docs must be unselected
    assert((104L to 115L).forall(!got(_)._2), "off-topic docs never selected")
  }

  test("q134 dsir matches an independent plain-Scala reference on the rounded contract") {
    val docs = Seq(
      (1L, "key agg row the scan", "s0"), (2L, "table value part a", "s0"),
      (3L, "window sort merge key", "s0"), (4L, "the a key value", "s1"),
      (5L, "scan scan scan batch", "s1"), (6L, "agg window the part", "s1"),
      (7L, "row row value sort a", "s1"), (8L, "merge batch key table", "s1"))
      .toDF("doc_id", "text", "source")
    val isRefIds = Set(1L, 4L, 5L) // arbitrary slice, injected as a Column
    val got = Curation.dsirWeights(docs, buckets = 64,
        isRef = col("doc_id").isin(isRefIds.toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)

    // independent reference: same hash, same smoothing, same rounding
    def bucket(t: String): Int = {
      var h = 0L
      t.foreach(c => h = (h * 31 + c.toInt) % 1048576)
      (h % 64).toInt
    }
    val rows = Seq(
      (1L, "key agg row the scan"), (2L, "table value part a"),
      (3L, "window sort merge key"), (4L, "the a key value"),
      (5L, "scan scan scan batch"), (6L, "agg window the part"),
      (7L, "row row value sort a"), (8L, "merge batch key table"))
    val toks = rows.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).map(bucket).toSeq
    }.toMap
    val refToks = toks.filter(kv => isRefIds(kv._1)).values.flatten.toSeq
    val rawToks = toks.filterNot(kv => isRefIds(kv._1)).values.flatten.toSeq
    val ct = refToks.groupBy(identity).view.mapValues(_.size).toMap
    val cr = rawToks.groupBy(identity).view.mapValues(_.size).toMap
    val (nt, nr) = (refToks.size, rawToks.size)
    val expected = toks.map { case (id, bs) =>
      val lw = bs.groupBy(identity).map { case (b, occ) =>
        val diff = math.log((ct.getOrElse(b, 0) + 0.5) / (nt + 32.0)) -
          math.log((cr.getOrElse(b, 0) + 0.5) / (nr + 32.0))
        BigDecimal(occ.size * diff).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (id, bs.size.toLong,
        BigDecimal(lw.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === expected)
  }

  test("q183 kappa matches a plain-Scala confusion replay of the three gates") {
    val docs = Tables.documents(spark, sf001)
    val g = operators.Curation.gopherRules(docs, operators.Curation.corpusRequiredWords)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val q = operators.TextAnalysis.qualityFeatures(docs)
      .selectExpr("doc_id", "coalesce(quality >= 0.5, false)").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val e = operators.TextAnalysis.charEntropy(docs)
      .selectExpr("doc_id", "entropy_nats >= 3.0").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def flag(name: String, id: Long): Boolean = name match {
      case "gopher" => g(id); case "quality" => q(id)
      case _ => e.getOrElse(id, false)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = operators.Curation.filterAgreement(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set(("entropy", "gopher"), ("entropy", "quality"),
      ("gopher", "quality")))
    got.foreach { case ((a, b), (n, agree, rate, kappa)) =>
      val ids = g.keys.toSeq
      val cells = ids.map(id => (flag(a, id), flag(b, id)))
      val n11 = cells.count(c => c._1 && c._2).toLong
      val n10 = cells.count(c => c._1 && !c._2).toLong
      val n01 = cells.count(c => !c._1 && c._2).toLong
      val n00 = cells.count(c => !c._1 && !c._2).toLong
      assert(n === ids.size.toLong && agree === n11 + n00, s"$a/$b counts")
      assert(rate === r6((n11 + n00).toDouble / n), s"$a/$b rate")
      val peNum = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      val expK = r6((n * (n11 + n00) - peNum).toDouble / (n * n - peNum))
      assert(kappa === expK, s"$a/$b kappa")
      assert(kappa >= -1.0 - 1e-9 && kappa <= 1.0 + 1e-9)
    }
  }

  test("q184 Hill: hand-computed doubling tail; all-equal lengths yield null alpha") {
    import spark.implicits._
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    // lengths 16, 8, 4, 2, 1: top-4 at k=3 → x_ref 2, S = 6·ln2, α = 3/S
    val docs = Seq(doc(1, 16), doc(2, 8), doc(3, 4), doc(4, 2), doc(5, 1))
      .toDF("doc_id", "text")
    val r = operators.Curation.tailIndexHill(docs, k = 3).collect().head
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = (r9(math.log(8.0)) + r9(math.log(4.0)) + r9(math.log(2.0)) +
      r9(math.log(1.0))).toDouble
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === r6(s))
    assert(r.getDouble(3) === r6(3.0 / s))
    // degenerate: every length equal → sum_log 0 → null alpha
    val flat = (1L to 10L).map(i => doc(i, 7)).toDF("doc_id", "text")
    val fr = operators.Curation.tailIndexHill(flat, k = 3).collect().head
    assert(fr.getDouble(2) === 0.0 && fr.isNullAt(3))
    // short corpus: fewer than k+1 qualifying docs → k derives from the
    // rows actually present (m − 1), never the requested k — dividing a
    // 2-term sum by k=100 would overstate α by 50×
    val short3 = Seq(doc(1, 4), doc(2, 2), doc(3, 1)).toDF("doc_id", "text")
    val sr = operators.Curation.tailIndexHill(short3, k = 100).collect().head
    val sSum = (r9(math.log(4.0)) + r9(math.log(2.0)) + r9(math.log(1.0))).toDouble
    assert(sr.getLong(0) === 2L, s"k must be m−1=2, not the requested 100: $sr")
    assert(sr.getLong(1) === 1L)
    assert(sr.getDouble(3) === r6(2.0 / sSum))
  }

  test("q179 Neyman: hand-computed integer allocation; zero-variance strata get nothing") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("w").mkString(" "))
    val docs = (
      // a: identical lengths → sd 0 → weight 0, alloc 0
      Seq(doc(1, "a", 5), doc(2, "a", 5)) ++
      // b: lengths 0/2/4 → sample sd exactly 2 → weight 6
      Seq((3L, "b", ""), doc(4, "b", 2), doc(5, "b", 4)) ++
      // c: lengths 10/10/14/14 → sd √(64/12), weight 4·sd
      Seq(doc(6, "c", 10), doc(7, "c", 10), doc(8, "c", 14), doc(9, "c", 14)))
      .toDF("doc_id", "source", "text")
    val got = operators.Curation.neymanAllocation(docs, budget = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    val sdC = BigDecimal(math.sqrt(64.0 / 12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // integer largest-remainder: base b=3 (rem .937·W), c=6 (rem .062·W);
    // the leftover unit goes to b
    assert(got.toSeq === Seq(
      ("a", 2L, 0.0, 0.0, 0L),
      ("b", 3L, 2.0, 6.0, 4L),
      ("c", 4L, sdC, BigDecimal(4 * sdC).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, 6L)))
    assert(got.map(_._5).sum === 10L, "allocations must sum to the budget")
  }

  test("q171 bootstrap CI: degenerate source collapses to the mean; mixed source gets real width") {
    import spark.implicits._
    val clean = (1 to 25).map(_ => "the").mkString(" ") // a fixed high-quality text
    val docs =
      // source "same": 30 identical docs — every resample has the same
      // mean, CI width must be exactly 0 at the point estimate
      (1L to 30L).map(i => (i, "same", clean)) ++
      // source "mix": half clean, half junk — genuine spread
      (31L to 45L).map(i => (i, "mix", clean)) ++
      (46L to 60L).map(i => (i, "mix", "x!"))
    val got = operators.Curation.bootstrapQualityCi(docs.toDF("doc_id", "source", "text"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    val (nS, mS, loS, hiS) = got("same")
    assert(nS === 30L && loS === mS && hiS === mS, s"degenerate CI: ${got("same")}")
    val (nM, mM, loM, hiM) = got("mix")
    assert(nM === 30L)
    assert(loM < mM && mM < hiM, s"mixed CI must strictly bracket: ${got("mix")}")
    assert(hiM - loM > 0.01, "resample weights must actually vary across replicates")
  }

  test("q171 bootstrap coin survives large doc_ids (no Int64 overflow, no weight collapse)") {
    import spark.implicits._
    val clean = (1 to 25).map(_ => "the").mkString(" ")
    // ids straddle 2^31 and reach past 2^32: the pre-fix coin
    // (doc_id·131071·2654435761) leaves Int64 around doc_id ≈ 26,500 —
    // there Spark wraps u negative (every weight 0, replicas all NULL)
    // while DuckDB raises; the mod-2^31 fold must keep every u in [0,1)
    val ids = Seq(30000L, 2147483646L, 2147483649L, 4294967297L, 6000000000L) ++
      (1L to 25L).map(_ + 3000000000L)
    val docs = ids.zipWithIndex.map { case (id, i) =>
      (id, "big", if (i % 2 == 0) clean else "x!")
    }
    val got = operators.Curation.bootstrapQualityCi(docs.toDF("doc_id", "source", "text"))
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(!r.isNullAt(3) && !r.isNullAt(4),
      s"overflowed coin collapses all weights to 0 → NULL CI: $r")
    assert(r.getDouble(3) < r.getDouble(4),
      s"mixed-quality resamples must yield a real CI width: $r")
  }

  test("q165 vocab growth: planted first-occurrences per bucket") {
    import spark.implicits._
    // bucket 0 (docs 0-1): words a b c → 3 new; bucket 1 (docs 2-3):
    // b d → only d is new; bucket 2 (doc 4): all repeats → 0 new
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (2L, "b d"), (3L, "d a"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val got = operators.Curation.vocabGrowth(docs, bucketDocs = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 2L, 3L, 2L, 3L),
      (1L, 2L, 1L, 4L, 4L),
      (2L, 1L, 0L, 5L, 4L)))
  }

  test("q157 gini: uniform source → 0; planted 1..10 ramp → exactly 0.3") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("w").mkString(" "))
    val uniform = (1 to 4).map(i => doc(i.toLong, "a", 1))
    val ramp = (1 to 10).map(i => doc(10L + i, "b", i))
    val docs = (uniform ++ ramp).toDF("doc_id", "source", "text")
    val got = operators.Curation.tokenGini(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // source b: Σ rank·x over sorted 1..10 = Σ i² = 385;
    // G = 2·385/(10·55) − 11/10 = 0.3; top decile = 1 doc (len 10) of 55
    assert(got.toSeq === Seq(
      ("a", 4L, 4L, 0.0, 0.0), // n=4 → top-decile k=0
      ("b", 10L, 55L, 0.3, 0.181818)))
  }

  test("q157 gini: histogram closed form matches a per-row rank replay on sf0.001") {
    val docs = Tables.documents(spark, sf001)
    val rows = docs.selectExpr("source",
        "CAST(size(filter(split(trim(text), ' '), w -> w != '')) AS LONG) AS nt",
        "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = rows.groupBy(_._1).map { case (src, ds) =>
      val sorted = ds.sortBy(d => (d._2, d._3)).map(_._2)
      val n = sorted.size
      val s0 = sorted.sum
      val s1 = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val gini = BigDecimal(2.0 * s1 / (n.toLong * s0).toDouble - (n + 1).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val top = sorted.takeRight(n / 10).sum
      val share = BigDecimal(top.toDouble / s0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      src -> ((n.toLong, s0, gini, share))
    }
    val got = operators.Curation.tokenGini(docs).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (n, s0, gini, share) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
        === ((n, s0, gini, share)), s"source ${r.getString(0)}")
    }
  }
}
