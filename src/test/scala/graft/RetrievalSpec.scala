package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // doc 0 is the query: it shares the rare term "zebra" with doc 1 and
  // only ubiquitous terms with docs 2-4
  private lazy val corpus = Seq(
    (0L, "zebra stripes in the wild savanna"),
    (1L, "a zebra crossing the dusty savanna plain today"),
    (2L, "the market opened in the morning with the usual crowd"),
    (3L, "in the beginning the team built the parser in the lab"),
    (4L, "wild horses run across the open plain")
  ).toDF("doc_id", "text")

  test("bm25 ranks the rare-term match above common-term overlap") {
    val got = Retrieval.bm25TopK(corpus, col("doc_id") === 0, k = 4)
      .orderBy("rank")
      .select("doc_id", "bm25", "rank").as[(Long, Double, Long)].collect()
    assert(got.head._1 == 1L,
      s"doc 1 (shares 'zebra' + 'savanna') must rank first: ${got.toSeq}")
    assert(got.map(_._3).toSeq == (1L to got.length), "ranks contiguous from 1")
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq,
      "scores non-increasing by rank")
    // query doc never scores itself
    assert(!got.map(_._1).contains(0L))
  }

  test("bm25 equals an in-Scala brute-force scorer exactly (rounded contract)") {
    val texts = corpus.as[(Long, String)].collect().toMap
    def toks(s: String) = s.trim.split(" ").filter(_.nonEmpty).toSeq
    val n = texts.size
    val dls = texts.map { case (id, t) => id -> toks(t).size }
    val avgdl = dls.values.sum.toDouble / n
    val dfm = texts.values.flatMap(t => toks(t).distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val (k1, b) = (1.2, 0.75)
    def score(qid: Long, did: Long): BigDecimal = {
      val qTerms = toks(texts(qid)).distinct
      val tfs = toks(texts(did)).groupBy(identity).map { case (t, xs) => t -> xs.size }
      qTerms.flatMap { t =>
        tfs.get(t).map { tf =>
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          val part = tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * dls(did) / avgdl))
          BigDecimal(idf * part).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
    }
    val expected = (1L to 4L).flatMap { did =>
      val s = score(0L, did)
      if (s > 0) Some(did -> s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) else None
    }.toMap
    val got = Retrieval.bm25TopK(corpus, col("doc_id") === 0, k = 10)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("persisted postings probe equals the one-shot form, stats self-contained from the index") {
    // empty doc proves stats derive from the INDEX (Lucene convention):
    // a doc with no tokens has no postings, contributes to nothing, and
    // both faces must agree on n_docs/avgdl without seeing it
    val docs = corpus.unionByName(Seq((9L, "   ")).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.bm25Postings(docs).write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val q = docs.filter(col("doc_id") === 0)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(expr("filter(split(trim(text), ' '), w -> w != '')"))).as("term"))
    val viaIndex = Retrieval.bm25TopKAgainst(persisted, q, k = 4)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    val oneShot = Retrieval.bm25TopK(docs, col("doc_id") === 0, k = 4)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    assert(viaIndex == oneShot, s"index probe drifted: $viaIndex vs $oneShot")
    // the probe plan must scan the persisted index, never documents:
    // its only scans are parquet reads of the index path
    val plan = Retrieval.bm25TopKAgainst(persisted, q, k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents"), "probe re-read the corpus")
  }

  test("rrf fusion: both-list docs outrank single-list docs at comparable ranks") {
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("qid", "doc_id", "rank")
    val sem = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("qid", "doc_id", "rank")
    val got = Retrieval.rrfFusion(lex, sem, k = 10)
      .orderBy("rank")
      .select("doc_id", "rrf", "rank").as[(Long, Double, Long)].collect()
    // doc 11 appears in both lists (1/62 + 1/61) and must rank first,
    // above the lexical #1 (1/61 alone)
    assert(got.head._1 == 11L, s"fused winner wrong: ${got.toSeq}")
    assert(got.map(_._1).toSet == Set(10L, 11L, 12L, 13L),
      "full outer fusion keeps single-list docs")
    val expected11 = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._2 == expected11, s"rrf score drift: ${got.head._2}")
    assert(got.map(_._3).toSeq == (1L to 4L), "ranks contiguous")
  }

  test("ANN hybrid retrieval agrees with the exact-cosine hybrid at a measured floor") {
    val docs = Tables.documents(spark, sf001)
    val emb = Tables.embeddings(spark, sf001)
    val exactHybrid = SparkEntry.all("q86_hybrid_retrieval_rrf").fn(spark, sf001)
      .select("qid", "doc_id").as[(Long, Long)].collect().toSet
    val annHybrid = Retrieval.hybridRetrievalAnn(docs, emb, nQueries = 10, k = 10)
      .select("qid", "doc_id").as[(Long, Long)].collect().toSet
    val overlap = exactHybrid.count(annHybrid.contains).toDouble / exactHybrid.size
    // the lexical half is identical; only ANN recall on the semantic half
    // moves the fused list. Measured 0.96 at sf0.001 (16 bands / 2
    // probes); gate at 0.85.
    assert(overlap >= 0.85, s"ANN hybrid overlap $overlap below 0.85")
    assert(annHybrid.groupBy(_._1).forall(_._2.size <= 10))
  }

  test("bm25 on real testdata: k respected per query, deterministic across runs") {
    val docs = Tables.documents(spark, sf001)
    val a = Retrieval.bm25TopK(docs, col("doc_id") < 10, k = 10)
      .orderBy("qid", "rank").collect()
    val perQ = a.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 10), s"k=10 exceeded: $perQ")
    assert(perQ.nonEmpty)
    val b = Retrieval.bm25TopK(docs, col("doc_id") < 10, k = 10)
      .orderBy("qid", "rank").collect()
    assert(a.toSeq == b.toSeq, "decimal-sum contract must be run-deterministic")
  }

  test("q150 self-eval: disjoint-vocabulary corpus retrieves every original at rank 1") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // every doc speaks its own vocabulary — an edited copy can only
    // match its original, so recall@1 and MRR must be exactly 1
    val texts = (0L to 13L).map(i => i -> (1 to 10).map(j => s"u${i}w$j").mkString(" "))
    val docs = texts.toDF("doc_id", "text")
    val expectedQ = texts.count { case (i, t) =>
      i % 7 == 0 && !md5hex(t).startsWith("f")
    }
    val r = Retrieval.retrievalSelfEval(docs).collect().head
    assert(r.getLong(0) === expectedQ.toLong && expectedQ >= 1)
    assert(r.getLong(1) === expectedQ.toLong, "every query hits at rank 1")
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0)
  }

  test("dense BM25 face equals the postings face row for row on sf0.001") {
    // the q51/q78 two-face contract: same scores, same ranks, different
    // join geometry (postings probe vs dense scaled-integer dot product)
    val docs = Tables.documents(spark, sf001)
    val qTerms = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("qid"),
        explode(array_distinct(expr("filter(split(trim(text), ' '), w -> w != '')")))
          .as("term"))
    val postings = Retrieval.bm25Postings(docs)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "doc_id", "bm25", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val viaPostings = canon(Retrieval.bm25TopKAgainst(postings, qTerms, k = 10))
    val viaDense = canon(Retrieval.bm25TopKDense(postings, qTerms, k = 10))
    assert(viaDense.length === viaPostings.length)
    assert(viaDense.toSeq === viaPostings.toSeq)
  }

  test("q150 self-eval: an empty query set degrades to null rates, not an error") {
    import spark.implicits._
    // no doc_id divisible by 7 → zero queries; counts are 0 and every
    // rate is NULL (the nullif guard), never a division blow-up
    val docs = (1L to 6L).map(i => (i, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val r = Retrieval.retrievalSelfEval(docs).collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L && r.getLong(2) === 0L)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }
}
