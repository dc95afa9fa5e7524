package graft

import graft.operators.Wordpiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece quality gates: a from-scratch plain-Scala reference
  * (likelihood-scored merges with `##` continuation markers, greedy
  * longest-match runtime) checked merge-for-merge and
  * fertility-for-fertility against the distributed implementation on
  * real fixture text — the q102/q108 "two independent faces must agree"
  * discipline applied to the third tokenizer family. */
class WordpieceSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // ---------- plain-Scala reference implementation ----------

  /** UTF-8 byte-order comparison — how Spark and DuckDB order strings. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val (xa, ya) = (x(i) & 0xff, y(i) & 0xff)
      if (xa != ya) return xa < ya
      i += 1
    }
    x.length < y.length
  }

  private def initUnits(w: String): Vector[String] =
    w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c
    }.toVector

  /** Reference trainer: returns the merge table (rank, l, r, pairCount,
    * score rounded to 9) exactly as the operator emits it. */
  private def referenceTrain(
      texts: Seq[String], nMerges: Int): Seq[(Long, String, String, Long, Double)] = {
    val wc = texts.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[Vector[String], Long] =
      wc.toSeq.map { case (w, c) => initUnits(w) -> c }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = Seq.newBuilder[(Long, String, String, Long, Double)]
    (1 to nMerges).foreach { k =>
      val pairCounts = vocab.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val symCounts = vocab.toSeq.flatMap { case (syms, c) => syms.map(_ -> c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.nonEmpty) {
        val scored = pairCounts.toSeq.map { case ((l, r), pc) =>
          (l, r, pc, pc.toDouble / (symCounts(l).toDouble * symCounts(r).toDouble))
        }
        val best = scored.sortWith { case ((l1, r1, c1, s1), (l2, r2, c2, s2)) =>
          if (s1 != s2) s1 > s2
          else if (c1 != c2) c1 > c2
          else if (l1 != l2) utf8Lt(l1, l2)
          else utf8Lt(r1, r2)
        }.head
        val (l, r, pc, sc) = best
        out += ((k.toLong, l, r, pc,
          BigDecimal(sc).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
        val merged = l + r.stripPrefix("##")
        vocab = vocab.toSeq.map { case (syms, c) =>
          val b = Vector.newBuilder[String]
          var acc = Vector.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc = acc.init :+ merged
            else acc = acc :+ x
          }
          acc -> c
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.result()
  }

  private def referenceVocab(texts: Seq[String],
      merges: Seq[(Long, String, String, Long, Double)]): Set[String] = {
    val units = texts.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .flatMap(initUnits).toSet
    units ++ merges.map { case (_, l, r, _, _) => l + r.stripPrefix("##") }
  }

  /** Reference greedy longest-match runtime (BERT semantics). */
  private def referenceTokenize(w: String, vocab: Set[String]): Seq[String] = {
    var pos = 0
    val ps = Seq.newBuilder[String]
    while (pos < w.length) {
      val cands = (math.min(64, w.length - pos) to 1 by -1).iterator.map { len =>
        if (pos == 0) w.substring(0, len)
        else "##" + w.substring(pos, pos + len)
      }.find(vocab.contains)
      cands match {
        case None => return Seq("[UNK]")
        case Some(m) =>
          ps += m
          pos += m.stripPrefix("##").length
      }
    }
    ps.result()
  }

  // ---------- tests ----------

  test("distributed WordPiece training equals the plain-Scala reference " +
      "merge-for-merge on real fixture text") {
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 20)
      .select("doc_id", "text")
    val texts = docs.select("text").as[String].collect().toSeq
    val ref = referenceTrain(texts, nMerges = 30)
    val table = Wordpiece.wordpieceTrainMerges(docs, nMerges = 30)
    val got = table.as[(Long, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(got == ref,
      s"merge tables disagree:\n got=${got.take(6)}\n ref=${ref.take(6)}")
    Barriers.release(table)
  }

  test("WordPiece scores likelihood, not frequency: a high-PMI pair beats a " +
      "higher-frequency low-PMI pair") {
    // "xq" always co-occur (c=4, c(x)=c(##q)=4 -> score 0.25);
    // "ab" is more frequent but both symbols are common elsewhere
    // (c=6, c(a)=12, c(##b)=6 -> score 0.083)
    val docs = Seq(
      (1L, "xq xq xq xq"),
      (2L, "ab ab ab ab ab ab ac ac ac ac ac ac")
    ).toDF("doc_id", "text")
    val table = Wordpiece.wordpieceTrainMerges(docs, nMerges = 1)
    val got = table.as[(Long, String, String, Long, Double)].collect().head
    assert((got._2, got._3) == (("x", "##q")),
      s"first merge must be the high-PMI pair, got $got")
    // BPE on the same corpus merges the most FREQUENT pair instead
    val bpe = operators.Curation.bpeTrainMerges(docs, nMerges = 1)
      .as[(Long, String, String, Long)].collect().head
    assert((bpe._2, bpe._3) == (("a", "b")) || (bpe._2, bpe._3) == (("a", "c")),
      s"fixture drifted: BPE should pick a frequency winner, got $bpe")
    Barriers.release(table)
  }

  test("greedy tokenize matches the reference per word; pieces reconstruct; " +
      "runtime can differ from the training segmentation") {
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 20)
      .select("doc_id", "text")
    val texts = docs.select("text").as[String].collect().toSeq
    val merges = referenceTrain(texts, nMerges = 30)
    val vocab = referenceVocab(texts, merges)

    val table = Wordpiece.wordpieceTrainMerges(docs, nMerges = 30)
    val vocabDf = Wordpiece.wordpieceVocab(docs, table)
    assert(vocabDf.as[String].collect().toSet == vocab, "vocab sets disagree")

    val distinctWords = docs
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val seg = Wordpiece.segmented(vocabDf, distinctWords)
      .as[(String, Seq[String])].collect().toSeq
    assert(seg.nonEmpty)
    seg.foreach { case (w, ps) =>
      assert(ps == referenceTokenize(w, vocab), s"'$w': $ps")
      assert(ps == Seq("[UNK]") ||
        ps.map(_.stripPrefix("##")).mkString("") == w,
        s"pieces don't reconstruct '$w': $ps")
    }

    // fertility face equals the reference aggregation
    val gotFert = Wordpiece.wordpieceTokenize(docs, table)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val refDocs = docs.as[(Long, String)].collect().sortBy(_._1).toSeq.map {
      case (id, t) =>
        val ws = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val pieces = ws.map(referenceTokenize(_, vocab))
        val np = pieces.map(_.size).sum.toLong
        val unk = pieces.count(_ == Seq("[UNK]")).toLong
        (id, ws.size.toLong, np, unk,
          BigDecimal(np.toDouble / ws.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._2 > 0)
    assert(gotFert == refDocs,
      s"fertility disagrees:\n got=${gotFert.take(5)}\n ref=${refDocs.take(5)}")
    Barriers.release(table)
  }

  test("unknown characters produce [UNK] for the whole word, not a crash") {
    val train = Seq((1L, "abc abc def")).toDF("doc_id", "text")
    val table = Wordpiece.wordpieceTrainMerges(train, nMerges = 5)
    val vocabDf = Wordpiece.wordpieceVocab(train, table)
    // 'z' never appears in training; 'abz' must collapse to [UNK] even
    // though 'ab' matches greedily first
    val seg = Wordpiece.segmented(vocabDf,
      Seq("abz", "abc", "zzz").toDF("w"))
      .as[(String, Seq[String])].collect().toMap
    assert(seg("abz") == Seq("[UNK]"), seg("abz"))
    assert(seg("zzz") == Seq("[UNK]"), seg("zzz"))
    assert(seg("abc").map(_.stripPrefix("##")).mkString("") == "abc")
    Barriers.release(table)
  }
}
