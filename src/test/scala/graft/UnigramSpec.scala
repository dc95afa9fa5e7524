package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent verification for the unigram-LM tokenizer (q108/q109):
  * DuckDB has no Viterbi, so — as with BPE — the distributed
  * implementation is checked against a from-scratch plain-Scala
  * hard-EM reference on real fixture text, piece-for-piece and
  * fertility-for-fertility, plus structural properties (reconstruction,
  * coverage) that hold regardless of the reference.
  */
class UnigramSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

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

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala reference: seed → `emRounds` hard-EM rounds → ranked
    * table, mirroring the documented semantics (NOT the implementation). */
  private def referenceUnigram(texts: Seq[String], vocabSize: Int,
      emRounds: Int): (Seq[(Int, String, Long, Double)], Map[String, Int]) = {
    val ws = texts.flatMap(t =>
      t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .split(" ").filter(_.nonEmpty))
    val wc: Map[String, Long] =
      ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }

    // seed: every substring occurrence of length 1..maxPieceLen
    val sub = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (i <- 0 until w.length;
           j <- (i + 1) to math.min(w.length, i + Unigram.maxPieceLen)) {
        val p = w.substring(i, j)
        sub(p) = sub.getOrElse(p, 0L) + c
      }
    }
    val chars = sub.filter(_._1.length == 1)
    val multi = sub.filter(_._1.length >= 2).toSeq
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else utf8Lt(p1, p2)
      }.take(vocabSize)
    var pieces: Map[String, Long] = (chars ++ multi).toMap

    def viterbi(w: String, lp: Map[String, Double]): Vector[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val bp = Array.fill(n + 1)(-1)
      best(0) = 0.0
      for (i <- 1 to n; j <- math.max(0, i - Unigram.maxPieceLen) until i) {
        val p = w.substring(j, i)
        val s: Option[Double] =
          if (i - j == 1) Some(best(j) + lp.getOrElse(p, Unigram.unkLogProb))
          else lp.get(p).map(best(j) + _)
        s.foreach { sc =>
          if (sc > best(i) || (sc == best(i) && j < bp(i))) {
            best(i) = sc; bp(i) = j
          }
        }
      }
      var i = n
      val out = Vector.newBuilder[String]
      val rev = scala.collection.mutable.ListBuffer.empty[String]
      while (i > 0) { rev.prepend(w.substring(bp(i), i)); i = bp(i) }
      out ++= rev
      out.result()
    }

    def logProbs(ps: Map[String, Long]): Map[String, Double] = {
      val tot = ps.values.sum.toDouble
      ps.map { case (p, c) => p -> (math.log(c.toDouble) - math.log(tot)) }
    }

    var lastSeg = Map.empty[String, Vector[String]]
    for (_ <- 1 to emRounds) {
      val lp = logProbs(pieces)
      lastSeg = wc.keys.map(w => w -> viterbi(w, lp)).toMap
      val vcnt = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, c) =>
        lastSeg(w).foreach(p => vcnt(p) = vcnt.getOrElse(p, 0L) + c)
      }
      pieces = pieces.keys.flatMap { p =>
        val c = vcnt.getOrElse(p, 0L)
        val cnt = if (p.length == 1) math.max(c, 1L) else c
        if (cnt > 0) Some(p -> cnt) else None
      }.toMap
    }
    val tot = pieces.values.sum.toDouble
    val ranked = pieces.toSeq
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else utf8Lt(p1, p2)
      }
      .zipWithIndex
      .map { case ((p, c), i) =>
        (i + 1, p, c, r9(math.log(c.toDouble) - math.log(tot)))
      }
    // fertility per word under the FINAL table (tokenize-face semantics)
    val lpF = logProbs(pieces)
    val fert = wc.keys.map(w => w -> viterbi(w, lpF).size).toMap
    (ranked, fert)
  }

  test("distributed unigram-LM training equals the plain-Scala reference " +
      "EM piece-for-piece on real fixture text") {
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 20)
      .select("doc_id", "text")
    val texts = docs.select("text").as[String].collect().toSeq

    val (refTable, refFert) = referenceUnigram(texts, vocabSize = 60, emRounds = 2)
    val table = Unigram.unigramTrain(docs, vocabSize = 60, emRounds = 2)
    val got = table.as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == refTable,
      s"piece tables disagree:\n got=${got.take(10)}\n ref=${refTable.take(10)}")

    // apply face: per-doc fertility must equal the reference segmentation
    val gotFert = Unigram.unigramTokenize(docs, table)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val wsOf = (t: String) => t.trim.split(" ").filter(_.nonEmpty).toSeq
    val refDocs = docs.as[(Long, String)].collect().sortBy(_._1).toSeq.map {
      case (id, t) =>
        val ws = wsOf(t)
        val np = ws.map(refFert).sum.toLong
        (id, ws.size.toLong, np,
          BigDecimal(np.toDouble / ws.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._2 > 0)
    assert(gotFert == refDocs,
      s"fertility disagrees:\n got=${gotFert.take(5)}\n ref=${refDocs.take(5)}")
    Barriers.release(table)
  }

  test("unigram segmentation reconstructs every word and only uses vocab pieces") {
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 50)
      .select("doc_id", "text")
    val table = Unigram.unigramTrain(docs, vocabSize = 60, emRounds = 2)
    val vocabPieces = table.select("piece").as[String].collect().toSet
    val seg = Unigram.segmented(
      docs.select(explode(split(trim(col("text")), " ")).as("w"))
        .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("wc")),
      Unigram.pieceLogProbs(table.select(col("piece"), col("cnt"))))
      .as[(String, Long, Seq[String])].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (w, _, ps) =>
      assert(ps.mkString("") == w, s"pieces don't reconstruct '$w': $ps")
      ps.foreach(p => assert(p.length == 1 || vocabPieces.contains(p),
        s"non-vocab multi-char piece '$p' for word '$w'"))
    }
    Barriers.release(table)
  }

  test("knife-edge gate: DP decision margins and the 9-dp logp boundary " +
      "distances clear the cross-engine ln() drift bound (sf0.001)") {
    // The q108/q109/q158 DuckDB replay's one drift source is libm ln vs
    // Math.log — measured REAL on this corpus's inputs (≤ 1.78e-15;
    // tools/ln_knife_edge.py proves the drifted-ln DP reproduces every
    // segmentation). This gates the Spark half so a code or corpus
    // change that moves a DP decision onto a knife edge fails HERE, not
    // as a driver-diff hash flip. Thresholds: margins ≥ 1e-7 (the ≤ 8
    // pieces × 2 ln calls × 1.78e-15 ≈ 2.8e-14 worst path drift ×
    // ~3e6 headroom; measured min 3.9e-3), logp boundary ≥ 1e-13
    // (measured 2.1e-12).
    val texts = Tables.documents(spark, sf001)
      .select("text").as[String].collect().toSeq
    val ws = texts.flatMap(_.split(" ").filter(_.nonEmpty))
    val wc = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val sub = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (i <- 0 until w.length;
           j <- (i + 1) to math.min(w.length, i + Unigram.maxPieceLen))
        sub(w.substring(i, j)) = sub.getOrElse(w.substring(i, j), 0L) + c
    }
    val chars = sub.filter(_._1.length == 1)
    val multi = sub.filter(_._1.length >= 2).toSeq
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else utf8Lt(p1, p2) }.take(60)
    var pieces: Map[String, Long] = (chars ++ multi).toMap
    var minMargin = Double.PositiveInfinity
    var ties = 0L
    def dpStats(w: String, lp: Map[String, Double]): Vector[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val bp = Array.fill(n + 1)(-1)
      best(0) = 0.0
      for (i <- 1 to n) {
        val cands = (math.max(0, i - Unigram.maxPieceLen) until i).flatMap { j =>
          val p = w.substring(j, i)
          val s = if (i - j == 1) Some(best(j) + lp.getOrElse(p, Unigram.unkLogProb))
                  else lp.get(p).map(best(j) + _)
          s.map((_, j))
        }
        val (bs, bj) = cands.maxBy { case (s, j) => (s, -j) }
        best(i) = bs; bp(i) = bj
        cands.filter(_._2 != bj).map(c => bs - c._1).sorted.headOption.foreach {
          g => if (g == 0.0) ties += 1 else minMargin = math.min(minMargin, g)
        }
      }
      var i = n
      val rev = scala.collection.mutable.ListBuffer.empty[String]
      while (i > 0) { rev.prepend(w.substring(bp(i), i)); i = bp(i) }
      rev.toVector
    }
    def logProbs(ps: Map[String, Long]): Map[String, Double] = {
      val tot = ps.values.sum.toDouble
      ps.map { case (p, c) => p -> (math.log(c.toDouble) - math.log(tot)) }
    }
    (1 to 2).foreach { _ =>
      val lp = logProbs(pieces)
      val vcnt = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, c) =>
        dpStats(w, lp).foreach(p => vcnt(p) = vcnt.getOrElse(p, 0L) + c)
      }
      pieces = pieces.keys.flatMap { p =>
        val c = vcnt.getOrElse(p, 0L)
        val cnt = if (p.length == 1) math.max(c, 1L) else c
        if (cnt > 0) Some(p -> cnt) else None
      }.toMap
    }
    val lpF = logProbs(pieces)
    wc.keys.foreach(dpStats(_, lpF))
    assert(minMargin >= 1e-7, s"a DP decision sits $minMargin from flipping")
    // exact ties are fine ONLY because the full drifted-ln replay
    // (tools/ln_knife_edge.py) proves they resolve identically; keep
    // them rare enough that that audit stays meaningful
    assert(ties <= 10, s"$ties exact DP ties — rerun tools/ln_knife_edge.py")
    val tot = pieces.values.sum.toDouble
    val minLogpDist = pieces.values.map { c =>
      val x = math.log(c.toDouble) - math.log(tot)
      val bd = new java.math.BigDecimal(x).abs
      val r = bd.setScale(9, java.math.RoundingMode.HALF_UP)
      new java.math.BigDecimal(java.math.BigInteger.valueOf(5), 10)
        .subtract(bd.subtract(r).abs).doubleValue
    }.min
    assert(minLogpDist >= 1e-13, s"a 9-dp logp sits $minLogpDist from a boundary")
  }

  test("EM strictly reduces or maintains total corpus description length") {
    // hard-EM on a fixed vocab cannot increase the Viterbi objective:
    // total corpus log-prob under round-k probs of round-k segmentations
    // is non-decreasing round over round. Probe via fertility: more EM
    // rounds must never produce a WORSE (higher-cost) segmentation under
    // the final model. Weak but implementation-independent.
    val docs = Tables.documents(spark, sf001).filter(col("doc_id") <= 20)
      .select("doc_id", "text")
    val t1 = Unigram.unigramTrain(docs, vocabSize = 60, emRounds = 1)
    val t2 = Unigram.unigramTrain(docs, vocabSize = 60, emRounds = 3)
    val f1 = Unigram.unigramTokenize(docs, t1)
      .agg(sum("n_pieces")).as[Long].collect().head
    val f2 = Unigram.unigramTokenize(docs, t2)
      .agg(sum("n_pieces")).as[Long].collect().head
    // more EM concentrates mass on used pieces; piece count stays stable
    // or shrinks on this corpus (pinned behavior, not a theorem)
    assert(f2 <= f1, s"3-round EM tokenizes worse than 1-round: $f2 > $f1")
    Barriers.release(t1); Barriers.release(t2)
  }
}
