package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the text-analysis operators beyond oracle parity —
  * the oracle proves both engines agree; these prove the answers are
  * USEFUL on real-language text (the synthetic corpus's `lang` column is
  * random metadata over English-ish tokens, so accuracy is only testable
  * on planted sentences). */
class TextAnalysisSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("char-trigram language ID identifies planted sentences with confidence") {
    val docs = Seq(
      (1L, "en", "the quick brown fox and the lazy dog are running through the woods of england"),
      (2L, "de", "der schnelle braune fuchs und der faule hund laufen durch dichte deutsche wälder"),
      (3L, "es", "el rápido zorro marrón y el perro perezoso corren por los bosques que quedan lejos"),
      (4L, "fr", "le renard brun rapide et le chien paresseux courent dans les forêts de france une belle journée"),
      (5L, "und", "zzz qqq 12345")
    ).toDF("doc_id", "declared_lang", "text")
    val out = TextAnalysis.langIdNgram(docs)
      .select("doc_id", "predicted_lang", "confidence")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L)._1 == "en", s"got $byId")
    assert(byId(2L)._1 == "de", s"got $byId")
    assert(byId(3L)._1 == "es", s"got $byId")
    assert(byId(4L)._1 == "fr", s"got $byId")
    assert(byId(5L)._1 == "und" && byId(5L)._2 == 0.0, s"got $byId")
    // identified languages must be confident, not coin-flips
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(byId(id)._2 >= 0.5, s"doc $id confidence ${byId(id)._2} < 0.5")
    }
  }

  test("language ID is shuffle-free: no exchange in the plan") {
    val docs = Seq((1L, "en", "the dog")).toDF("doc_id", "declared_lang", "text")
    val plan = TextAnalysis.langIdNgram(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"langIdNgram must stream at scan speed:\n$plan")
  }

  test("short and empty texts yield und with zero confidence, not errors") {
    val docs = Seq((1L, "en", ""), (2L, "en", "ab"), (3L, "en", "of "))
      .toDF("doc_id", "declared_lang", "text")
    val out = TextAnalysis.langIdNgram(docs)
      .select("doc_id", "predicted_lang", "confidence")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "und", 0.0)))
    assert(out(1) == ((2L, "und", 0.0)))
    assert(out(2) == ((3L, "en", 1.0)), "a single profile trigram is a full-confidence hit")
  }

  test("wide profiles classify planted pt/it/nl text correctly") {
    val docs = Seq(
      (1L, "pt", "não sei se uma canção dos meus amigos vai parar as ações"),
      (2L, "it", "che cosa vuoi di bello dalla vita degli amici per la sera"),
      (3L, "nl", "een verhaal van het meisje dat altijd naar de overkant keek"),
      (4L, "en", "the quick brown fox jumps over the lazy dog and runs off"),
      (5L, "de", "ich dachte dass das ein schönes geschenk für die kinder war"))
      .toDF("doc_id", "declared_lang", "text")
    val out = TextAnalysis.langIdNgramOver(docs, TextAnalysis.langProfilesWide)
      .select("doc_id", "declared_lang", "predicted_lang", "confidence")
      .as[(Long, String, String, Double)].collect().sortBy(_._1)
    out.foreach { case (id, declared, predicted, conf) =>
      assert(predicted == declared, s"doc $id: predicted $predicted, wanted $declared")
      assert(conf > 0.0 && conf <= 1.0)
    }
  }

  test("confidence calibrates: monolingual text scores above mixed text") {
    val docs = Seq(
      (1L, "en", "the thing and the other thing of the same kind going along"),
      // half the trigram mass deliberately feeds the es profile
      (2L, "en", "the thing que el hombre la casa los perros and the kind"))
      .toDF("doc_id", "declared_lang", "text")
    val out = TextAnalysis.langIdNgramOver(docs, TextAnalysis.langProfilesWide)
      .select("doc_id", "predicted_lang", "confidence")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out(0)._2 == "en" && out(1)._2 == "en")
    assert(out(0)._3 > out(1)._3,
      s"clean text must out-score mixed text: ${out.toSeq}")
  }

  test("native trigram-hits expression matches the declarative trigram form") {
    // brute-force reference: enumerate substring(t, i, 3) trigrams and
    // count membership per profile — the exact semantics the oracle SQL
    // encodes, including overlapping occurrences and shared grams
    val profiles = Seq(
      "aa" -> Seq("aaa", "ría", "th "),
      "bb" -> Seq("aaa", "bbb", " ñx"))
    val texts = Seq(
      "aaaaa",              // overlapping "aaa" x3, counts for BOTH langs
      "maría cantaría",     // unicode 'í' inside a gram
      "th th th ",          // "th " x3
      "xy",                 // shorter than a trigram -> all zero
      "",                   // empty
      "b ñxq ñx")           // unicode ñ gram x2
    graft.functions.TextExpressions.register(spark)
    val spec = graft.functions.TextExpressions.encodeProfiles(profiles)
    val got = texts.toDF("text")
      .select(expr(s"graft_trigram_hits(text, '$spec')").as("h"))
      .as[Seq[Long]].collect()
    def brute(t: String, grams: Seq[String]): Long = {
      val cps = t.codePoints().toArray
      (0 to cps.length - 3).count { i =>
        grams.contains(new String(cps, i, 3))
      }.toLong
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = profiles.map { case (_, gs) => brute(t, gs) }
      assert(got(i) == want, s"text '$t': got ${got(i)}, want $want")
    }
    // null text -> null output (nullSafeEval contract)
    val nullOut = Seq[Option[String]](None).toDF("text")
      .select(expr(s"graft_trigram_hits(text, '$spec')").as("h"))
      .collect().head
    assert(nullOut.isNullAt(0))
    // registry guards: wrong arity and non-literal spec raise the
    // friendly message, not an internal error
    val e1 = intercept[Exception](spark.sql("SELECT graft_trigram_hits('x')"))
    assert(e1.getMessage.contains("graft_trigram_hits expects"))
    val e2 = intercept[Exception](
      Seq(("x", "y")).toDF("a", "b").selectExpr("graft_trigram_hits(a, b)").collect())
    assert(e2.getMessage.contains("graft_trigram_hits expects"))
  }

  test("native top-ngram-count matches brute force, handles edges, guards args") {
    graft.functions.TextExpressions.register(spark)
    val cases = Seq(
      ("a b a b a c", 2, 2L),  // "a b" x2
      ("a b a b a c", 3, 2L),  // "a b a" x2
      ("x x x x", 2, 3L),      // overlapping "x x" x3
      ("solo", 2, 0L),         // fewer tokens than n
      ("", 2, 0L),
      ("t1 t2 t3", 3, 1L))
    cases.foreach { case (text, n, want) =>
      val got = Seq(text).toDF("text")
        .selectExpr(s"graft_top_ngram_count(filter(split(trim(text), ' '), x -> x != ''), $n) AS c")
        .as[Long].head()
      assert(got == want, s"'$text' n=$n: got $got want $want")
    }
    val e = intercept[Exception](spark.sql("SELECT graft_top_ngram_count(array('a'))"))
    assert(e.getMessage.contains("graft_top_ngram_count expects"))
  }

  test("native overlap-count matches size(array_intersect) on random arrays with dupes") {
    graft.functions.TextExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    val rows = (0 until 200).map { i =>
      def arr() = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, arr(), arr())
    }
    // edge shapes: empty sides, identical arrays, disjoint arrays
    val edges = Seq(
      (1000L, Seq.empty[String], Seq("a", "b")),
      (1001L, Seq("a", "a", "b"), Seq("a", "b", "b", "c")),
      (1002L, Seq("x"), Seq("y")),
      // NULL elements are their own value, distinct from '' — common
      // iff present on both sides (array_intersect parity)
      (1003L, Seq(""), Seq(null.asInstanceOf[String])),
      (1004L, Seq(null.asInstanceOf[String], "a"), Seq(null.asInstanceOf[String], "b")),
      (1005L, Seq(null.asInstanceOf[String], null.asInstanceOf[String]), Seq(null.asInstanceOf[String])))
    import spark.implicits._
    val df = (rows ++ edges).toDF("id", "a", "b")
      .withColumn("native", expr("graft_overlap_count(a, b)"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
    val mismatch = df.filter(col("native") =!= col("builtin")).count()
    assert(mismatch == 0, "graft_overlap_count must equal size(array_intersect) everywhere")
    // arity/type guards fail analysis loudly, not at runtime
    intercept[Exception] { spark.sql("SELECT graft_overlap_count(array('a'))").collect() }
    intercept[Exception] { spark.sql("SELECT graft_overlap_count(array(1), array(2))").collect() }
  }

  test("wide language ID stays shuffle-free with 7 profiles") {
    val docs = Seq((1L, "en", "the dog")).toDF("doc_id", "declared_lang", "text")
    val plan = TextAnalysis.langIdNgramOver(docs, TextAnalysis.langProfilesWide)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"wide langId must stream at scan speed:\n$plan")
  }

  test("q167 percentile norm: hierarchical ranks match a per-source sort replay on sf0.001") {
    val docs = Tables.documents(spark, sf001)
    val quality = TextAnalysis.qualityPercentileNorm(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    // replay: plain per-source sort by (quality, doc_id)
    val bySource = quality.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      val n = rows.length
      val sorted = rows.sortBy(r => (r._3, r._1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 === i + 1L, s"$src doc ${r._1} rank")
        val exp = if (n == 1) 0.0
          else BigDecimal(i.toDouble / (n - 1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r._5 === exp, s"$src doc ${r._1} pct")
      }
    }
    assert(quality.nonEmpty)
  }

  test("q167 percentile norm: cross-source comparability on a planted skewed pair") {
    import spark.implicits._
    // source hi: three long clean docs; source lo: three short ones —
    // raw qualities don't overlap, percentiles align both to {0, .5, 1}
    val long = (1 to 30).map(_ => "the").mkString(" ")
    val docs = Seq(
      (1L, "hi", long + " alpha"), (2L, "hi", long + " beta gamma"),
      (3L, "hi", long + " d e f"),
      (4L, "lo", "x"), (5L, "lo", "x y"), (6L, "lo", "x y z"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.qualityPercentileNorm(docs).collect()
      .map(r => (r.getString(1), r.getDouble(4)))
    assert(got.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted.toSeq == Seq(0.0, 0.5, 1.0)
    }, s"both sources must span {0, 0.5, 1}: ${got.toSeq}")
  }

  test("q163 entropy: single-char flood → 0; planted strings match the decimal reference") {
    // reference replays the exact chain: integer char histogram,
    // n·ln(n) rounded to 9 before the sum, one final round to 6
    def ref(text: String): (Long, Long, Double) = {
      val counts = text.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = counts.values.sum
      val t = counts.values.map(c =>
        BigDecimal(c * math.log(c.toDouble)).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      val h = BigDecimal(math.log(n.toDouble) - t.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, counts.size.toLong, h)
    }
    val texts = Seq(
      (1L, "aaaa"),            // zero entropy
      (2L, "ab"),              // ln 2
      (3L, "a a"),             // the space is a character: {a:2, ' ':1}
      (4L, "the quick brown fox"))
    val docs = texts.toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === ref(t), s"doc $id '$t'")
    }
    assert(got(1L)._3 === 0.0)
    assert(got(2L)._3 === 0.693147)
  }

  test("q163 entropy: astral-plane characters count as ONE code point (the oracle's convention)") {
    import spark.implicits._
    // 😀 is U+1F600 — two UTF-16 units; a code-unit split would see
    // {highSurr: 2, lowSurr: 2, a: 2} (n=6, 3 distinct) instead of the
    // code-point histogram {😀: 2, a: 2} (n=4, 2 distinct, H = ln 2)
    val docs = Seq((1L, "😀😀aa")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs).collect().head
    assert(r.getLong(1) === 4L, s"n_chars must count code points: $r")
    assert(r.getLong(2) === 2L, s"distinct must be code points: $r")
    assert(r.getDouble(3) === 0.693147)
  }
}
