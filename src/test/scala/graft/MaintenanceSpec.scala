package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-maintenance operators (q124/q125/q129). The
  * planted-data discipline: q124's derived snapshot and q125's planted
  * noise are pure functions of (doc_id, text), so the expected result is
  * computable locally over the collected fixture rows and compared
  * set-for-set against the distributed answer. */
class MaintenanceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import operators.Maintenance

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q124 snapshot diff matches the locally computed changeset") {
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val expected = scala.collection.mutable.Map[Long, String]()
    docs.foreach { case (id, text) =>
      val removed = md5hex(text).startsWith("f")
      val edited = id % 7 == 0
      if (removed) expected(id) = "removed"
      else if (edited) expected(id) = "changed" // ' rev2' always changes the digest
      if (id % 13 == 0) expected(id + 1000000L) = "added"
    }

    val got = SparkEntry.all("q124_snapshot_diff").fn(spark, sf001)
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected.toMap)
  }

  test("q139 fuzzy diff attributes edits and near-copies, and leaves novel docs unmatched") {
    import spark.implicits._
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val tA = words("alpha", 12); val tB = words("beta", 12)
    val old = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    val nw = Seq(
      (1L, tA + " edited"),        // changed: near-dup of old self
      (2L, tB),                    // unchanged: absent from output
      (3L, tB + " mirrored"),      // added: near-copy of doc 2
      (4L, words("gamma", 12)))    // added: genuinely novel, no match
      .toDF("doc_id", "text")
    val got = operators.Maintenance.snapshotFuzzyDiff(old, nw).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)),
        Option(r.get(3)), r.getBoolean(4))).toMap
    assert(got.keySet === Set(1L, 3L, 4L))
    // doc 1: 12 words → 5 shingles; +1 word → 6; intersection 5 →
    // jaccard 5/(5+6-5) = 5/6
    assert(got(1L)._1 === "changed" && got(1L)._2 === Some(1L) && got(1L)._4)
    assert(got(1L)._3 === Some(BigDecimal(5.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(3L)._1 === "added" && got(3L)._2 === Some(2L) && got(3L)._4,
      s"near-copy attributes to its source: ${got(3L)}")
    assert(got(4L) === (("added", None, None, false)), "novel doc unmatched")
  }

  test("q139 on real data: every derived 'added' doc attributes to its source doc") {
    // the derived snapshot's additions are source docs with ' new'
    // appended at doc_id + 1000000 — attribution must find the original
    val full = SparkEntry.all("q139_snapshot_fuzzy_diff").fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    val added = full.filter(r => r._1 >= 1000000L)
    assert(added.nonEmpty)
    added.foreach { case (id, st, best, near) =>
      assert(st === "added" && best === Some(id - 1000000L) && near,
        s"derived copy $id must attribute to ${id - 1000000L}: got $best")
    }
  }

  test("q143 drift: identical source pins KL to zero; a word flood is detected and attributed") {
    import spark.implicits._
    val stable = "alpha beta gamma alpha beta"
    val oldDf = Seq(("s1", stable), ("s2", "one two three four five"))
      .toDF("source", "text")
    val newDf = Seq(("s1", stable),
      ("s2", "one two three four five " + Seq.fill(20)("spam").mkString(" ")))
      .toDF("source", "text")
    val got = operators.Maintenance.snapshotDrift(oldDf, newDf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))).toMap
    // identical distributions: every contribution is round(p·ln(1), 9) = 0
    assert(got("s1") === ((5L, 5L, 3L, 0.0, got("s1")._5)))
    // flooded source: positive drift, attributed to the flooded word
    val (na, nb, v, kl, topw) = got("s2")
    assert(na === 5L && nb === 25L && v === 6L)
    assert(topw === "spam", s"drift must attribute the flood: $topw")
    // local reference on the same rounded contract
    val counts = Seq(("one", 1, 1), ("two", 1, 1), ("three", 1, 1),
      ("four", 1, 1), ("five", 1, 1), ("spam", 0, 20))
    val expected = counts.map { case (_, ca, cb) =>
      val pB = (cb + 0.5) / (25 + 6 * 0.5)
      val pA = (ca + 0.5) / (5 + 6 * 0.5)
      BigDecimal(pB * math.log(pB / pA)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(kl === BigDecimal(expected.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q124 generic face covers all four statuses on an in-memory pair") {
    val s = spark; import s.implicits._
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newDf = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "text")
    val got = Maintenance.snapshotDiff(oldDf, newDf)
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("q125 cleaned text round-trips to the original for every doc") {
    val rows = SparkEntry.all("q125_normalize_text").fn(spark, sf001)
      .join(Tables.documents(spark, sf001).select("doc_id", "text"), "doc_id")
      .select(col("roundtrip"), (col("clean") === col("text")).as("eq"),
        (col("n_chars_noisy") >= col("n_chars_clean")).as("grew"),
        (col("n_chars_noisy") > col("n_chars_clean")).as("strictly"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(0)), "roundtrip column must be all true")
    assert(rows.forall(_.getBoolean(1)), "clean must equal the original text")
    assert(rows.forall(_.getBoolean(2)), "normalization never lengthens")
    assert(rows.exists(_.getBoolean(3)), "planted noise must be present somewhere")
  }

  test("q125 normalizeText handles edge shapes") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("  a  b  ", "a b"),
      ("\t\tx\u0000y\r\n", "xy"),
      ("\u0007\u000B\u000C", ""),
      ("one two", "one two")).toDF("in", "want")
    val bad = df.select(Maintenance.normalizeText(col("in")).as("got"), col("want"))
      .filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("q129 per-source diversity matches a locally computed profile") {
    val docs = Tables.documents(spark, sf001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val bySource = docs.groupBy(_._1)
    val expected = bySource.map { case (src, rows) =>
      val toks = rows.map(_._2.trim.split(" ").filter(_.nonEmpty).toSeq)
      val uni = toks.flatten
      val big = toks.filter(_.size >= 2).flatMap(ws => ws.sliding(2).map(_.mkString(" ")))
      (src, (uni.size.toLong, uni.distinct.size.toLong,
        big.size.toLong, big.distinct.size.toLong))
    }
    val got = SparkEntry.all("q129_source_diversity").fn(spark, sf001).collect()
      .map { r: Row => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))) }.toMap
    assert(got === expected)
    // ratio columns derive exactly from the counts
    SparkEntry.all("q129_source_diversity").fn(spark, sf001).collect().foreach { r =>
      assert(r.getDouble(3) ==
        BigDecimal(r.getLong(2).toDouble / r.getLong(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
