package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keyset pagination (q85) vs the exact-offset window form (q11): same
  * pages, opposite scale profile — the seek form must stay window-free
  * and single-partition-exchange-free. */
class PaginationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def orders = Tables.orders(spark, sf001)
    .select("o_orderkey", "o_orderdate", "o_totalprice")
  private val orderCols = Seq("o_orderdate", "o_orderkey")

  test("keyset page equals the offset-window page after the same anchor row") {
    // q11's contract: rows 101..150 in (o_orderdate, o_orderkey) order.
    // Seek equivalent: the 50 rows after row 100's key.
    val sorted = orders.orderBy("o_orderdate", "o_orderkey").collect()
    val anchor = sorted(99) // row 100 (0-indexed)
    val expected = sorted.slice(100, 150).map(r => (r.getLong(0))).toSeq
    val page = Relational.keysetPage(orders, orderCols,
        Some(Seq(lit(anchor.getAs[java.time.LocalDateTime](1)), lit(anchor.getLong(0)))), 50)
      .collect().map(_.getLong(0)).toSeq
    assert(page == expected, "seek page must equal the window page")
  }

  test("iterating keyset pages visits the whole table exactly once, in order") {
    val total = orders.count()
    var lastKey: Option[Seq[org.apache.spark.sql.Column]] = None
    var seen = Vector.empty[Long]
    var pages = 0
    var done = false
    while (!done) {
      val rows = Relational.keysetPage(orders, orderCols, lastKey, 400).collect()
      pages += 1
      if (rows.isEmpty) done = true
      else {
        seen ++= rows.map(_.getLong(0))
        val last = rows.last
        lastKey = Some(Seq(lit(last.getAs[java.time.LocalDateTime](1)), lit(last.getLong(0))))
        if (rows.length < 400) done = true
      }
      assert(pages < 100, "runaway pagination loop")
    }
    assert(seen.length == total, s"visited ${seen.length} of $total rows")
    assert(seen.distinct.length == seen.length, "no row visited twice")
    val expected = orders.orderBy("o_orderdate", "o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    assert(seen == expected, "pages concatenate to the global order")
  }

  test("keyset pagination survives NULL order keys (nulls-first, no silent loss)") {
    import spark.implicits._
    // leading key NULL for more than a page of rows: a null-rejecting
    // seek predicate would end pagination after page 1 and silently lose
    // the rest of the table
    val rows = (0L until 7L).map(i => (None: Option[Long], i)) ++
      (7L until 12L).map(i => (Some(i), i))
    val df = rows.toDF("k1", "k2")
    val expected = df.orderBy("k1", "k2").select("k2").as[Long].collect().toSeq
    var lastKey: Option[Seq[org.apache.spark.sql.Column]] = None
    var walked = Vector.empty[Long]
    var done = false
    var guard = 0
    while (!done && guard < 50) {
      guard += 1
      val page = Relational.keysetPage(df, Seq("k1", "k2"), lastKey, 3).collect()
      if (page.isEmpty) done = true
      else {
        walked ++= page.map(_.getLong(1))
        val last = page.last
        lastKey = Some(Seq(
          if (last.isNullAt(0)) lit(null).cast("long") else lit(last.getLong(0)),
          lit(last.getLong(1))))
        if (page.length < 3) done = true
      }
    }
    assert(walked == expected,
      s"null keys must paginate without loss: walked=$walked expected=$expected")
  }

  test("q85 plan: no Window, no single-partition exchange, distributed top-k, pushed seek") {
    val df = SparkEntry.all("q85_keyset_pagination").fn(spark, sf001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), s"q85 must not window:\n$p")
    assert(!p.contains("SinglePartition"), s"q85 must not funnel to one partition:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q85 must distributed-top-k:\n$p")
    // the leading-column seek predicate reaches the parquet scan
    assert(p.contains("PushedFilters: [Or(GreaterThan(o_orderdate"),
      s"seek predicate not pushed:\n$p")
    // contrast pin: q11's exact-offset form DOES have the global window —
    // the documented trade the seek form exists to avoid
    val p11 = SparkEntry.all("q11_pagination").fn(spark, sf001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p11.contains("Window"), "q11 is the window form by design")
  }
}
