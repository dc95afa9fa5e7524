package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the market-basket affinity operator (q152): planted baskets
  * with hand-computed lift, duplicate-line collapse, and the hot-basket
  * guard. */
class AffinitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import operators.Affinity

  private def li(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  test("q152 lift: hand-computed support/lift; duplicate lines count once") {
    // baskets: o1{1,2,3} o2{1,2} o3{1,2} o4{3,4} o5{3,4}; o2 carries a
    // DUPLICATE (o2, 1) line which must collapse before pairing
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L), (4L, 4L),
      (5L, 3L), (5L, 4L))
    val got = Affinity.basketLift(li(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // (1,2): 3 baskets of 5, items 1 and 2 in 3 each → lift 15/9
    // (3,4): 2 baskets, item 3 in 3, item 4 in 2 → lift 10/6
    // (1,3)/(2,3): support 1 < 2 — pruned
    assert(got.toSeq === Seq(
      (1L, 2L, 3L, 3L, 3L, 0.6, 1.666667),
      (3L, 4L, 2L, 3L, 2L, 0.4, 1.666667)))
  }

  test("q152 guard: baskets over maxBasket distinct items are excluded entirely") {
    val rows = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      // hot basket: 4 distinct items > maxBasket=3 — none of its pairs
      // may appear, and it must not count toward n_orders or item counts
      (9L, 1L), (9L, 2L), (9L, 7L), (9L, 8L))
    val got = Affinity.basketLift(li(rows), maxBasket = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(6)))
    // only o1/o2 survive: pair (1,2) in 2 of 2 baskets, lift = 2·2/(2·2) = 1
    assert(got.toSeq === Seq((1L, 2L, 2L, 1.0)))
    assert(!got.exists(r => r._1 > 2 || r._2 > 2), "hot-basket pairs leaked")
  }

  test("q185 session affinity: the inactivity gap splits baskets before pairing") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s"2024-01-$s")
    // u1 morning session {A,B}; u1 EVENING session {A,C} (gap > 30 min
    // splits them — one unsplit basket would pair B with C); u2 {A,B}
    val ev = Seq(
      (1L, 1L, "A", ts("01 09:00:00")), (2L, 1L, "B", ts("01 09:10:00")),
      (3L, 1L, "A", ts("01 18:00:00")), (4L, 1L, "C", ts("01 18:05:00")),
      (5L, 2L, "A", ts("02 09:00:00")), (6L, 2L, "B", ts("02 09:01:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Affinity.sessionTypeAffinity(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(6)))
    // 3 sessions; only (A,B) reaches support 2: lift = 2·3/(3·2) = 1
    assert(got.toSeq === Seq(("A", "B", 2L, 1.0)))
  }

  test("q152 top-k cut is a total order (lift desc, then part keys)") {
    // two pairs with IDENTICAL lift — the key tie-break decides the cut
    val rows = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L),
      (4L, 3L), (4L, 4L))
    val got = Affinity.basketLift(li(rows), topK = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
