package graft

import graft.operators.TemporalJoins
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join and binned range join: point-in-time semantics, tie-breaks,
  * staleness tolerance, bin-boundary correctness, and the plan shapes that
  * make them scale (single shuffle / equi-join, no nested loop). */
class TemporalJoinsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val left = Seq(
    (10L, 1L, t("2024-01-01 10:00:00"), 1.0),
    (11L, 1L, t("2024-01-01 12:00:00"), 2.0),
    (12L, 2L, t("2024-01-01 09:00:00"), 3.0), // before any right row
    (13L, 3L, t("2024-01-01 10:00:00"), 4.0)  // key with no right rows
  ).toDF("event_id", "user_id", "ts", "value")

  private val right = Seq(
    (100L, 1L, t("2024-01-01 09:30:00"), 10.0),
    (101L, 1L, t("2024-01-01 10:00:00"), 11.0), // ties left row 10 exactly
    (102L, 1L, t("2024-01-01 10:00:00"), 12.0), // same ts: larger id wins
    (103L, 1L, t("2024-01-01 11:59:00"), 13.0),
    (104L, 2L, t("2024-01-01 09:30:00"), 14.0)  // after left row 12
  ).toDF("event_id", "user_id", "ts", "value")

  private def asof(tol: Option[String] = None) =
    TemporalJoins.asofJoin(left, right, key = "user_id", ts = "ts",
      rightOrder = "event_id", rightPayload = Seq("event_id", "ts", "value"),
      prefix = "r_", tolerance = tol)

  test("as-of join: latest at-or-before, max-id tie-break, outer nulls") {
    val out = asof().select("event_id", "r_event_id", "r_value")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(out(0) == ((10L, Some(102L), Some(12.0))),
      "equal-ts right row matches (inclusive), larger event_id wins the tie")
    assert(out(1) == ((11L, Some(103L), Some(13.0))))
    assert(out(2) == ((12L, None, None)), "no right row at-or-before")
    assert(out(3) == ((13L, None, None)), "key absent from right side")
  }

  test("as-of join tolerance nulls out stale matches") {
    val out = asof(tol = Some("10 MINUTES"))
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0) == ((10L, Some(102L))), "0-age match survives")
    assert(out(1) == ((11L, Some(103L))), "1-minute-old match survives")
    assert(out(2) == ((12L, None)))
    val strict = asof(tol = Some("30 SECONDS"))
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(strict(1) == ((11L, None)), "1-minute-old match is too stale at 30s")
  }

  test("as-of join plans exactly one exchange (union + window, no join)") {
    val plan = asof().queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single shuffle by key:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  private val intervals = Seq(
    // [10:00, 10:10) — crosses the 10:05 bin boundary at 5-min bins
    (1L, 1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00")),
    (2L, 2L, t("2024-01-01 10:02:00"), t("2024-01-01 10:04:00"))
  ).toDF("iv_id", "user_id", "start_ts", "end_ts")

  private val points = Seq(
    (1L, t("2024-01-01 10:00:00"), 1.0),  // == start: inclusive
    (1L, t("2024-01-01 10:07:00"), 2.0),  // second bin of interval 1
    (1L, t("2024-01-01 10:10:00"), 3.0),  // == end: exclusive
    (2L, t("2024-01-01 10:03:00"), 4.0),
    (2L, t("2024-01-01 10:04:00"), 5.0),  // == end: exclusive
    (3L, t("2024-01-01 10:03:00"), 6.0)   // key matches nothing
  ).toDF("user_id", "ts", "value")

  test("range join: boundary semantics and bin-crossing intervals") {
    val out = TemporalJoins.rangeJoinBinned(intervals, points,
      key = "user_id", startCol = "start_ts", endCol = "end_ts",
      tsCol = "ts", binSeconds = 300L, pointPayload = Seq("value"))
      .select("iv_id", "p_value").as[(Long, Double)].collect().sorted
    assert(out.toSeq == Seq((1L, 1.0), (1L, 2.0), (2L, 4.0)),
      "start inclusive, end exclusive, cross-bin matches found once")
  }

  test("range join plans an equi-join, never a nested loop") {
    val plan = TemporalJoins.rangeJoinBinned(intervals, points,
      key = "user_id", startCol = "start_ts", endCol = "end_ts",
      tsCol = "ts", binSeconds = 300L, pointPayload = Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("multi-key as-of join matches on the key conjunction") {
    val l = Seq(
      (1L, 1L, "eu", t("2024-01-01 10:00:00")),
      (2L, 1L, "us", t("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "region", "ts")
    val r = Seq(
      (100L, 1L, "eu", t("2024-01-01 09:00:00"), 1.0),
      (101L, 1L, "us", t("2024-01-01 09:30:00"), 2.0))
      .toDF("event_id", "user_id", "region", "ts", "value")
    val out = TemporalJoins.asofJoinKeys(l, r, keys = Seq("user_id", "region"),
      ts = "ts", rightOrder = "event_id", rightPayload = Seq("event_id", "value"),
      prefix = "r_")
      .select("event_id", "r_event_id", "r_value")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(100L), Some(1.0))),
      "eu click must NOT match the us view despite same user_id")
    assert(out(1) == ((2L, Some(101L), Some(2.0))))
  }

  test("wide bins and narrow bins agree (bin width is perf-only)") {
    def run(binSeconds: Long) = TemporalJoins.rangeJoinBinned(intervals, points,
      key = "user_id", startCol = "start_ts", endCol = "end_ts",
      tsCol = "ts", binSeconds = binSeconds, pointPayload = Seq("value"))
      .select("iv_id", "p_value").as[(Long, Double)].collect().sorted.toSeq
    assert(run(60L) == run(3600L))
  }

  test("q206 overlap join: planted truth table — partial, containment, touching, cross-bin") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: [10:00, 11:00]; user 2: [10:30, 12:00] (partial overlap),
    //         [13:00, 13:10] (inside user 3's long session);
    // user 3: [12:00, 14:00] — TOUCHES user 1's... no: starts exactly at
    //         user 2's first end (12:00) → strict predicate excludes;
    //         contains user 2's second fully;
    // user 4: [20:00, 20:00] zero-length point inside nothing.
    val iv = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")),
      (2L, 1L, t("2024-01-01 10:30:00"), t("2024-01-01 12:00:00")),
      (2L, 2L, t("2024-01-01 13:00:00"), t("2024-01-01 13:10:00")),
      (3L, 1L, t("2024-01-01 12:00:00"), t("2024-01-01 14:00:00")),
      (4L, 1L, t("2024-01-01 20:00:00"), t("2024-01-01 20:00:00")))
      .toDF("user_id", "sess", "st", "en")
    val got = TemporalJoins.intervalOverlapPairs(iv, "user_id", Seq("user_id", "sess"))
      .select(col("a_user_id"), col("a_sess"), col("b_user_id"), col("b_sess"),
        col("overlap_s"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3, r._4))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 1L, 1800.0),   // partial: [10:30, 11:00]
      (2L, 2L, 3L, 1L, 600.0)),   // containment: the 10-minute session
      s"got ${got.toSeq}")
    // touching endpoints (2's first ends 12:00, 3 starts 12:00) excluded
    assert(!got.exists(r => r._1 == 2L && r._2 == 1L && r._3 == 3L))
    // bin width is perf-only: 60 s bins agree with 1 h bins
    val narrow = TemporalJoins.intervalOverlapPairs(iv, "user_id",
        Seq("user_id", "sess"), binSeconds = 60)
      .select(col("a_user_id"), col("a_sess"), col("b_user_id"), col("b_sess"),
        col("overlap_s"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3, r._4))
    assert(narrow.toSeq == got.toSeq)
    // cross-bin pair emitted ONCE despite sharing many bins (the distinct)
    assert(got.count(r => r._1 == 1L && r._3 == 2L) == 1)
  }

  test("q206 session intervals match the q176 sessionization boundaries") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: events at 10:00, 10:20, 11:30 — the 70-min gap splits
    val ev = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (2L, 1L, t("2024-01-01 10:20:00")),
      (3L, 1L, t("2024-01-01 11:30:00")))
      .toDF("event_id", "user_id", "ts")
    val iv = TemporalJoins.sessionIntervals(ev)
      .select("user_id", "sess", "st", "en")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._2)
    assert(iv.length == 2)
    assert(iv(0)._3 == t("2024-01-01 10:00:00") && iv(0)._4 == t("2024-01-01 10:20:00"))
    assert(iv(1)._3 == t("2024-01-01 11:30:00") && iv(1)._4 == t("2024-01-01 11:30:00"))
  }
}
