package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the event-sequence analytics operators (q131/q132): planted
  * event streams with hand-computed answers (ordering edge cases the
  * oracle's aggregate view can't isolate), plus brute-force parity
  * against the real sf0.001 events table. */
class EventAnalyticsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import operators.EventAnalytics

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (u, t, at) => (u, t, ts(s"2024-01-$at")) }
      .toDF("user_id", "event_type", "ts")
  }

  test("q131 funnel: strictly-after ordering decides each stage") {
    // u1: view->click->purchase in order (full funnel)
    // u2: click BEFORE its only view — click never counts
    // u3: view only
    // u4: click at EXACTLY the first-view timestamp — strictly-after excludes
    // u5: purchase before click (but after view) — purchase never counts
    // u6: no view at all — enters no stage even with click+purchase
    val ev = eventsDf(Seq(
      (1L, "view", "01 10:00:00"), (1L, "click", "01 11:00:00"), (1L, "purchase", "01 12:00:00"),
      (2L, "click", "02 09:00:00"), (2L, "view", "02 10:00:00"),
      (3L, "view", "03 10:00:00"),
      (4L, "view", "04 10:00:00"), (4L, "click", "04 10:00:00"),
      (5L, "view", "05 10:00:00"), (5L, "purchase", "05 11:00:00"), (5L, "click", "05 12:00:00"),
      (6L, "click", "06 10:00:00"), (6L, "purchase", "06 11:00:00")))
    val got = EventAnalytics.eventFunnel(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("1_view", 5L, 1.0, 1.0),
      ("2_click", 2L, 0.4, 0.4), // u1 and u5 (u5's click is after its view)
      ("3_purchase", 1L, 0.2, 0.5))) // only u1; u5's purchase precedes its click
  }

  test("q131 funnel matches a brute-force replay on real sf0.001 events") {
    val rows = Tables.events(spark, sf001)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = rows.groupBy(_._1)
    def stageTimes(u: Long): (Option[Long], Option[Long], Option[Long]) = {
      val es = byUser(u)
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(t => es.filter(e => e._2 == "click" && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t => es.filter(e => e._2 == "purchase" && e._3 > t).map(_._3).minOption)
      (t1, t2, t3)
    }
    val times = byUser.keys.map(stageTimes).toSeq
    val exp = Seq(times.count(_._1.isDefined), times.count(_._2.isDefined),
      times.count(_._3.isDefined)).map(_.toLong)
    val got = EventAnalytics.eventFunnel(Tables.events(spark, sf001))
      .collect().map(_.getLong(1)).toSeq
    assert(got === exp)
  }

  test("q132 retention: planted cohort matrix is exact") {
    // cohort 01: u1 active days 1,2,4; u2 active day 1 only
    // cohort 02: u3 active days 2,3 (two events day 2 — still one active)
    val ev = eventsDf(Seq(
      (1L, "view", "01 08:00:00"), (1L, "click", "02 08:00:00"), (1L, "view", "04 08:00:00"),
      (2L, "view", "01 09:00:00"),
      (3L, "view", "02 09:00:00"), (3L, "click", "02 10:00:00"), (3L, "view", "03 09:00:00")))
    val got = EventAnalytics.retentionCohorts(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-01", 3L, 1L, 2L, 0.5),
      ("2024-01-02", 0L, 1L, 1L, 1.0),
      ("2024-01-02", 1L, 1L, 1L, 1.0)))
  }

  test("q137 anomaly: spike z-score matches hand-computed frame statistics") {
    // 'click': 24 baseline hours alternating 1/3 events, then a 9-event
    // spike at hour 24. Trailing stats at the spike: n=24, sum=48,
    // sum2 = 12*1 + 12*9 = 120 → mean 2, var = (24*120-48²)/(24*23)
    val base = (0 until 24).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 3
      (0 until n).map(i => (100L + i, "click", f"0${1 + h / 24}%s ${h % 24}%02d:15:00"))
    }
    val spike = (0 until 9).map(i => (200L + i, "click", "02 00:30:00"))
    val got = EventAnalytics.eventAnomaly(eventsDf(base ++ spike))
      .collect().map(r => (r.get(1).toString, r.getLong(2), r.getLong(3),
        Option(r.get(6)).map(_.asInstanceOf[Double]), r.getBoolean(7))).toSeq
    val m = 48.0 / 24
    val sd = math.sqrt((24.0 * 120 - 48.0 * 48) / (24 * 23))
    val expZ = BigDecimal((9.0 - m) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spikeRow = got.find(_._1.startsWith("2024-01-02T00:00")).get
    assert(spikeRow._2 === 9L && spikeRow._3 === 24L)
    assert(spikeRow._4 === Some(expZ) && spikeRow._5, s"spike row: $spikeRow")
    // warm-up rows (fewer than 12 trailing buckets) carry null stats
    assert(got.count(_._4.isEmpty) === 12)
  }

  test("q137 anomaly: constant baseline (sd=0) never flags, and gaps empty the frame") {
    // 'view': exactly 2 events every hour for 30h — sd = 0, z must be
    // null (never a division blow-up), nothing flagged
    val flat = (0 until 30).flatMap(h =>
      Seq((1L, "view", f"0${1 + h / 24}%s ${h % 24}%02d:00:00"),
        (2L, "view", f"0${1 + h / 24}%s ${h % 24}%02d:30:00")))
    // 'error': 14 early buckets, then a 26-hour gap — the RANGE frame at
    // the late bucket is EMPTY (a ROWS frame would wrongly reuse the old
    // buckets across the gap)
    val gapped = (0 until 14).map(h => (3L, "error", f"01 $h%02d:00:00")) :+
      ((3L, "error", "02 16:00:00"))
    val got = EventAnalytics.eventAnomaly(eventsDf(flat ++ gapped))
      .collect().map(r => (r.getString(0), r.get(1).toString,
        Option(r.get(6)), r.getBoolean(7)))
    val views = got.filter(_._1 == "view")
    assert(views.forall(v => v._3.isEmpty && !v._4), "sd=0 rows: null z, unflagged")
    val late = got.find(r => r._1 == "error" && r._2.startsWith("2024-01-02T16")).get
    assert(late._3.isEmpty && !late._4, s"empty frame after gap: $late")
  }

  test("q144 transitions: planted matrix is exact and ties order by event_id") {
    import spark.implicits._
    // u1: A B B C → (A,B) (B,B) (B,C); u2: B A → (B,A)
    // u2's two events share a timestamp — event_id must break the tie
    val ev = Seq(
      (1L, 1L, "A", "01 10:00:00"), (2L, 1L, "B", "01 11:00:00"),
      (3L, 1L, "B", "01 12:00:00"), (4L, 1L, "C", "01 13:00:00"),
      (5L, 2L, "B", "02 10:00:00"), (6L, 2L, "A", "02 10:00:00"))
      .map { case (e, u, t, at) => (e, u, t, ts(s"2024-01-$at")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.eventTransitions(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("A", "B") -> ((1L, 1.0)),
      ("B", "B") -> ((1L, 0.333333)),
      ("B", "C") -> ((1L, 0.333333)),
      ("B", "A") -> ((1L, 0.333333))))
  }

  test("q145 conversion lag: hand-computed distribution over planted funnels") {
    // u1 converts in 5h, u2 in 26h, u3 never purchases
    val ev = eventsDf(Seq(
      (1L, "view", "01 00:00:00"), (1L, "click", "01 01:00:00"), (1L, "purchase", "01 05:00:00"),
      (2L, "view", "02 00:00:00"), (2L, "click", "02 02:00:00"), (2L, "purchase", "03 02:00:00"),
      (3L, "view", "04 00:00:00"), (3L, "click", "04 01:00:00")))
    val r = EventAnalytics.conversionLag(ev).collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 15.5) // mean of 5 and 26
    assert(r.getDouble(2) === 15.5) // interpolated median
    assert(r.getDouble(3) === 23.9) // 5 + 0.9·21
  }

  test("q148 survival: hand-computed KM curve with censoring between events") {
    // u1 converts at 2h, u2 at 5h, u3 censored at 10h (window ends 12:00,
    // its view was 02:00); u9's stray event only extends the window
    val ev = eventsDf(Seq(
      (1L, "view", "01 00:00:00"), (1L, "click", "01 01:00:00"), (1L, "purchase", "01 02:00:00"),
      (2L, "view", "01 00:00:00"), (2L, "click", "01 01:00:00"), (2L, "purchase", "01 05:00:00"),
      (3L, "view", "01 02:00:00"), (3L, "click", "01 03:00:00"),
      (9L, "error", "01 12:00:00")))
    val got = EventAnalytics.conversionSurvival(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (2L, 3L, 1L, 0L, 0.666667),  // S = 1 - 1/3
      (5L, 2L, 1L, 0L, 0.333333),  // S = 2/3 · 1/2
      (10L, 1L, 0L, 1L, 0.333333))) // censoring leaves S unchanged
  }

  test("q148 survival: full conversion hits the absorbing zero exactly") {
    val ev = eventsDf(Seq(
      (1L, "view", "01 00:00:00"), (1L, "click", "01 01:00:00"), (1L, "purchase", "01 03:00:00"),
      (2L, "view", "01 00:00:00"), (2L, "click", "01 01:00:00"), (2L, "purchase", "01 03:00:00")))
    val got = EventAnalytics.conversionSurvival(ev).collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    assert(got.toSeq === Seq((3L, 0.0)), s"deaths==at_risk must zero survival: ${got.toSeq}")
  }

  test("q191 A/B: planted arm rates match the z replay; all-converted degenerates to null z") {
    import spark.implicits._
    def arm(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if ("%02x".format(md(0)).charAt(0) <= '7') "A" else "B"
    }
    // every user views; A users all convert, B users convert iff even id
    val users = (1L to 40L)
    val rows = users.flatMap { u =>
      val base = Seq((u, "view", ts("2024-01-01 10:00:00")))
      val conv = if (arm(u) == "A" || u % 2 == 0)
        Seq((u, "purchase", ts("2024-01-01 11:00:00"))) else Seq.empty
      base ++ conv
    }
    val got = operators.EventAnalytics.abConversionTest(
        rows.toDF("user_id", "event_type", "ts")).collect().head
    val n1 = users.count(arm(_) == "A").toLong
    val n2 = users.count(arm(_) == "B").toLong
    val c1 = n1
    val c2 = users.count(u => arm(u) == "B" && u % 2 == 0).toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (p1, p2) = (c1.toDouble / n1, c2.toDouble / n2)
    val pp = (c1 + c2).toDouble / (n1 + n2)
    val z = r6((p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2)))
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((n1, c1, n2, c2)))
    assert(got.getDouble(6) === z)
    assert(got.getBoolean(7) === (math.abs(z) >= 1.96))
    assert(n2 > c2, "sanity: arm B must have non-converters")
    // degenerate: everyone converts → zero pooled variance → null z
    val allConv = users.flatMap(u => Seq(
      (u, "view", ts("2024-01-01 10:00:00")),
      (u, "purchase", ts("2024-01-01 11:00:00"))))
    val d = operators.EventAnalytics.abConversionTest(
        allConv.toDF("user_id", "event_type", "ts")).collect().head
    assert(d.isNullAt(6) && !d.getBoolean(7),
      "no variance → no test, never a divide-by-zero")
    // empty arm: md5("1") starts 'c' → the only user lands in B, arm A is
    // EMPTY — the result must still be ONE row with NULL A-side counts
    // (the oracle's scalar subqueries yield exactly that; the old
    // filter+crossJoin form yielded zero rows)
    assert(arm(1L) === "B", "fixture: user 1 must hash to arm B")
    val one = operators.EventAnalytics.abConversionTest(
      Seq((1L, "purchase", ts("2024-01-01 10:00:00")))
        .toDF("user_id", "event_type", "ts")).collect()
    assert(one.length === 1, s"empty arm must not drop the row: ${one.toSeq}")
    assert(one.head.isNullAt(0) && one.head.isNullAt(1),
      s"empty arm A → NULL n1/c1: ${one.head}")
    assert(one.head.getLong(2) === 1L && one.head.getLong(3) === 1L)
    assert(one.head.isNullAt(6) && !one.head.getBoolean(7))
  }

  test("q180 features: hand-computed single-user row with empty-week trend") {
    import spark.implicits._
    // u1: 3 events across days 01/02 (week 0), 1 event day 15 (week 2);
    // week 1 is EMPTY → active-days-per-week series (2, 0, 1);
    // u9 only anchors the window end at 01-20 00:00
    val rows = Seq(
      (1L, 1L, "view", 0.0, "01 10:00:00"),
      (2L, 1L, "purchase", 25.5, "01 11:00:00"),
      (3L, 1L, "view", 0.0, "02 10:00:00"),
      (4L, 1L, "purchase", 10.0, "15 10:00:00"),
      (9L, 9L, "view", 0.0, "20 00:00:00"))
      .map { case (e, u, t, v, at) => (e, u, t, v, ts(s"2024-01-$at")) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = operators.EventAnalytics.userFeatures(rows).collect()
      .find(_.getLong(0) == 1L).get
    assert(r.getLong(1) === 4L)                       // n_events
    assert(r.getLong(2) === 3L)                       // active_days
    assert(r.getDate(3).toString === "2024-01-01")
    assert(r.getDate(4).toString === "2024-01-15")
    assert(r.getLong(5) === 4L)                       // recency: 15th 10:00 → 20th 00:00
    assert(r.getLong(6) === 2L)                       // purchases
    assert(r.getDouble(7) === 35.5)                   // monetary
    // gaps: 3600 + 82800 + 1123200 → mean 403200
    assert(r.getDouble(8) === 403200.0)
    // series (2,0,1) over weeks (0,1,2): slope = (3·2 − 3·3)/(3·5 − 9) = −0.5
    assert(r.getDouble(9) === -0.5)
  }

  test("q178 windowed funnel: the attribution boundary is inclusive and cuts the tail") {
    // u1 clicks exactly 24 h after the view (included), buys in window;
    // u2 clicks 24 h + 1 s after the view — outside, never converts;
    // u3 clicks in window but buys 2 days later — purchase outside
    val ev = eventsDf(Seq(
      (1L, "view", "01 10:00:00"), (1L, "click", "02 10:00:00"),
      (1L, "purchase", "02 11:00:00"),
      (2L, "view", "03 10:00:00"), (2L, "click", "04 10:00:01"),
      (3L, "view", "05 10:00:00"), (3L, "click", "05 11:00:00"),
      (3L, "purchase", "07 11:00:01")))
    val got = operators.EventAnalytics
      .eventFunnel(ev, maxLagSec = Some(86400L)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("1_view", 3L), ("2_click", 2L), ("3_purchase", 1L)))
    // the unbounded face counts u2's click and u3's purchase
    val unbounded = operators.EventAnalytics.eventFunnel(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(unbounded === Seq(("1_view", 3L), ("2_click", 3L), ("3_purchase", 2L)))
  }

  test("q176 bots: burst flagged, human pace not, zero-duration needs the volume gate") {
    import spark.implicits._
    // u1: 30 events in 29 s → 62/min at full volume → bot
    val bot = (0 until 30).map(i =>
      (100L + i, 1L, "view", new Timestamp(ts("2024-01-01 10:00:00").getTime + i * 1000L)))
    // u2: 30 events spread over 29 min → ~1/min → volume passes, rate fails
    val human = (0 until 30).map(i =>
      (200L + i, 2L, "view", new Timestamp(ts("2024-01-01 10:00:00").getTime + i * 60000L)))
    // u3: a single event — duration 0, volume 1 → never a bot, rate null
    val single = Seq((300L, 3L, "view", ts("2024-01-02 09:00:00")))
    // u4: 30 events at the SAME timestamp — duration 0 burst → bot
    val samets = (0 until 30).map(i =>
      (400L + i, 4L, "view", ts("2024-01-03 09:00:00")))
    val ev = (bot ++ human ++ single ++ samets)
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.EventAnalytics.botSessions(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), Option(r.get(4)), r.getBoolean(5))).toSeq
    assert(got === Seq(
      (1L, 30L, Some(round6(30 * 60.0 / 29.0)), true),
      (2L, 30L, Some(round6(30 * 60.0 / (29 * 60.0))), false),
      (3L, 1L, None, false),
      (4L, 30L, None, true)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q174 half-life: planted halving retention fits slope −ln2, half-life 1 day") {
    import spark.implicits._
    // cohort 01-01, 8 users; actives halve daily: 8, 4, 2, 1 →
    // retention 0.5, 0.25, 0.125 at offsets 1..3 — exactly exponential
    val rows =
      (1L to 8L).map(u => (u, "view", "01 08:00:00")) ++
      (1L to 4L).map(u => (u, "view", "02 08:00:00")) ++
      (1L to 2L).map(u => (u, "view", "03 08:00:00")) ++
      Seq((1L, "view", "04 08:00:00"))
    val got = operators.EventAnalytics.retentionHalfLife(eventsDf(rows)).collect().head
    // replicate the decimal OLS chain in plain Scala
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = Seq(1.0 -> 0.5, 2.0 -> 0.25, 3.0 -> 0.125)
      .map { case (x, r) => (x, r9(math.log(r)).toDouble) }
    val n = cells.size
    val sx = cells.map(_._1).sum; val sxx = cells.map(c => c._1 * c._1).sum
    val sy = cells.map(c => r9(c._2)).sum.toDouble
    val sxy = cells.map(c => r9(c._1 * c._2)).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got.getLong(0) === 3L)
    assert(got.getDouble(1) === r6(slope))
    assert(got.getDouble(3) === r6(-math.log(2.0) / slope))
    assert(math.abs(got.getDouble(3) - 1.0) < 1e-6, "half-life ≈ 1 day")
  }

  test("q169 sketch actives: exact at sub-sketch cardinalities on sf0.001") {
    // 150 users << 2^12 — the HLL stays in exact (sparse) mode, so the
    // sketch face must REPRODUCE the exact face cell for cell
    val events = Tables.events(spark, sf001)
    val exact = operators.EventAnalytics.rollingActiveUsers(events).collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val est = operators.EventAnalytics.rollingActiveUsersSketch(events).collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (day, e) => assert(e === exact(day), s"day $day") }
  }

  test("q169 sketch actives: window union equals sketching the expanded frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // merge associativity (the q89/q98 pin): union of per-day sketches
    // over a window == one sketch of the expanded (user, window-day) rows
    val ev = eventsDf(Seq(
      (1L, "view", "01 10:00:00"), (2L, "view", "01 11:00:00"),
      (2L, "click", "03 09:00:00"), (3L, "view", "09 12:00:00")))
    val viaUnion = operators.EventAnalytics.rollingActiveUsersSketch(ev)
      .select("day", "mau_est").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val expanded = ev.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .select(col("user_id"), explode(expr("sequence(0, 29)")).as("i"), col("d"))
      .select(col("user_id"), expr("date_add(d, i)").as("day"))
      .groupBy("day")
      .agg(round(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
        .cast("long").as("mau_direct"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    viaUnion.foreach { case (day, v) =>
      assert(expanded(day) === v, s"day $day: union != direct sketch")
    }
  }

  test("q166 LTV: planted cohort — cumulative revenue and per-user value") {
    import spark.implicits._
    // cohort 01-01: u1 (buys 10 on day 0, 20 on day 2), u2 (never buys);
    // cohort 01-02: u3 buys 5 on day 1
    val rows = Seq(
      (1L, "view", 0.0, "01 08:00:00"), (1L, "purchase", 10.0, "01 09:00:00"),
      (1L, "purchase", 20.0, "03 09:00:00"),
      (2L, "view", 0.0, "01 10:00:00"),
      (3L, "view", 0.0, "02 10:00:00"), (3L, "purchase", 5.0, "03 10:00:00"))
    val ev = rows.map { case (u, t, v, at) => (u, t, v, ts(s"2024-01-$at")) }
      .toDF("user_id", "event_type", "value", "ts")
    val got = operators.EventAnalytics.ltvCurve(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 10.0, 10.0, 2L, 5.0),
      ("2024-01-01", 2L, 20.0, 30.0, 2L, 15.0),
      ("2024-01-02", 1L, 5.0, 5.0, 1L, 5.0)))
  }

  test("q168 gaps: ladder boundaries are half-open and the shares sum to 1") {
    import spark.implicits._
    // u1 gaps: 0.5 s (<1s), exactly 60 s (NOT <60 → the 1m–10m bucket),
    // 59 s (1s–1m), 86400 s (≥1d)
    val times = Seq(0.0, 0.5, 60.5, 119.5, 86519.5)
    val ev = times.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, "view", new Timestamp(
        ts("2024-01-01 00:00:00").getTime + (t * 1000).toLong))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.EventAnalytics.interEventGaps(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("0_lt_1s", 1L, 0.25, 0.5),
      ("1_1s_1m", 1L, 0.25, 59.0),
      ("2_1m_10m", 1L, 0.25, 60.0),
      ("5_ge_1d", 1L, 0.25, 86400.0)))
  }

  test("q161 rolling actives: planted window counts, zero-DAU days included") {
    // u1 active 01-01; u2 active 01-01 AND 01-03 (distinct-user check);
    // u3 active 01-09 — exercises zero-DAU days and WAU aging-out
    val ev = eventsDf(Seq(
      (1L, "view", "01 10:00:00"),
      (2L, "view", "01 11:00:00"), (2L, "click", "03 09:00:00"),
      (3L, "view", "09 12:00:00")))
    val got = operators.EventAnalytics.rollingActiveUsers(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = Seq(
      ("2024-01-01", 2L, 2L, 2L),
      ("2024-01-02", 0L, 2L, 2L),
      ("2024-01-03", 1L, 2L, 2L), // u2 again — DISTINCT users stay 2
      ("2024-01-04", 0L, 2L, 2L),
      ("2024-01-05", 0L, 2L, 2L),
      ("2024-01-06", 0L, 2L, 2L),
      ("2024-01-07", 0L, 2L, 2L), // u1/u2's 01-01 still in the 7-day window
      ("2024-01-08", 0L, 1L, 2L), // 01-01 aged out of WAU; u2's 01-03 remains
      ("2024-01-09", 1L, 2L, 3L)) // u3 arrives; WAU = {u2, u3}
    assert(got.toSeq === exp)
  }

  test("q162 attribution: last preceding touch wins; no-touch purchases land on none") {
    import spark.implicits._
    val rows = Seq(
      // u1: view → click → purchase 10 (click credited), then purchase 5
      // with the same click still the last touch
      (1L, 1L, "view", 0.0, "01 09:00:00"),
      (2L, 1L, "click", 0.0, "01 10:00:00"),
      (3L, 1L, "purchase", 10.0, "01 11:00:00"),
      (4L, 1L, "purchase", 5.0, "01 12:00:00"),
      // u2: purchase with NO prior event → 'none'
      (5L, 2L, "purchase", 7.5, "02 09:00:00"),
      // u3: view at the SAME ts as the purchase but a LOWER event_id —
      // it precedes in the total order, so it IS the touch
      (6L, 3L, "view", 0.0, "03 09:00:00"),
      (7L, 3L, "purchase", 2.5, "03 09:00:00"))
    val ev = rows.map { case (e, u, t, v, at) => (e, u, t, v, ts(s"2024-01-$at")) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val got = operators.EventAnalytics.lastTouchAttribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("click", 2L, 15.0, 0.6),
      ("none", 1L, 7.5, 0.3),
      ("view", 1L, 2.5, 0.1)))
  }

  test("q151 SCD2: repeats collapse, ties order by event_id, last interval open") {
    import spark.implicits._
    // u1: A A B B A → A[t1,t3) B[t3,t5) A[t5,∞); u2: X,Y at the SAME ts —
    // event_id decides the version order and X's interval is empty
    val ev = Seq(
      (1L, 1L, "A", "01 10:00:00"), (2L, 1L, "A", "01 11:00:00"),
      (3L, 1L, "B", "01 12:00:00"), (4L, 1L, "B", "01 13:00:00"),
      (5L, 1L, "A", "01 14:00:00"),
      (6L, 2L, "X", "02 09:00:00"), (7L, 2L, "Y", "02 09:00:00"))
      .map { case (e, u, t, at) => (e, u, t, ts(s"2024-01-$at")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.EventAnalytics.scdIntervals(ev).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.get(2).toString, Option(r.get(3)).map(_.toString),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (1L, "A", "2024-01-01T10:00", Some("2024-01-01T12:00"), 1L, false),
      (1L, "B", "2024-01-01T12:00", Some("2024-01-01T14:00"), 2L, false),
      (1L, "A", "2024-01-01T14:00", None, 3L, true),
      (2L, "X", "2024-01-02T09:00", Some("2024-01-02T09:00"), 1L, false),
      (2L, "Y", "2024-01-02T09:00", None, 2L, true)))
  }

  test("q153 RFM: planted quintiles — scores are exact ranks at n=5") {
    import spark.implicits._
    def p(u: Long, v: Double, at: String) = (u, "purchase", v, ts(s"2024-01-$at"))
    val rows = Seq(
      p(1L, 100.0, "09 10:00:00"), p(1L, 100.0, "09 11:00:00"), p(1L, 100.0, "09 12:00:00"),
      p(2L, 100.0, "07 00:00:00"), p(2L, 100.0, "08 00:00:00"),
      p(3L, 500.0, "07 00:00:00"),
      p(4L, 10.0, "05 00:00:00"), p(4L, 10.0, "05 01:00:00"), p(4L, 10.0, "05 02:00:00"),
      p(4L, 10.0, "05 03:00:00"), p(4L, 10.0, "04 23:00:00"),
      p(5L, 25.0, "01 00:00:00"), p(5L, 25.0, "01 01:00:00"),
      p(5L, 25.0, "01 02:00:00"), p(5L, 25.0, "01 03:00:00"),
      // window-end anchor: a non-purchase event at 01-10 00:00 (u99
      // never purchases, so it contributes only w_end)
      (99L, "error", 0.0, ts("2024-01-10 00:00:00")))
    val ev = rows.toDF("user_id", "event_type", "value", "ts")
    val got = operators.EventAnalytics.rfmSegments(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    assert(got.toSeq === Seq(
      (1L, 0L, 3L, 300.0, 5L, 3L, 4L, "534"),
      (2L, 2L, 2L, 200.0, 4L, 2L, 3L, "423"),
      (3L, 3L, 1L, 500.0, 3L, 1L, 5L, "315"),
      (4L, 4L, 5L, 50.0, 2L, 5L, 1L, "251"),
      (5L, 8L, 4L, 100.0, 1L, 4L, 2L, "142")))
  }

  test("q154 paths: gap boundary is strict, sessions cap at maxLen, ties order by event_id") {
    import spark.implicits._
    // u1: gap of EXACTLY 1800 s stays in-session; 1801 s opens a new one
    val u1 = Seq(
      (1L, 1L, "A", ts("2024-01-01 10:00:00")),
      (2L, 1L, "B", ts("2024-01-01 10:30:00")),
      (3L, 1L, "C", ts("2024-01-01 11:00:01")))
    // u2: 25 events 1 s apart — one session, path capped at the first 20
    val u2 = (0 until 25).map(i =>
      (10L + i, 2L, if (i % 2 == 0) "A" else "B",
        new Timestamp(ts("2024-01-02 08:00:00").getTime + i * 1000L)))
    // u3: same-ts pair — event_id orders the path
    val u3 = Seq(
      (50L, 3L, "Y", ts("2024-01-03 09:00:00")),
      (51L, 3L, "X", ts("2024-01-03 09:00:00")))
    val ev = (u1 ++ u2 ++ u3).toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.EventAnalytics.sessionPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val cap20 = (0 until 20).map(i => if (i % 2 == 0) "A" else "B").mkString(">")
    val exp = Seq(
      ("A>B", 1L, 0.25), (cap20, 1L, 0.25), ("C", 1L, 0.25), ("Y>X", 1L, 0.25))
      .sortBy(_._1)
    assert(got.sortBy(_._1) === exp)
  }

  test("q132 retention matches a brute-force replay on real sf0.001 events") {
    val rows = Tables.events(spark, sf001)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
    val act = rows.distinct
    val first = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = act.groupBy { case (u, d) =>
      (first(u), java.time.temporal.ChronoUnit.DAYS.between(first(u), d))
    }.view.mapValues(_.size.toLong).toMap
    val sizes = first.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = EventAnalytics.retentionCohorts(Tables.events(spark, sf001)).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val key = (r.getDate(0).toLocalDate, r.getLong(1))
      assert(exp(key) === r.getLong(2), s"cell $key")
      assert(sizes(r.getDate(0).toLocalDate) === r.getLong(3), s"size $key")
    }
  }
}
