package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream table — the two
  * classic product/ops queries a pipeline that lands event streams
  * (SURVEY §2.11's event-time family: q36/q37/q75) is eventually asked
  * to answer about them:
  *
  *  - q131 ordered funnel conversion (view → click → purchase, each
  *    stage strictly AFTER the user's previous stage time);
  *  - q132 day-cohort retention (users grouped by first-active day,
  *    activity tracked by day offset).
  *
  * Scale design:
  *  - The funnel is a CASCADE OF MIN-AGGREGATES, never a per-user
  *    event-sequence collect: each stage scans only its own event type
  *    (the predicate reaches the parquet scan), joins the previous
  *    stage's (user_id, ts) frame on user_id, and min-reduces with
  *    map-side combine. A hot user with millions of events costs a
  *    bigger min, not a bigger buffer — the collect_list-per-user
  *    shape that OOMs on power users at 100 TB is exactly what this
  *    avoids. Stage frames are 16 B/row and feed two consumers each
  *    (count + next stage), so they sit behind lazy barriers; the
  *    summary assembles from one-row count frames via broadcast BNLJ
  *    (the q80 bounded pattern).
  *  - Retention first collapses events to DISTINCT (user_id, day) —
  *    everything downstream (first-day, cohort sizes, cells) runs on
  *    that bounded frame (≤ users × days rows), and per-cell "distinct
  *    actives" becomes a plain count because the frame is already
  *    unique. One corpus-sized exchange total.
  */
object EventAnalytics {

  /** Funnel stage names in order. Shared with the oracle SQL below so
    * the two sides cannot drift (the q69 generated-oracle discipline). */
  private[graft] val funnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Per-user first-completion time of each funnel stage, where stage
    * k+1 must happen strictly after the user's stage-k time — and, when
    * `maxLagSec` is set, within that many seconds of it (the attribution
    * window q178 adds; None preserves q131's unbounded semantics).
    * Returns the per-stage (user_id, t) frames, each behind a lazy
    * barrier (two consumers: the stage count and the next stage's join). */
  private def stageFrames(events: DataFrame,
      maxLagSec: Option[Long] = None): Seq[DataFrame] = {
    val first = events.filter(col("event_type") === funnelStages.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
      .localCheckpoint(eager = false)
    funnelStages.tail.foldLeft(Seq(first)) { case (acc, stage) =>
      val prev = acc.last
      val inWindow = maxLagSec match {
        case Some(s) => col("ts").cast("double") - col("t_prev").cast("double") <= s.toDouble
        case None => lit(true)
      }
      val next = events.filter(col("event_type") === stage)
        .join(prev.withColumnRenamed("t", "t_prev"), Seq("user_id"))
        .filter(col("ts") > col("t_prev") && inWindow)
        .groupBy("user_id").agg(min(col("ts")).as("t"))
        .localCheckpoint(eager = false)
      acc :+ next
    }
  }

  /** Ordered funnel summary: one row per stage with the surviving user
    * count and conversion vs the first stage / vs the previous stage.
    * `maxLagSec` bounds each stage's lag behind the previous one — the
    * ATTRIBUTION-WINDOW funnel (q178): a purchase three weeks after the
    * click is organic, not converted, and unbounded funnels overstate
    * conversion by exactly that tail (same min-agg cascade either way). */
  def eventFunnel(events: DataFrame,
      maxLagSec: Option[Long] = None): DataFrame = {
    val frames = stageFrames(events, maxLagSec)
    // one-row count frames; n1 rides along via broadcast BNLJ so rates
    // divide inside the engine (never a driver-side collect)
    val counts = frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as(s"n${i + 1}"))
    }
    val n = counts.reduce((a, b) => a.crossJoin(broadcast(b)))
    val rows = funnelStages.zipWithIndex.map { case (stage, i) =>
      val nk = col(s"n${i + 1}")
      val prev = if (i == 0) nk else col(s"n$i")
      n.select(
        lit(s"${i + 1}_$stage").as("stage"),
        nk.as("n_users"),
        round(nk.cast("double") / nullif(col("n1"), lit(0L)), 6).as("conv_vs_first"),
        round(nk.cast("double") / nullif(prev, lit(0L)), 6).as("conv_vs_prev"))
    }
    rows.reduce(_.unionByName(_)).orderBy("stage")
  }

  private def funnelOracleSql: String = funnelOracleSqlWith(None)

  private def funnelOracleSqlWith(maxLagSec: Option[Long]): String = {
    // generated from funnelStages — one CTE per stage, then the summary
    val lag = maxLagSec
      .map(s => s" AND epoch(e.ts) - epoch(p.t) <= $s.0").getOrElse("")
    val stageCtes = funnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = '$stage' GROUP BY 1)"
      else
        s"s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s$i p ON e.user_id = p.user_id WHERE e.event_type = '$stage' AND e.ts > p.t$lag GROUP BY 1)"
    }.mkString(",\n")
    val nSelects = funnelStages.indices
      .map(i => s"(SELECT count(*) FROM s${i + 1}) AS n${i + 1}").mkString(", ")
    val rows = funnelStages.zipWithIndex.map { case (stage, i) =>
      val nk = s"n${i + 1}"
      val prev = if (i == 0) nk else s"n$i"
      s"SELECT '${i + 1}_$stage' AS stage, $nk AS n_users, round(CAST($nk AS DOUBLE) / nullif(n1, 0), 6) AS conv_vs_first, round(CAST($nk AS DOUBLE) / nullif($prev, 0), 6) AS conv_vs_prev FROM n"
    }.mkString("\nUNION ALL ")
    s"""WITH $stageCtes,
       |n AS (SELECT $nSelects)
       |$rows
       |ORDER BY stage""".stripMargin
  }

  /** Day-cohort retention: users bucketed by first-active day; each
    * (cohort_day, day_offset) cell counts users active that day. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    // the ONLY corpus-sized exchange: distinct (user, day); two
    // consumers (first-day agg + the cell join) → lazy barrier
    val act = events.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint(eager = false)
    val first = act.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
      .localCheckpoint(eager = false) // consumers: sizes + cells
    val sizes = first.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    val cells = act.join(first, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("n_active"))
    cells.join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Trailing-window anomaly detection: z-score of each (event_type,
    * hour) count against the mean/stddev of that type's counts over the
    * PRECEDING `trailHours` hours (a true RANGE frame on the integer
    * hour index, so gaps in the stream don't silently stretch the
    * baseline the way a ROWS frame would). Rows with fewer than
    * `minTrail` trailing buckets emit null statistics.
    *
    * Determinism: the frame aggregates are INTEGER sums (count, count²)
    * — mean, sample variance, and z derive from them in a fixed handful
    * of IEEE operations (one division, one sqrt — both correctly
    * rounded), so both engines produce bit-identical doubles; never a
    * built-in stddev, whose incremental formula is engine-specific.
    * Scale shape: one corpus-sized agg to hourly buckets; the window
    * runs on the bucket frame (types × hours rows). */
  def eventAnomaly(events: DataFrame, trailHours: Int = 24,
      minTrail: Int = 12, zThresh: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("hr", (unix_timestamp(col("hour")) / 3600L).cast("long"))
    val tw = Window.partitionBy("event_type").orderBy("hr")
      .rangeBetween(-trailHours, -1)
    val wdw = hourly
      .withColumn("sum_c", sum(col("c")).over(tw))
      .withColumn("sum_c2", sum(col("c") * col("c")).over(tw))
      .withColumn("n_trail", count(lit(1)).over(tw))
    val ok = col("n_trail") >= minTrail
    // nullif on every denominator: boolean AND below does not
    // short-circuit, so these expressions run on empty-frame rows too —
    // ANSI mode would otherwise raise DIVIDE_BY_ZERO
    val m = col("sum_c").cast("double") / nullif(col("n_trail"), lit(0L))
    val sd = sqrt((col("n_trail") * col("sum_c2") - col("sum_c") * col("sum_c"))
      .cast("double") / nullif(col("n_trail") * (col("n_trail") - 1), lit(0L)))
    val z = (col("c").cast("double") - m) / nullif(sd, lit(0.0))
    wdw.select(col("event_type"), col("hour").cast("timestamp_ntz").as("hour"),
        col("c"), col("n_trail"),
        when(ok, round(m, 6)).as("trail_mean"),
        when(ok, round(sd, 6)).as("trail_sd"),
        when(ok, round(z, 6)).as("z"),
        coalesce(ok && abs(round(z, 6)) >= zThresh, lit(false)).as("anomaly"))
      .orderBy("event_type", "hour")
  }

  /** Per-user event-type transition matrix: counts and row-normalized
    * shares of consecutive (prev_type → type) transitions in each
    * user's time-ordered stream — the behavior-pattern complement of
    * the fixed-stage funnel (q131 asks "did the canonical path happen";
    * this shows which paths actually happen). Ordering ties break on
    * event_id so the lag sequence is total and engine-identical.
    * Scale shape: one per-user window shuffle (the q105 partitioned
    * shape), then a transitions-bounded (types²) aggregation. */
  def eventTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // consumers: row totals + output
    val rowTot = trans.groupBy("prev_type").agg(sum(col("n")).as("row_n"))
    trans.join(rowTot, Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("row_n"), 6).as("share"))
      .orderBy("prev_type", "next_type")
  }

  /** Conversion-lag distribution for the q131 funnel: per converting
    * user, hours from first view to first qualifying purchase; reported
    * as count / mean / exact median / p90. The user-count frame is
    * bounded, so exact `percentile` is safe (the q99 argument); mean
    * sums DECIMAL(18,6) hours so engine summation order cannot drift. */
  def conversionLag(events: DataFrame): DataFrame = {
    val frames = stageFrames(events)
    val lags = frames.head.withColumnRenamed("t", "t1")
      .join(frames.last.withColumnRenamed("t", "t3"), Seq("user_id"))
      .select((col("t3").cast("double") - col("t1").cast("double"))
        .divide(lit(3600.0)).as("hours"))
      .select(round(col("hours"), 6).as("hours"))
    lags.agg(
      count(lit(1)).as("n_converted"),
      round(sum(col("hours").cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("mean_hours"),
      round(expr("percentile(hours, 0.5)"), 6).as("median_hours"),
      round(expr("percentile(hours, 0.9)"), 6).as("p90_hours"))
  }

  /** Kaplan–Meier time-to-conversion curve with right-censoring: for
    * every user who entered the funnel (a first view), the hours until
    * their first qualifying purchase (the q131 strict chain); users who
    * never converted are CENSORED at the hours they were observed (the
    * window end minus their entry) rather than dropped — the estimator
    * conversion analysis actually needs, vs q145's converters-only
    * stats, which survivorship-bias the lag downward.
    *
    * S(t) = Π_{h ≤ t, conv_h > 0} (1 − conv_h / at_risk_h), with
    * at-risk = funnel entrants whose observed time (conversion or
    * censor) ≥ h.
    *
    * Determinism: event times collapse to integer hour offsets; each
    * factor's ln rounds to DECIMAL(18,9) before the cumulative window
    * sum (engine-identical), then one exp + round. Scale shape: the
    * stage frames are the q131 min-agg cascades; everything after the
    * per-user offsets is a ≤ window-hours frame (its single-partition
    * cumulative windows are bounded — the documented q115 exemption). */
  def conversionSurvival(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = stageFrames(events)
    val entry = frames.head.withColumnRenamed("t", "t1")
    val conv = frames.last.withColumnRenamed("t", "t3")
    val winEnd = events.agg(max(col("ts")).as("w_end"))
    val obs = entry.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(winEnd))
      .select(
        floor(when(col("t3").isNotNull,
          col("t3").cast("double") - col("t1").cast("double"))
          .otherwise(col("w_end").cast("double") - col("t1").cast("double"))
          / 3600.0).cast("long").as("t"),
        col("t3").isNotNull.as("converted"))
    // per-offset conversions/censors; at-risk via reverse cumulative sum
    val byT = obs.groupBy("t").agg(
      sum(when(col("converted"), 1L).otherwise(0L)).as("deaths"),
      sum(when(col("converted"), 0L).otherwise(1L)).as("censored"))
    val ord = Window.orderBy(col("t"))
    val atRisk = byT.withColumn("at_risk",
      sum(col("deaths") + col("censored")).over(
        ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    // deaths == at_risk zeroes the factor: survival is EXACTLY 0 from
    // that offset on (ln would blow up — the absorbing case is tracked
    // as a cumulative flag instead)
    val lnf = atRisk
      .withColumn("lnf",
        when(col("deaths") > 0 && col("deaths") < col("at_risk"),
          round(log(lit(1.0) - col("deaths").cast("double") / col("at_risk")), 9)
            .cast("decimal(18,9)"))
          .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(18,9)")))
      .withColumn("zeroed", max((col("deaths") === col("at_risk")).cast("int"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    lnf.withColumn("surv",
        when(col("zeroed") === 1, lit(0.0)).otherwise(
          round(exp(sum(col("lnf")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")), 6)))
      .select(col("t").as("hour_offset"), col("at_risk"),
        col("deaths").as("conversions"), col("censored"), col("surv"))
      .orderBy("hour_offset")
  }

  /** CDC → SCD2: collapse each user's time-ordered event stream to
    * change-point intervals of consecutive distinct `event_type` —
    * (state, valid_from, valid_to, version, is_current), the classic
    * slowly-changing-dimension build from a landed change stream.
    * Ordering ties break on event_id (total order, engine-identical);
    * consecutive repeats of the same state collapse into one interval.
    * Scale shape: both windows share the user_id partitioning — ONE
    * per-user shuffle, no global window anywhere. */
  def scdIntervals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").cast("timestamp_ntz").as("valid_from"),
        col("valid_to").cast("timestamp_ntz").as("valid_to"),
        col("version"), col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** RFM segmentation over the purchase stream: per purchasing user,
    * recency (days from last purchase to the window end), frequency
    * (purchase count), monetary (DECIMAL(18,2) sum of `value`), each
    * mapped to a 1–5 score by GLOBAL rank — computed hierarchically
    * (within-bucket row_number + exclusive bucket offsets, the
    * q121/q149 discipline; buckets are the metric VALUES, a bounded
    * domain) — never a no-partition window over the user frame. The
    * scores are all-integer: s = 1 + (5·(rank−1)) div n (recency flips:
    * 5 = most recent), so both engines derive identical digits; the
    * oracle's global row_number windows prove the decomposition exact. */
  def rfmSegments(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val winEnd = events.agg(max(col("ts")).as("w_end"))
    val m = events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(col("ts")).as("last_ts"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(18,2)")).as("monetary"))
      .crossJoin(broadcast(winEnd))
      .select(col("user_id"),
        floor((col("w_end").cast("double") - col("last_ts").cast("double"))
          / 86400.0).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
      .localCheckpoint(eager = false) // consumers: three rank passes + n
    val n = m.agg(count(lit(1)).as("n"))
    def hierRank(df: DataFrame, bucket: Column, order: Seq[Column],
        rankName: String): DataFrame = {
      val withB = df.withColumn("bkt", bucket)
      val rnIn = withB.withColumn("rn_in",
        row_number().over(Window.partitionBy("bkt").orderBy(order: _*)))
      val offsets = withB.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("bkt"), col("off"))
      rnIn.join(offsets, Seq("bkt"))
        .withColumn(rankName, col("off") + col("rn_in"))
        .drop("bkt", "rn_in")
    }
    val rr = hierRank(m, col("recency_days"),
      Seq(col("recency_days"), col("user_id")), "rr")
      .select("user_id", "rr")
    val rf = hierRank(m, col("frequency"),
      Seq(col("frequency"), col("user_id")), "rf")
      .select("user_id", "rf")
    val rm = hierRank(m, floor(col("monetary")).cast("long"),
      Seq(col("monetary"), col("user_id")), "rm")
      .select("user_id", "rm")
    m.join(rr, Seq("user_id")).join(rf, Seq("user_id")).join(rm, Seq("user_id"))
      .crossJoin(broadcast(n))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        round(col("monetary").cast("double"), 2).as("monetary"),
        (lit(5L) - expr("(5 * (rr - 1)) div n")).as("r_score"),
        (lit(1L) + expr("(5 * (rf - 1)) div n")).as("f_score"),
        (lit(1L) + expr("(5 * (rm - 1)) div n")).as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
      .orderBy("user_id")
  }

  /** Session path mining: sessionize each user's stream by a `gapSec`
    * inactivity gap (the q75 semantics, derived here with an explicit
    * running sum so the batch oracle can replay it), render each
    * session's first `maxLen` events as an ordered `a>b>c` path string,
    * and report the top-`topK` paths by session count with share.
    *
    * Determinism: ordering ties break on event_id; the gap compares
    * µs-exact second diffs (timestamp cast double — the q145
    * equivalence); top-k orders on (n_sessions DESC, path), a total
    * order. Scale shape: the per-user windows share ONE shuffle; the
    * per-session buffer is capped at `maxLen` BEFORE the collect (a
    * bot's million-event session costs maxLen slots, not a megarow);
    * the path aggregation is bounded by the distinct-path count and
    * the final top-k is a TakeOrdered, never a global sort. */
  def sessionPaths(events: DataFrame, gapSec: Long = 1800,
      maxLen: Int = 20, topK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("pts").isNull ||
          col("ts").cast("double") - col("pts").cast("double") > gapSec.toDouble,
          1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(w))
    val w2 = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    val paths = sess
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= maxLen)
      .groupBy("user_id", "sess")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type))), s -> s.event_type), '>')")
        .as("path"))
      .localCheckpoint(eager = false) // consumers: path counts + total
    val tot = paths.agg(count(lit(1)).as("tot"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .crossJoin(broadcast(tot))
      .select(col("path"), col("n_sessions"),
        round(col("n_sessions").cast("double") / col("tot"), 6).as("share"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Rolling active users: DAU/WAU/MAU per day — each (user, active-day)
    * pair EXPANDS to the `w` window days it covers (w ∈ {1, 7, 30}),
    * collapses to distinct (user, window-day), and counts per day. The
    * standard distributed shape for distinct-over-sliding-window: the
    * explosion multiplies the DISTINCT (user, day) frame (≤ users×days
    * rows) by ≤ 30 — never the raw event stream — and every step is a
    * map-side-combined aggregation. Days with zero 30-day actives (a
    * >30-day gap) have no row; the reported range clips to the observed
    * [min, max] day so trailing windows don't run past the data. */
  def rollingActiveUsers(events: DataFrame): DataFrame = {
    val act = events.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint(eager = false) // consumers: 3 expansions + bounds
    val bounds = act.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    def winCount(w: Int, name: String): DataFrame = act
      .select(col("user_id"),
        explode(expr(s"sequence(0, ${w - 1})")).as("i"), col("d"))
      .select(col("user_id"), expr("date_add(d, i)").as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as(name))
    winCount(30, "mau")
      .join(winCount(7, "wau"), Seq("day"), "left")
      .join(winCount(1, "dau"), Seq("day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("day") >= col("d0") && col("day") <= col("d1"))
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"), col("mau"))
      .orderBy("day")
  }

  /** Per-user feature table (q180) — the feature-engineering export a
    * churn/LTV model trains on, assembled from shapes this module
    * already audits: volume (events, active days), recency, purchases
    * (DECIMAL money), inter-event cadence (DECIMAL mean gap), and a
    * WEEKLY ACTIVITY TREND — the OLS slope of ACTIVE DAYS PER WEEK over
    * the user's own week index (days, not raw events — a burst day
    * shouldn't read as a month of engagement), with EMPTY weeks included
    * as zeros (drop them and every user trends flat); all five OLS
    * sufficient sums are exact integers, so the slope is one
    * engine-identical expression.
    *
    * Scale shape: one per-user window pass (gaps), one groupBy (core
    * stats), and a week expansion bounded by span/7 per user (sequence
    * + explode — ≤ a few dozen cells per user at any corpus size);
    * everything joins back on user_id. */
  def userFeatures(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val winEnd = events.agg(max(col("ts")).as("w_end"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .withColumn("pts", lag(col("ts"), 1).over(w))
    val core = withGap.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"),
        max(col("ts")).as("last_ts"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))).as("monetary"),
        count(col("pts")).as("n_gaps"),
        sum(expr(
          "CAST(round(CAST(ts AS DOUBLE) - CAST(pts AS DOUBLE), 6) AS DECIMAL(18,6))"))
          .as("gap_sum"))
      .localCheckpoint(eager = false) // consumers: weeks expansion + output
    val days = events.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint(eager = false) // consumers: active count + week cells
    val active = days.groupBy("user_id").agg(count(lit(1)).as("active_days"))
    // weekly counts over the user's OWN week grid, empty weeks as zeros
    val grid = core.select(col("user_id"), col("first_day"),
        explode(expr("sequence(0, CAST(datediff(last_day, first_day) div 7 AS INT))"))
          .as("wk"))
    val wkCounts = days
      .join(core.select("user_id", "first_day"), Seq("user_id"))
      .groupBy(col("user_id"),
        expr("datediff(d, first_day) div 7").as("wk"))
      .agg(count(lit(1)).as("c"))
    val slope = grid.join(wkCounts, Seq("user_id", "wk"), "left")
      .select(col("user_id"), col("wk"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy("user_id").agg(
        count(lit(1)).as("nw"), sum(col("wk")).as("sw"),
        sum(col("wk") * col("wk")).as("sww"), sum(col("c")).as("sc"),
        sum(col("wk") * col("c")).as("swc"))
      .select(col("user_id"),
        when(col("nw") > 1, round(
          (col("nw") * col("swc") - col("sw") * col("sc")).cast("double")
            / (col("nw") * col("sww") - col("sw") * col("sw")), 6))
          .as("weekly_slope"))
    core.join(active, Seq("user_id"))
      .join(slope, Seq("user_id"))
      .crossJoin(broadcast(winEnd))
      .select(col("user_id"), col("n_events"), col("active_days"),
        col("first_day"), col("last_day"),
        floor((col("w_end").cast("double") - col("last_ts").cast("double"))
          / 86400.0).cast("long").as("recency_days"),
        col("n_purchases"),
        round(coalesce(col("monetary"), lit(0).cast("decimal(18,2)"))
          .cast("double"), 2).as("monetary"),
        // mean gap via FLOOR-of-microseconds integer division: a 6-dp
        // decimal sum over n can land exactly on a half (sum ..odd / 2),
        // where engine double-rounding diverges — integer div cannot
        when(col("n_gaps") > 0,
          expr("CAST(gap_sum * 1000000 AS BIGINT) div n_gaps").cast("double")
            / 1e6).as("mean_gap_s"),
        col("weekly_slope"))
      .orderBy("user_id")
  }

  /** Hash-split A/B conversion test (q191): users split into arms by
    * the engine-agnostic md5 parity of user_id (the q93/q190 split
    * discipline), per-arm conversion = purchasing users / users, and a
    * two-proportion z-test under the pooled rate — the
    * experimentation-platform primitive, and on a NON-experiment stream
    * an A/A test whose |z| ≥ 1.96 would flag a broken splitter.
    * All counts are exact integers; z is a fixed handful of
    * correctly-rounded IEEE ops (the q137 discipline — never a built-in
    * variance); significance is a boolean on the ROUNDED z so both
    * engines gate identically. */
  def abConversionTest(events: DataFrame): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7", "A")
          .otherwise("B"))
    // ONE conditional global aggregate, not filter-per-arm + crossJoin:
    // a global agg yields exactly one row even when an arm (or the whole
    // input) is empty — sum(when(...)) over zero matching rows is NULL,
    // matching the oracle's scalar subqueries; the filter+crossJoin form
    // yielded ZERO rows on an empty arm, a row-count divergence
    val t = users.agg(
      sum(when(col("arm") === "A", 1L)).as("n1"),
      sum(when(col("arm") === "A", col("converted"))).as("c1"),
      sum(when(col("arm") === "B", 1L)).as("n2"),
      sum(when(col("arm") === "B", col("converted"))).as("c2"))
    // nullif on every denominator: ANSI mode raises DIVIDE_BY_ZERO
    // even for rows a later predicate would drop, and an all-converted
    // (or empty) arm zeroes the pooled variance
    val p1 = col("c1").cast("double") / nullif(col("n1"), lit(0L))
    val p2 = col("c2").cast("double") / nullif(col("n2"), lit(0L))
    val pPool = (col("c1") + col("c2")).cast("double") /
      nullif(col("n1") + col("n2"), lit(0L))
    val z = (p1 - p2) /
      nullif(sqrt(pPool * (lit(1.0) - pPool)
        * (lit(1.0) / nullif(col("n1"), lit(0L))
          + lit(1.0) / nullif(col("n2"), lit(0L)))), lit(0.0))
    t.select(col("n1"), col("c1"), col("n2"), col("c2"),
        round(p1, 6).as("rate_a"), round(p2, 6).as("rate_b"),
        round(z, 6).as("z"),
        coalesce(abs(round(z, 6)) >= 1.96, lit(false)).as("significant_95"))
  }

  /** Bot-session detection: sessionize by the q154 inactivity gap, then
    * flag sessions whose volume AND rate exceed thresholds —
    * `n ≥ minEvents` and `n·60 > ratePerMin·duration` (the rate test
    * cross-multiplied so there is no division, and single-event /
    * zero-duration sessions can never divide by zero; they are only
    * flaggable through a burst of ≥ minEvents at one timestamp, where
    * duration 0 makes the inequality trivially true — the most extreme
    * burst there is). The standard pre-filter before any behavioral
    * statistic (a scraper's 10k-event session would dominate q131/q132
    * otherwise). One per-user window pass; per-session stats are plain
    * aggregates (no buffers); reported rate is null at duration 0. */
  def botSessions(events: DataFrame, gapSec: Long = 1800,
      minEvents: Long = 30, ratePerMin: Double = 10.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("pts").isNull ||
          col("ts").cast("double") - col("pts").cast("double") > gapSec.toDouble,
          1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(w))
    sess.groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts")).cast("double") - min(col("ts")).cast("double"))
          .as("dur"))
      .select(col("user_id"), col("sess"), col("n_events"),
        round(col("dur"), 6).as("duration_s"),
        round(col("n_events") * 60.0 / nullif(col("dur"), lit(0.0)), 6)
          .as("events_per_min"),
        (col("n_events") >= minEvents &&
          col("n_events") * 60.0 > lit(ratePerMin) * col("dur")).as("is_bot"))
      .orderBy("user_id", "sess")
  }

  /** Exponential-decay fit of the retention curve: pooled OLS of
    * ln(retention) on day offset over the q132 cells (offset ≥ 1,
    * retention > 0), in CLOSED FORM from five sufficient statistics —
    * slope, intercept, and the activity half-life −ln2/slope, the one
    * number a growth dashboard quotes. Σx/Σx² are exact integers; Σy
    * and Σxy sum 9-dp-rounded ln terms through DECIMAL (the q116/q143
    * discipline), so the normal equations see identical inputs on both
    * engines; a non-negative slope (no decay) yields NULL half-life
    * instead of a nonsense negative day count. */
  def retentionHalfLife(events: DataFrame): DataFrame = {
    val cells = retentionCohorts(events)
      .filter(col("day_offset") >= 1 && col("retention") > 0)
      .select(col("day_offset").cast("double").as("x"),
        round(log(col("retention")), 9).as("y"))
    val s = cells.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,6)")).as("sx"),
      sum((col("x") * col("x")).cast("decimal(18,6)")).as("sxx"),
      sum(col("y").cast("decimal(18,9)")).as("sy"),
      sum(expr("CAST(round(x * y, 9) AS DECIMAL(18,9))")).as("sxy"))
    val slope = (col("n") * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double")) /
      nullif(col("n") * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"), lit(0.0))
    s.select(col("n").as("n_cells"),
        round(slope, 6).as("slope"),
        round((col("sy").cast("double") - slope * col("sx").cast("double"))
          / col("n"), 6).as("intercept"),
        when(slope < 0,
          round(-log(lit(2.0)) / slope, 6)).as("half_life_days"))
  }

  /** Mergeable-sketch face of [[rollingActiveUsers]] — the 100 TB shape:
    * the exact face's window expansion multiplies the distinct
    * (user, day) frame ×30, which at billions of users is the dominant
    * shuffle; this face collapses each day to ONE fixed-size HLL sketch
    * (Apache DataSketches via hll_sketch_agg, the q89 machinery), then
    * every window estimate is a union of ≤ 30 per-day sketches — state
    * O(days·2^lgK) bytes, independent of user count, and the per-day
    * sketch table is exactly what an incremental pipeline persists
    * (sketch today's partition, union with stored sketches; never
    * re-read history). Sketching and union are deterministic, so the
    * result is golden-pinnable; EventAnalyticsSpec gates the estimates
    * against the exact face (lgK=12 → ~1.6% RSE). */
  def rollingActiveUsersSketch(events: DataFrame, lgK: Int = 12): DataFrame =
    rollingActivesFromDaily(
      dailyActiveSketches(events, lgK)
        .localCheckpoint(eager = false)) // consumers: 3 window unions + bounds

  /** [[rollingActiveUsersSketch]] under the engine-agnostic md5 HLL
    * register family (q169's declared face — [[Sketches.hllRegsMd5]]):
    * the per-day register frame is the persisted state, window union =
    * groupBy(day, reg) max (register max is associative — the same
    * mergeability the DataSketches lane relies on), and every estimate
    * is the exact scaled-integer harmonic sum DuckDB replays. The
    * DataSketches lane stays the production default, accuracy-gated. */
  def rollingActiveUsersHllMd5(events: DataFrame): DataFrame = {
    val daily = Sketches.hllRegsMd5(
        events.select(to_date(col("ts")).as("d"),
          col("user_id").cast("string").as("u")),
        Seq("d"), "u")
      .localCheckpoint(eager = false) // consumers: 3 window unions + bounds
    val bounds = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    def winEst(w: Int, name: String): DataFrame =
      Sketches.hllEstimateFromRegs(
          daily
            .select(explode(expr(s"sequence(0, ${w - 1})")).as("i"),
              col("d"), col("reg"), col("r"))
            .select(expr("date_add(d, i)").as("day"), col("reg"), col("r"))
            .groupBy("day", "reg").agg(max(col("r")).as("r")),
          Seq("day"))
        .select(col("day"), round(col("hll_est")).cast("long").as(name))
    winEst(30, "mau_est")
      .join(winEst(7, "wau_est"), Seq("day"), "left")
      .join(winEst(1, "dau_est"), Seq("day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("day") >= col("d0") && col("day") <= col("d1"))
      .select(col("day"), coalesce(col("dau_est"), lit(0L)).as("dau_est"),
        coalesce(col("wau_est"), lit(0L)).as("wau_est"), col("mau_est"))
      .orderBy("day")
  }

  /** The per-day sketch table (d, sk) — the ONLY state the rolling
    * estimates need, and what an incremental pipeline persists
    * ([[graft.streaming.Streams.activesSketchSinkQuery]] maintains it at
    * ingest: HLL insertion is idempotent and order-free, so replayed
    * batches merge to the identical sketch). */
  def dailyActiveSketches(events: DataFrame, lgK: Int = 12): DataFrame =
    events.select(to_date(col("ts")).as("d"), col("user_id"))
      .groupBy("d").agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))

  /** [[rollingActiveUsersSketch]] against a caller-supplied (possibly
    * persisted) per-day sketch table. */
  def rollingActivesFromDaily(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    def winEst(w: Int, name: String): DataFrame = daily
      .select(explode(expr(s"sequence(0, ${w - 1})")).as("i"), col("d"), col("sk"))
      .select(expr("date_add(d, i)").as("day"), col("sk"))
      .groupBy("day")
      .agg(round(expr("hll_sketch_estimate(hll_union_agg(sk))"))
        .cast("long").as(name))
    winEst(30, "mau_est")
      .join(winEst(7, "wau_est"), Seq("day"), "left")
      .join(winEst(1, "dau_est"), Seq("day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("day") >= col("d0") && col("day") <= col("d1"))
      .select(col("day"), coalesce(col("dau_est"), lit(0L)).as("dau_est"),
        coalesce(col("wau_est"), lit(0L)).as("wau_est"), col("mau_est"))
      .orderBy("day")
  }

  /** Last-touch attribution: each purchase's value attributes to the
    * user's most recent PRECEDING non-purchase event type (the
    * "channel"); purchases with no prior touch land on 'none'. One
    * per-user window pass (ignore-nulls last over the preceding frame,
    * ties on event_id), then a types-sized aggregation; the value total
    * rides a one-row broadcast so shares divide in-engine. Values sum
    * through DECIMAL(18,2) — engine summation order cannot drift. */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val purchases = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("none")).as("touch_type"),
        col("value"))
    val byTouch = purchases.groupBy("touch_type")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
      .localCheckpoint(eager = false) // consumers: total + output
    val total = byTouch.agg(sum(col("v")).as("vt"))
    byTouch.crossJoin(broadcast(total))
      .select(col("touch_type"), col("n_purchases"),
        round(col("v").cast("double"), 2).as("attributed_value"),
        round(col("v").cast("double") / col("vt").cast("double"), 6)
          .as("value_share"))
      .orderBy("touch_type")
  }

  /** Cohort LTV curve: users bucket by first-active day (the q132
    * cohort); per (cohort, day-offset), purchase revenue and its
    * running total, plus LTV per cohort user — the lifetime-value
    * complement of retention (q132 counts WHO comes back, this sums
    * WHAT they spend). Revenue sums ride DECIMAL(18,2) end-to-end
    * (the cumulative window included), so engine summation order
    * cannot drift; the window runs on the cohort×offset frame. */
  def ltvCurve(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstDay = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
      .localCheckpoint(eager = false) // consumers: sizes + revenue join
    val sizes = firstDay.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    val rev = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
      .join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(sizes, Seq("cohort_day"))
      .withColumn("cum_rev", sum(col("rev")).over(w))
      .select(col("cohort_day"), col("day_offset"),
        round(col("rev").cast("double"), 2).as("revenue"),
        round(col("cum_rev").cast("double"), 2).as("cum_revenue"),
        col("cohort_size"),
        round(col("cum_rev").cast("double") / col("cohort_size"), 6)
          .as("ltv_per_user"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Inter-event gap labels in ladder order — shared between the Spark
    * face and the generated oracle CASE so the buckets cannot drift. */
  private[graft] val gapBuckets: Seq[(String, Double)] = Seq(
    "0_lt_1s" -> 1.0, "1_1s_1m" -> 60.0, "2_1m_10m" -> 600.0,
    "3_10m_1h" -> 3600.0, "4_1h_1d" -> 86400.0)
  private[graft] val gapLastBucket = "5_ge_1d"

  /** Inter-event gap histogram: consecutive same-user gaps (ties on
    * event_id) bucketed on a fixed duration ladder, with counts, share,
    * and a DECIMAL-summed mean per bucket — the arrival-process audit
    * that picks sessionization gaps (q75/q154's 30-minute parameter is
    * a read of THIS distribution). One per-user window pass; the
    * histogram is ladder-sized; total rides a one-row broadcast. */
  def interEventGaps(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val caseExpr = gapBuckets.map { case (label, ub) =>
      s"WHEN gap_s < $ub THEN '$label'"
    }.mkString("CASE ", " ", s" ELSE '$gapLastBucket' END")
    val gaps = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .filter(col("pts").isNotNull)
      .select((col("ts").cast("double") - col("pts").cast("double")).as("gap_s"))
      .select(expr(caseExpr).as("bucket"), col("gap_s"))
    val hist = gaps.groupBy("bucket").agg(
        count(lit(1)).as("n_gaps"),
        sum(expr("CAST(round(gap_s, 6) AS DECIMAL(18,6))")).as("gsum"))
      .localCheckpoint(eager = false) // consumers: total + output
    val total = hist.agg(sum(col("n_gaps")).as("nt"))
    hist.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_gaps"),
        round(col("n_gaps").cast("double") / col("nt"), 6).as("share"),
        round(col("gsum").cast("double") / col("n_gaps"), 6).as("mean_gap_s"))
      .orderBy("bucket")
  }

  private def gapOracleSql: String = {
    val caseSql = gapBuckets.map { case (label, ub) =>
      s"WHEN gap_s < $ub THEN '$label'"
    }.mkString("CASE ", " ", s" ELSE '$gapLastBucket' END")
    s"""WITH o AS (SELECT user_id, ts, event_id,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
       |  FROM events),
       |g AS (SELECT epoch(ts) - epoch(pts) AS gap_s FROM o WHERE pts IS NOT NULL),
       |h AS (SELECT $caseSql AS bucket, count(*) AS n_gaps,
       |        sum(CAST(round(gap_s, 6) AS DECIMAL(18,6))) AS gsum
       |      FROM g GROUP BY 1),
       |t AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS nt FROM h)
       |SELECT bucket, n_gaps,
       |  round(CAST(n_gaps AS DOUBLE) / nt, 6) AS share,
       |  round(CAST(gsum AS DOUBLE) / n_gaps, 6) AS mean_gap_s
       |FROM h CROSS JOIN t ORDER BY bucket""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- cohort LTV curve: per-cohort cumulative purchase revenue by
    //      day offset, DECIMAL end-to-end. ----
    "q166_ltv_curve" -> QueryDef.sql(
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |           FROM events GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1),
        |r AS (SELECT cohort_day,
        |        date_diff('day', cohort_day, CAST(e.ts AS DATE)) AS day_offset,
        |        sum(CAST(value AS DECIMAL(18,2))) AS rev
        |      FROM events e JOIN f USING (user_id)
        |      WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT *, sum(rev) OVER (PARTITION BY cohort_day ORDER BY day_offset
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |      FROM r)
        |SELECT cohort_day, day_offset,
        |  round(CAST(rev AS DOUBLE), 2) AS revenue,
        |  round(CAST(cum_rev AS DOUBLE), 2) AS cum_revenue,
        |  cohort_size,
        |  round(CAST(cum_rev AS DOUBLE) / cohort_size, 6) AS ltv_per_user
        |FROM c JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_offset""") { (s, dir) =>
      ltvCurve(Tables.events(s, dir))
    },

    // ---- inter-event gap histogram: the arrival-process audit behind
    //      the sessionization gap parameter. ----
    "q168_interevent_gaps" -> QueryDef.sql(gapOracleSql) { (s, dir) =>
      interEventGaps(Tables.events(s, dir))
    },

    // ---- per-user feature table: volume, recency, money, cadence, and
    //      a weekly activity trend with empty weeks as zeros. ----
    "q180_user_features" -> QueryDef.sql(
      """WITH base AS (SELECT user_id, ts, event_id, event_type, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |w AS (SELECT max(ts) AS w_end FROM events),
        |core AS (SELECT user_id, count(*) AS n_events,
        |    min(CAST(ts AS DATE)) AS first_day,
        |    max(CAST(ts AS DATE)) AS last_day,
        |    max(ts) AS last_ts,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS monetary,
        |    count(pts) AS n_gaps,
        |    sum(CAST(round(epoch(ts) - epoch(pts), 6) AS DECIMAL(18,6))) AS gap_sum
        |  FROM base GROUP BY 1),
        |days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |act AS (SELECT user_id, count(*) AS active_days FROM days GROUP BY 1),
        |grid AS (SELECT user_id, CAST(i AS BIGINT) AS wk
        |  FROM core, unnest(range(0, date_diff('day', first_day, last_day) // 7 + 1)) t(i)),
        |wc AS (SELECT days.user_id,
        |    date_diff('day', first_day, d) // 7 AS wk, count(*) AS c
        |  FROM days JOIN core USING (user_id) GROUP BY 1, 2),
        |sl AS (SELECT user_id, count(*) AS nw,
        |    CAST(sum(wk) AS BIGINT) AS sw, CAST(sum(wk * wk) AS BIGINT) AS sww,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(wk * c) AS BIGINT) AS swc
        |  FROM (SELECT grid.user_id, grid.wk, coalesce(wc.c, 0) AS c
        |        FROM grid LEFT JOIN wc ON wc.user_id = grid.user_id AND wc.wk = grid.wk)
        |  GROUP BY 1)
        |SELECT core.user_id, n_events, active_days, first_day, last_day,
        |  CAST(floor((epoch(w_end) - epoch(last_ts)) / 86400.0) AS BIGINT) AS recency_days,
        |  n_purchases,
        |  round(CAST(coalesce(monetary, 0) AS DOUBLE), 2) AS monetary,
        |  CASE WHEN n_gaps > 0 THEN
        |    CAST(CAST(gap_sum * 1000000 AS BIGINT) // n_gaps AS DOUBLE) / 1e6 END AS mean_gap_s,
        |  CASE WHEN nw > 1 THEN round(
        |    CAST(nw * swc - sw * sc AS DOUBLE) / (nw * sww - sw * sw), 6) END
        |    AS weekly_slope
        |FROM core JOIN act USING (user_id) JOIN sl ON sl.user_id = core.user_id
        |CROSS JOIN w ORDER BY core.user_id""") { (s, dir) =>
      userFeatures(Tables.events(s, dir))
    },

    // ---- attribution-window funnel: q131 with each stage bounded to
    //      24 h behind the previous one — unbounded funnels overstate
    //      conversion by the organic tail. ----
    "q178_windowed_funnel" -> QueryDef.sql(
      funnelOracleSqlWith(Some(86400L))) { (s, dir) =>
      eventFunnel(Tables.events(s, dir), maxLagSec = Some(86400L))
    },

    // ---- hash-split A/B conversion z-test: the experimentation
    //      primitive; doubles as an A/A splitter check. ----
    "q191_ab_conversion_test" -> QueryDef.sql(
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |g AS (SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS c
        |      FROM u GROUP BY 1),
        |w AS (SELECT
        |    (SELECT n FROM g WHERE arm = 'A') AS n1,
        |    (SELECT c FROM g WHERE arm = 'A') AS c1,
        |    (SELECT n FROM g WHERE arm = 'B') AS n2,
        |    (SELECT c FROM g WHERE arm = 'B') AS c2),
        |s AS (SELECT *,
        |    CAST(c1 AS DOUBLE) / nullif(n1, 0) AS p1,
        |    CAST(c2 AS DOUBLE) / nullif(n2, 0) AS p2,
        |    CAST(c1 + c2 AS DOUBLE) / nullif(n1 + n2, 0) AS pp
        |  FROM w),
        |zz AS (SELECT *,
        |    round((p1 - p2) / nullif(sqrt(pp * (1.0 - pp)
        |      * (1.0 / nullif(n1, 0) + 1.0 / nullif(n2, 0))), 0.0), 6) AS z
        |  FROM s)
        |SELECT n1, c1, n2, c2,
        |  round(p1, 6) AS rate_a, round(p2, 6) AS rate_b, z,
        |  coalesce(abs(z) >= 1.96, false) AS significant_95
        |FROM zz""") { (s, dir) =>
      abConversionTest(Tables.events(s, dir))
    },

    // ---- bot-session detection: volume + cross-multiplied rate gate
    //      over inactivity sessions. ----
    "q176_bot_sessions" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |s AS (SELECT *, sum(CASE WHEN pts IS NULL
        |      OR epoch(ts) - epoch(pts) > 1800.0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM o),
        |g AS (SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events,
        |        epoch(max(ts)) - epoch(min(ts)) AS dur
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id, sess, n_events,
        |  round(dur, 6) AS duration_s,
        |  round(n_events * 60.0 / nullif(dur, 0.0), 6) AS events_per_min,
        |  n_events >= 30 AND n_events * 60.0 > 10.0 * dur AS is_bot
        |FROM g ORDER BY user_id, sess""") { (s, dir) =>
      botSessions(Tables.events(s, dir))
    },

    // ---- retention half-life: closed-form OLS of ln(retention) on day
    //      offset over the q132 cells; −ln2/slope. ----
    "q174_retention_halflife" -> QueryDef.sql(
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1),
        |c AS (SELECT cohort_day, date_diff('day', cohort_day, d) AS day_offset,
        |        count(*) AS n_active
        |      FROM act JOIN f USING (user_id) GROUP BY 1, 2),
        |rc AS (SELECT c.cohort_day, day_offset,
        |         round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |       FROM c JOIN sz USING (cohort_day)),
        |cells AS (SELECT CAST(day_offset AS DOUBLE) AS x,
        |            round(ln(retention), 9) AS y
        |          FROM rc WHERE day_offset >= 1 AND retention > 0),
        |s AS (SELECT count(*) AS n,
        |        sum(CAST(x AS DECIMAL(18,6))) AS sx,
        |        sum(CAST(x * x AS DECIMAL(18,6))) AS sxx,
        |        sum(CAST(y AS DECIMAL(18,9))) AS sy,
        |        sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS sxy
        |      FROM cells),
        |sl AS (SELECT n,
        |         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |           / nullif(n * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope_raw,
        |         CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
        |       FROM s)
        |SELECT n AS n_cells, round(slope_raw, 6) AS slope,
        |  round((syd - slope_raw * sxd) / n, 6) AS intercept,
        |  CASE WHEN slope_raw < 0 THEN round(-ln(2.0) / slope_raw, 6) END
        |    AS half_life_days
        |FROM sl""") { (s, dir) =>
      retentionHalfLife(Tables.events(s, dir))
    },

    // ---- sketch face of q161: per-day HLL sketches, window unions —
    //      O(days) state at any user count. ORACLE-CHECKED via the md5
    //      register family: DuckDB replays the per-day registers, the
    //      window register-max unions, and every corrected estimate.
    //      The DataSketches lane ([[rollingActiveUsersSketch]]) stays
    //      the production default, accuracy-gated in the spec. ----
    "q169_rolling_actives_sketch" -> QueryDef.sql(
      s"""WITH act AS (SELECT CAST(ts AS DATE) AS d, CAST(user_id AS VARCHAR) AS u FROM events),
         |regs AS (${Sketches.hllRegsSql("act", "d", "u")}),
         |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM regs),
         |m30 AS (SELECT d + CAST(i AS INTEGER) AS day, reg, max(r) AS r
         |        FROM regs, unnest(range(0, 30)) t(i) GROUP BY 1, 2),
         |m7 AS (SELECT d + CAST(i AS INTEGER) AS day, reg, max(r) AS r
         |       FROM regs, unnest(range(0, 7)) t(i) GROUP BY 1, 2),
         |m1 AS (SELECT d AS day, reg, r FROM regs),
         |e30 AS (SELECT day, CAST(round(est) AS BIGINT) AS mau_est
         |        FROM (${Sketches.hllEstimateSql("m30", "day", "est")}) x),
         |e7 AS (SELECT day, CAST(round(est) AS BIGINT) AS wau_est
         |       FROM (${Sketches.hllEstimateSql("m7", "day", "est")}) x),
         |e1 AS (SELECT day, CAST(round(est) AS BIGINT) AS dau_est
         |       FROM (${Sketches.hllEstimateSql("m1", "day", "est")}) x)
         |SELECT e30.day AS day, coalesce(e1.dau_est, 0) AS dau_est,
         |  coalesce(e7.wau_est, 0) AS wau_est, e30.mau_est AS mau_est
         |FROM e30 LEFT JOIN e7 ON e7.day = e30.day
         |LEFT JOIN e1 ON e1.day = e30.day, b
         |WHERE e30.day >= b.d0 AND e30.day <= b.d1
         |ORDER BY day""") { (s, dir) =>
      rollingActiveUsersHllMd5(Tables.events(s, dir))
    },

    // ---- rolling DAU/WAU/MAU: sliding distinct-user windows via
    //      bounded expansion of the distinct (user, day) frame. ----
    "q161_rolling_active_users" -> QueryDef.sql(
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM act),
        |m AS (SELECT DISTINCT user_id, d + CAST(i AS INTEGER) AS day
        |      FROM act, unnest(range(0, 30)) t(i)),
        |w AS (SELECT DISTINCT user_id, d + CAST(i AS INTEGER) AS day
        |      FROM act, unnest(range(0, 7)) t(i)),
        |mau AS (SELECT day, count(*) AS mau FROM m GROUP BY 1),
        |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1),
        |dau AS (SELECT d AS day, count(*) AS dau FROM act GROUP BY 1)
        |SELECT day, coalesce(dau, 0) AS dau, coalesce(wau, 0) AS wau, mau
        |FROM mau LEFT JOIN wau USING (day) LEFT JOIN dau USING (day)
        |CROSS JOIN b
        |WHERE day >= d0 AND day <= d1
        |ORDER BY day""") { (s, dir) =>
      rollingActiveUsers(Tables.events(s, dir))
    },

    // ---- last-touch attribution: purchase value credited to the most
    //      recent preceding non-purchase event type per user. ----
    "q162_last_touch_attribution" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, ts, event_id, event_type, value,
        |    last_value(CASE WHEN event_type != 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events),
        |p AS (SELECT coalesce(touch, 'none') AS touch_type,
        |        CAST(value AS DECIMAL(18,2)) AS v
        |      FROM o WHERE event_type = 'purchase'),
        |g AS (SELECT touch_type, count(*) AS n_purchases, sum(v) AS v
        |      FROM p GROUP BY 1),
        |t AS (SELECT sum(v) AS vt FROM g)
        |SELECT touch_type, n_purchases,
        |  round(CAST(v AS DOUBLE), 2) AS attributed_value,
        |  round(CAST(v AS DOUBLE) / CAST(vt AS DOUBLE), 6) AS value_share
        |FROM g CROSS JOIN t ORDER BY touch_type""") { (s, dir) =>
      lastTouchAttribution(Tables.events(s, dir))
    },

    // ---- CDC → SCD2 state intervals: change points of each user's
    //      event-type stream as versioned validity ranges. ----
    "q151_scd2_intervals" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id FROM o
        |      WHERE prev_type IS NULL OR prev_type != event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  row_number() OVER w AS version,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""") { (s, dir) =>
      scdIntervals(Tables.events(s, dir))
    },

    // ---- RFM segmentation: quintile scores from hierarchical global
    //      ranks; the oracle's global windows prove them exact. ----
    "q153_rfm_segments" -> QueryDef.sql(
      """WITH p AS (SELECT user_id, max(ts) AS last_ts,
        |    count(*) AS frequency,
        |    sum(CAST(value AS DECIMAL(18,2))) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT max(ts) AS w_end FROM events),
        |m AS (SELECT user_id,
        |    CAST(floor((epoch(w_end) - epoch(last_ts)) / 86400.0) AS BIGINT) AS recency_days,
        |    frequency, monetary FROM p CROSS JOIN w),
        |n AS (SELECT count(*) AS n FROM m),
        |r AS (SELECT m.*, n.n,
        |    row_number() OVER (ORDER BY recency_days, user_id) AS rr,
        |    row_number() OVER (ORDER BY frequency, user_id) AS rf,
        |    row_number() OVER (ORDER BY monetary, user_id) AS rm
        |  FROM m CROSS JOIN n)
        |SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
        |  round(CAST(monetary AS DOUBLE), 2) AS monetary,
        |  5 - (5 * (rr - 1)) // n AS r_score,
        |  1 + (5 * (rf - 1)) // n AS f_score,
        |  1 + (5 * (rm - 1)) // n AS m_score,
        |  CAST(5 - (5 * (rr - 1)) // n AS VARCHAR)
        |    || CAST(1 + (5 * (rf - 1)) // n AS VARCHAR)
        |    || CAST(1 + (5 * (rm - 1)) // n AS VARCHAR) AS segment
        |FROM r ORDER BY user_id""") { (s, dir) =>
      rfmSegments(Tables.events(s, dir))
    },

    // ---- session path mining: top event-type sequences per inactivity
    //      session, capped per-session buffer, TakeOrdered top-k. ----
    "q154_session_paths" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |s AS (SELECT *, sum(CASE WHEN pts IS NULL
        |      OR epoch(ts) - epoch(pts) > 1800.0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM o),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
        |    ORDER BY ts, event_id) AS rn FROM s),
        |p AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM r WHERE rn <= 20 GROUP BY 1, 2),
        |c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1),
        |t AS (SELECT count(*) AS tot FROM p)
        |SELECT path, n_sessions,
        |  round(CAST(n_sessions AS DOUBLE) / tot, 6) AS share
        |FROM c CROSS JOIN t
        |ORDER BY n_sessions DESC, path LIMIT 50""") { (s, dir) =>
      sessionPaths(Tables.events(s, dir))
    },

    // ---- Kaplan–Meier time-to-conversion with right-censoring: the
    //      estimator that doesn't survivorship-bias the lag (q145's
    //      converters-only stats do). ----
    "q148_survival_curve" -> QueryDef.sql(
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v p
        |      ON e.user_id = p.user_id
        |      WHERE e.event_type = 'click' AND e.ts > p.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c q
        |      ON e.user_id = q.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > q.t2 GROUP BY 1),
        |w AS (SELECT max(ts) AS w_end FROM events),
        |obs AS (SELECT
        |    CAST(floor((CASE WHEN t3 IS NOT NULL THEN epoch(t3) - epoch(t1)
        |                ELSE epoch(w_end) - epoch(t1) END) / 3600.0) AS BIGINT) AS t,
        |    t3 IS NOT NULL AS converted
        |  FROM v LEFT JOIN p USING (user_id) CROSS JOIN w),
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS deaths,
        |    CAST(sum(CASE WHEN converted THEN 0 ELSE 1 END) AS BIGINT) AS censored
        |  FROM obs GROUP BY 1),
        |ar AS (SELECT *, CAST(sum(deaths + censored) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk
        |  FROM byt),
        |lf AS (SELECT *,
        |    CASE WHEN deaths > 0 AND deaths < at_risk
        |         THEN CAST(round(ln(1.0 - CAST(deaths AS DOUBLE) / at_risk), 9) AS DECIMAL(18,9))
        |         ELSE CAST(0 AS DECIMAL(18,9)) END AS lnf,
        |    max(CASE WHEN deaths = at_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed
        |  FROM ar)
        |SELECT t AS hour_offset, at_risk, deaths AS conversions, censored,
        |  CASE WHEN zeroed = 1 THEN 0.0 ELSE
        |    round(exp(CAST(sum(lnf) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) END AS surv
        |FROM lf ORDER BY hour_offset""") { (s, dir) =>
      conversionSurvival(Tables.events(s, dir))
    },

    // ---- event-type transition matrix: which consecutive paths
    //      actually happen, row-normalized. ----
    "q144_event_transitions" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT prev_type, sum(n) AS row_n FROM t GROUP BY 1)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / row_n, 6) AS share
        |FROM t JOIN rt USING (prev_type)
        |ORDER BY prev_type, next_type""") { (s, dir) =>
      eventTransitions(Tables.events(s, dir))
    },

    // ---- conversion lag: hours from first view to first qualifying
    //      purchase across the strict funnel, distribution stats. ----
    "q145_conversion_lag" -> QueryDef.sql(
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v p
        |      ON e.user_id = p.user_id
        |      WHERE e.event_type = 'click' AND e.ts > p.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c q
        |      ON e.user_id = q.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > q.t2 GROUP BY 1),
        |l AS (SELECT round((epoch(t3) - epoch(v.t1)) / 3600.0, 6) AS hours
        |      FROM p JOIN v ON p.user_id = v.user_id)
        |SELECT count(*) AS n_converted,
        |  round(CAST(sum(CAST(hours AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_hours,
        |  round(quantile_cont(hours, 0.5), 6) AS median_hours,
        |  round(quantile_cont(hours, 0.9), 6) AS p90_hours
        |FROM l""") { (s, dir) =>
      conversionLag(Tables.events(s, dir))
    },

    // ---- ordered funnel conversion: how many users did view, then
    //      click strictly after their first view, then purchase
    //      strictly after that first qualifying click. A cascade of
    //      min-aggregates — never a per-user sequence collect. ----
    "q131_event_funnel" -> QueryDef.sql(funnelOracleSql) { (s, dir) =>
      eventFunnel(Tables.events(s, dir))
    },

    // ---- trailing-window anomaly detection: per-(type, hour) count
    //      z-scores against the preceding 24 hours — integer frame sums
    //      so both engines derive identical statistics; a RANGE frame on
    //      the hour index, so stream gaps can't stretch the baseline. ----
    "q137_event_anomaly" -> QueryDef.sql(
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
        |    event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |wdw AS (SELECT *,
        |    sum(c) OVER tw AS sum_c,
        |    sum(c * c) OVER tw AS sum_c2,
        |    count(*) OVER tw AS n_trail
        |  FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hr
        |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |st AS (SELECT event_type, hour, c, n_trail,
        |    CAST(sum_c AS DOUBLE) / n_trail AS m,
        |    sqrt(CAST(n_trail * sum_c2 - sum_c * sum_c AS DOUBLE)
        |         / (n_trail * (n_trail - 1))) AS sd
        |  FROM wdw)
        |SELECT event_type, hour, c, n_trail,
        |  CASE WHEN n_trail >= 12 THEN round(m, 6) END AS trail_mean,
        |  CASE WHEN n_trail >= 12 THEN round(sd, 6) END AS trail_sd,
        |  CASE WHEN n_trail >= 12 THEN round((CAST(c AS DOUBLE) - m) / nullif(sd, 0.0), 6) END AS z,
        |  coalesce(n_trail >= 12
        |    AND abs(round((CAST(c AS DOUBLE) - m) / nullif(sd, 0.0), 6)) >= 2.0,
        |    false) AS anomaly
        |FROM st ORDER BY event_type, hour""") { (s, dir) =>
      eventAnomaly(Tables.events(s, dir))
    },

    // ---- day-cohort retention: the (cohort_day × day_offset) active-
    //      user matrix with per-cohort rates — the classic lifecycle
    //      audit over a landed event stream. ----
    "q132_retention_cohorts" -> QueryDef.sql(
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1),
        |c AS (SELECT cohort_day, date_diff('day', cohort_day, d) AS day_offset,
        |        count(*) AS n_active
        |      FROM act JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, n_active, cohort_size,
        |  round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM c JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_offset""") { (s, dir) =>
      retentionCohorts(Tables.events(s, dir))
    })
}
