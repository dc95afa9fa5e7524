package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: point-in-time (as-of)
  * join and interval (range) join — the two shapes every event/lineage
  * pipeline eventually needs (reference analogue: the watermark-overlap
  * reconciliation family, dossier :692–725, which is an as-of lookup of
  * "state at ingest time").
  *
  * Both are built to the 100 TB rule: no cross products, no
  * BroadcastNestedLoopJoin. The as-of join is the union+window form — ONE
  * shuffle by key, linear in input, regardless of how many right rows
  * precede each left row (a naive `l.ts >= r.ts` join explodes
  * quadratically per key before its aggregate). The range join is the
  * binned form: intervals explode into fixed-width bins, points map to one
  * bin, and the match becomes an EQUI-join on (key, bin) + residual range
  * predicate — Catalyst plans SMJ/SHJ, never a nested loop.
  */
object TemporalJoins {

  /** As-of join: for every left row, the LATEST right row with the same
    * `key` and right.`ts` <= left.`ts` (inclusive), ties on `ts` broken by
    * the largest right `rightOrder`. Unmatched left rows keep null right
    * columns (left-outer semantics).
    *
    * Mechanics: tag sides, align schemas, union, then one window pass
    * per key ordered by (ts, side, rightOrder) taking `last(_, ignoreNulls)`
    * of each right payload column — right rows sort before left rows at
    * equal ts, so "at-or-before" is inclusive. One hash shuffle by `key`;
    * within a partition the window streams sorted rows, so skewed keys
    * degrade to a sort, not a blow-up.
    *
    * `tolerance` (an SQL INTERVAL body, e.g. "5 MINUTES") optionally nulls
    * out matches older than left.ts - tolerance — the standard staleness
    * guard. Requires `ts` in `rightPayload` to evaluate.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightOrder: String,
      rightPayload: Seq[String],
      prefix: String,
      tolerance: Option[String] = None): DataFrame =
    asofJoinKeys(left, right, Seq(key), ts, rightOrder, rightPayload,
      prefix, tolerance)

  /** Multi-key generalization of [[asofJoin]]: match on the conjunction of
    * `keys` (e.g. (user_id, region)). Same single-shuffle mechanics — the
    * hash partitioning is just wider. */
  def asofJoinKeys(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      rightOrder: String,
      rightPayload: Seq[String],
      prefix: String,
      tolerance: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(tolerance.isEmpty || rightPayload.contains(ts),
      s"tolerance needs '$ts' in rightPayload to evaluate staleness")
    val leftCols = left.columns.toSeq
    val payloadCols = rightPayload.map(c => s"$prefix$c")
    // aligned union schema: leftCols ++ __side ++ __ord ++ prefixed payload
    val lSel = leftCols.map(col) ++ Seq(
      lit(1).as("__side"), lit(null).cast("long").as("__ord")) ++
      rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"$prefix$c"))
    val rSel = leftCols.map { c =>
      if (keys.contains(c) || c == ts) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    } ++ Seq(lit(0).as("__side"), col(rightOrder).cast("long").as("__ord")) ++
      rightPayload.map(c => col(c).as(s"$prefix$c"))
    val unioned = left.select(lSel: _*).union(right.select(rSel: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val joined = matched.filter(col("__side") === 1).drop("__side", "__ord")
    tolerance match {
      case None => joined
      case Some(t) =>
        val fresh = col(s"$prefix$ts").isNotNull &&
          col(s"$prefix$ts") >= col(ts) - expr(s"INTERVAL $t")
        payloadCols.foldLeft(joined) { (df, c) =>
          df.withColumn(c, when(fresh, col(c)))
        }
    }
  }

  /** Binned range join: inner-join `points` (at `tsCol`) to `intervals`
    * ([`startCol`, `endCol`), end-exclusive) sharing `key`. Each interval
    * explodes into the `binSeconds`-wide epoch bins it covers; each point
    * maps to exactly ONE bin, so no dedup is needed post-join. The join is
    * a pure equi-join on (key, bin) with the range check as a residual
    * predicate — scales as a shuffle join, and bin width is the knob:
    * set it near the typical interval length so intervals span O(1) bins.
    *
    * Output: all interval columns + the point's ts and `pointPayload`
    * columns under `prefix`. */
  def rangeJoinBinned(
      intervals: DataFrame,
      points: DataFrame,
      key: String,
      startCol: String,
      endCol: String,
      tsCol: String,
      binSeconds: Long,
      pointPayload: Seq[String],
      prefix: String = "p_"): DataFrame = {
    require(binSeconds > 0, s"bin width must be positive, got $binSeconds")
    val binMicros = binSeconds * 1000000L
    def binOf(c: Column): Column = floorDiv(unix_micros(c), lit(binMicros))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)),
        floorDiv(unix_micros(col(endCol)) - 1, lit(binMicros)))))
    val pt = points.select(
      Seq(col(key).as("__pkey"), binOf(col(tsCol)).as("__bin"),
        col(tsCol).as(s"$prefix$tsCol")) ++
        pointPayload.map(c => col(c).as(s"$prefix$c")): _*)
    iv.join(pt,
        col(key) === col("__pkey") && iv("__bin") === pt("__bin") &&
          col(s"$prefix$tsCol") >= col(startCol) &&
          col(s"$prefix$tsCol") < col(endCol))
      .drop("__bin", "__pkey")
  }

  /** floor division that stays correct for negative epochs (pre-1970). */
  private def floorDiv(a: Column, b: Column): Column =
    floor(a.cast("decimal(28,6)") / b).cast("long")

  /** Interval×interval OVERLAP join over one interval relation
    * (id cols + `st`/`en` timestamps): every pair of intervals from
    * DIFFERENT `partCol` owners satisfying the strict overlap predicate
    * a.st < b.en AND b.st < a.en, with the overlap window and its
    * length. The third temporal-join shape (as-of = point lookup, q71 =
    * interval×point containment, this = interval×interval), and the one
    * concurrency/abuse analysis needs ("which sessions were live
    * simultaneously").
    *
    * 100 TB shape: both sides explode into fixed-width bins
    * (`binSeconds`) and the join is an EQUI-join on the bin — any
    * overlapping pair shares the bin of every instant inside its
    * overlap, so recall is exactly 1 — with the residual predicate
    * deciding truth and a distinct collapsing multi-bin matches. Bin
    * width is the skew/volume dial: per-bin pair work is (concurrent
    * intervals in bin)², the true output size for that bin. No cross
    * join, no BNLJ. Overlap length derives from exact integer
    * microseconds. */
  def intervalOverlapPairs(intervals: DataFrame, partCol: String,
      idCols: Seq[String], binSeconds: Long = 3600): DataFrame = {
    require(binSeconds > 0, s"bin width must be positive, got $binSeconds")
    val binMicros = binSeconds * 1000000L
    def binOf(c: Column): Column = floorDiv(unix_micros(c), lit(binMicros))
    val binned = intervals.withColumn("__bin",
      explode(sequence(binOf(col("st")), binOf(col("en")))))
    val aCols = (idCols :+ "st" :+ "en").map(c => col(s"a.$c").as(s"a_$c"))
    val bCols = (idCols :+ "st" :+ "en").map(c => col(s"b.$c").as(s"b_$c"))
    binned.as("a")
      .join(binned.as("b"),
        col("a.__bin") === col("b.__bin") &&
          col(s"a.$partCol") < col(s"b.$partCol") &&
          col("a.st") < col("b.en") && col("b.st") < col("a.en"))
      .select(aCols ++ bCols: _*)
      .distinct() // a pair overlaps in every bin its overlap spans
      .withColumn("o_start", greatest(col("a_st"), col("b_st")))
      .withColumn("o_end", least(col("a_en"), col("b_en")))
      .withColumn("overlap_s",
        round((unix_micros(col("o_end")) - unix_micros(col("o_start")))
          .cast("double") / 1e6, 6))
  }

  /** Per-user session intervals by the 1800 s inactivity gap (the
    * q154/q176 sessionization, reduced to its interval frame):
    * (user_id, sess, st, en). */
  def sessionIntervals(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("pts").isNull ||
          col("ts").cast("double") - col("pts").cast("double") > gapSec.toDouble,
          1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sess")
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
  }

  /** Concurrent-session pairs (q206): sessions of DIFFERENT users that
    * were live simultaneously, with the shared window — the
    * coordinated-account / load-concurrency primitive. One window pass
    * sessionizes; the interval frame sits behind a barrier (both join
    * sides read it); pairs come from the binned overlap equi-join. */
  def concurrentSessions(events: DataFrame, gapSec: Long = 1800,
      binSeconds: Long = 3600): DataFrame = {
    val iv = sessionIntervals(events, gapSec)
      .localCheckpoint(eager = false) // consumers: both sides of the bin join
    intervalOverlapPairs(iv, "user_id", Seq("user_id", "sess"), binSeconds)
      .select(col("a_user_id").as("u1"), col("a_sess").as("s1"),
        col("b_user_id").as("u2"), col("b_sess").as("s2"),
        round(unix_micros(col("o_start")).cast("double") / 1e6, 6).as("o_start_s"),
        round(unix_micros(col("o_end")).cast("double") / 1e6, 6).as("o_end_s"),
        col("overlap_s"))
      .orderBy("u1", "s1", "u2", "s2")
  }

  /** q206's exact output from a PERSISTED interval frame (user_id, st,
    * en) — the face the streaming session-interval store answers (see
    * [[graft.streaming.Streams.sessionIntervalsSinkQuery]]). The sess
    * ordinal is re-derived as the per-user rank by session start, which
    * equals the batch fold's running counter (session k+1 always starts
    * after session k ends). StreamingSpec pins pair-for-pair equality
    * with [[concurrentSessions]] across micro-batch boundaries. */
  def concurrentSessionsFromIntervals(iv: DataFrame,
      binSeconds: Long = 3600): DataFrame = {
    val numbered = iv
      .withColumn("sess", row_number().over(
        Window.partitionBy("user_id").orderBy("st", "en")).cast("long"))
      .select("user_id", "sess", "st", "en")
      .localCheckpoint(eager = false) // consumers: both sides of the bin join
    intervalOverlapPairs(numbered, "user_id", Seq("user_id", "sess"), binSeconds)
      .select(col("a_user_id").as("u1"), col("a_sess").as("s1"),
        col("b_user_id").as("u2"), col("b_sess").as("s2"),
        round(unix_micros(col("o_start")).cast("double") / 1e6, 6).as("o_start_s"),
        round(unix_micros(col("o_end")).cast("double") / 1e6, 6).as("o_end_s"),
        col("overlap_s"))
      .orderBy("u1", "s1", "u2", "s2")
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- interval×interval overlap join: concurrent sessions across
    //      users from the binned equi-join (recall exactly 1 — any
    //      overlapping pair shares the bin of every instant in its
    //      overlap); the oracle states the same semantics as the naive
    //      quadratic predicate join. ----
    "q206_concurrent_sessions" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |s AS (SELECT *, sum(CASE WHEN pts IS NULL
        |      OR epoch(ts) - epoch(pts) > 1800.0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM o),
        |g AS (SELECT user_id, CAST(sess AS BIGINT) AS sess,
        |        min(ts) AS st, max(ts) AS en
        |      FROM s GROUP BY 1, 2)
        |SELECT a.user_id AS u1, a.sess AS s1, b.user_id AS u2, b.sess AS s2,
        |  round(CAST(epoch_us(greatest(a.st, b.st)) AS DOUBLE) / 1000000, 6) AS o_start_s,
        |  round(CAST(epoch_us(least(a.en, b.en)) AS DOUBLE) / 1000000, 6) AS o_end_s,
        |  round(CAST(epoch_us(least(a.en, b.en))
        |    - epoch_us(greatest(a.st, b.st)) AS DOUBLE) / 1000000, 6) AS overlap_s
        |FROM g a JOIN g b
        |  ON a.user_id < b.user_id AND a.st < b.en AND b.st < a.en
        |ORDER BY u1, s1, u2, s2""") { (s, dir) =>
      concurrentSessions(Tables.events(s, dir))
    },

    // ---- as-of join (point-in-time): each click joined to the same
    //      user's latest view at-or-before it. Oracle: window-deduped
    //      inequality join (deterministic tie-break), the declarative
    //      statement of the same semantics; DuckDB's ASOF JOIN would leave
    //      ties engine-defined. ----
    "q70_asof_join" -> QueryDef.sql(
      """WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'),
        |j AS (SELECT c.event_id, c.user_id, c.ts, c.value,
        |        v.event_id AS view_event_id, v.ts AS view_ts, v.value AS view_value,
        |        row_number() OVER (PARTITION BY c.event_id
        |                           ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |      FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts)
        |SELECT event_id, user_id, ts, value, view_event_id, view_ts, view_value
        |FROM j WHERE rn = 1 ORDER BY event_id""") { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      asofJoin(clicks, views, key = "user_id", ts = "ts",
        rightOrder = "event_id", rightPayload = Seq("event_id", "ts", "value"),
        prefix = "view_")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("value"),
          col("view_event_id"),
          col("view_ts").cast("timestamp_ntz").as("view_ts"), col("view_value"))
        .orderBy("event_id")
    },

    // ---- range join (interval containment): clicks landing inside each
    //      error's 6-hour incident window (sized so the sf0.01 gate has
    //      ~230 groups, not a single row), per user — binned to an
    //      equi-join on (user_id, 5-min bin). Decimal-summed like q36 so
    //      the double total is order-independent cross-engine. ----
    "q71_range_join_binned" -> QueryDef.sql(
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, count(*) AS n_clicks,
        |  CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM e JOIN c ON c.user_id = e.user_id
        |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 6 HOUR
        |GROUP BY 1, 2 ORDER BY e.event_id""") { (s, dir) =>
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("ts") + expr("INTERVAL 6 HOURS")).as("window_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      rangeJoinBinned(errors, clicks, key = "user_id",
        startCol = "ts", endCol = "window_end", tsCol = "ts",
        binSeconds = 21600L, pointPayload = Seq("value"))
        .groupBy("event_id", "user_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("p_value").cast("decimal(18,2)")).cast("double").as("click_value"))
        .orderBy("event_id")
    }
  )
}
