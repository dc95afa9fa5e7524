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

  def defs: Map[String, QueryDef] = Map(

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
