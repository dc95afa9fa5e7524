package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
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
    * k+1 must happen strictly after the user's stage-k time; returns
    * the per-stage (user_id, t) frames, each behind a lazy barrier
    * (two consumers: the stage count and the next stage's join). */
  private def stageFrames(events: DataFrame): Seq[DataFrame] = {
    val first = events.filter(col("event_type") === funnelStages.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
      .localCheckpoint(eager = false)
    funnelStages.tail.foldLeft(Seq(first)) { case (acc, stage) =>
      val prev = acc.last
      val next = events.filter(col("event_type") === stage)
        .join(prev.withColumnRenamed("t", "t_prev"), Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
        .localCheckpoint(eager = false)
      acc :+ next
    }
  }

  /** Ordered funnel summary: one row per stage with the surviving user
    * count and conversion vs the first stage / vs the previous stage. */
  def eventFunnel(events: DataFrame): DataFrame = {
    val frames = stageFrames(events)
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

  private def funnelOracleSql: String = {
    // generated from funnelStages — one CTE per stage, then the summary
    val stageCtes = funnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = '$stage' GROUP BY 1)"
      else
        s"s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s$i p ON e.user_id = p.user_id WHERE e.event_type = '$stage' AND e.ts > p.t GROUP BY 1)"
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

  def defs: Map[String, QueryDef] = Map(

    // ---- ordered funnel conversion: how many users did view, then
    //      click strictly after their first view, then purchase
    //      strictly after that first qualifying click. A cascade of
    //      min-aggregates — never a per-user sequence collect. ----
    "q131_event_funnel" -> QueryDef.sql(funnelOracleSql) { (s, dir) =>
      eventFunnel(Tables.events(s, dir))
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
