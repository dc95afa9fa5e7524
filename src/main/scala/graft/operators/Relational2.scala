package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layer-B surface, batch 2 (SURVEY.md §2.11): grouping sets, cross joins,
  * union-by-name, struct/map construction+access, higher-order array
  * functions, moment statistics via exact decimal sums, percentiles,
  * approximate distinct counting, event-time incremental dedup in batch form
  * (reference dossier :692–725), and the remaining window functions.
  */
object Relational2 {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  def defs: Map[String, QueryDef] = Map(

    // ---- explicit grouping sets ----
    "q25_grouping_sets" -> QueryDef.sql(
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""") { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer_gs")
      s.sql(
        """SELECT c_mktsegment, c_nationkey, count(*) AS n,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
          |FROM customer_gs
          |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin)
    },

    // ---- cross join (small × small only; at scale this is always a
    //      broadcast nested loop over a tiny side) ----
    "q26_cross_join" -> QueryDef.sql(
      """SELECT r.r_name, n.n_name
        |FROM region r CROSS JOIN nation n
        |ORDER BY r.r_name, n.n_name""") { (s, dir) =>
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // ---- union all of heterogeneous sources, aligned by name ----
    "q27_union_by_name" -> QueryDef.sql(
      """SELECT * FROM (
        |  SELECT c_custkey AS entity_key, 'customer' AS kind, c_acctbal AS bal FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS entity_key, 'supplier' AS kind, s_acctbal AS bal FROM supplier) t
        |ORDER BY kind, entity_key""") { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("entity_key"), lit("customer").as("kind"),
          col("c_acctbal").as("bal"))
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("entity_key"), lit("supplier").as("kind"),
          col("s_acctbal").as("bal"))
      c.unionByName(sup).orderBy("kind", "entity_key")
    },

    // ---- struct + map construction and access (flat output for the
    //      oracle; exercises named_struct/map/element_at/getField) ----
    "q28_struct_map_ops" -> QueryDef.sql(
      """SELECT o_orderkey,
        |  o_totalprice AS price_from_struct,
        |  o_orderstatus AS status_from_map
        |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""") { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderkey") <= 100)
        .select(col("o_orderkey"),
          struct(col("o_totalprice").as("price"), col("o_orderdate").as("dt")).as("ostruct"),
          map(lit("status"), col("o_orderstatus"), lit("prio"), col("o_orderpriority")).as("omap"))
        .select(col("o_orderkey"),
          col("ostruct").getField("price").as("price_from_struct"),
          element_at(col("omap"), "status").as("status_from_map"))
        .orderBy("o_orderkey")
    },

    // ---- higher-order array functions: transform / filter / sort ----
    "q29_higher_order_array" -> QueryDef.sql(
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long_words,
        |  list_sort(list_filter(string_split(text, ' '), x -> x != ''))[1] AS first_word
        |FROM documents WHERE doc_id <= 200 ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir).filter(col("doc_id") <= 200)
        .select(col("doc_id"),
          size(filter(split(col("text"), " "), w => length(w) > 4)).cast("long").as("n_long_words"),
          element_at(array_sort(filter(split(col("text"), " "), w => w =!= "")), 1)
            .as("first_word"))
        .orderBy("doc_id")
    },

    // ---- moment statistics via exact decimal sums (double sums are
    //      order-sensitive; this form is deterministic on both engines) ----
    // NOTE: raw second moments are NOT emitted — at large n the decimal
    // sum exceeds double's integer-exact range (2^53) and engines'
    // decimal→double conversions can differ by an ulp (observed ±0.5 at
    // ~1.2e16, sf0.1). The derived variance survives: the ulp-level input
    // difference cancels to ~1e-15 relative error, absorbed by rounding.
    "q30_variance_exact" -> QueryDef.sql(
      """SELECT o_orderstatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  round((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) / (count(*) - 1), 2) AS var_samp,
        |  round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) / (count(*) - 1)), 4) AS stddev_samp
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      val d = col("o_totalprice").cast("decimal(18,2)")
      val s1 = sum(d).cast("double")
      val s2 = sum(d * d).cast("double")
      val n = count(lit(1))
      val variance = (s2 - s1 * s1 / n) / (n - lit(1))
      Tables.orders(s, dir).groupBy("o_orderstatus")
        .agg(n.as("n"), s1.as("s1"),
          round(variance, 2).as("var_samp"),
          round(sqrt(variance), 4).as("stddev_samp"))
        .orderBy("o_orderstatus")
    },

    // ---- exact interpolated percentiles ----
    // ---- exact percentiles, interpolation-convention-proof: both sides
    //      implement the SAME explicit linear interpolation at rank
    //      t = 1 + p*(n-1) over row_number positions, instead of trusting
    //      Spark `percentile` and DuckDB `quantile_cont` to agree (their
    //      conventions differ by a cent at some group sizes — NEXT.md
    //      judgment call; q47 pins the median-only variant) ----
    "q31_percentiles" -> QueryDef.sql(
      """WITH o AS (
        |  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |sel AS (
        |  SELECT o.l_returnflag, ps.p, 1 + ps.p * (o.n - 1) AS t, o.v
        |  FROM o CROSS JOIN (SELECT * FROM (VALUES (0.25), (0.5)) t(p)) ps
        |  WHERE o.rn = CAST(floor(1 + ps.p * (o.n - 1)) AS BIGINT)
        |     OR o.rn = CAST(ceil(1 + ps.p * (o.n - 1)) AS BIGINT)),
        |q AS (
        |  SELECT l_returnflag, p,
        |    CASE WHEN count(*) = 1 THEN min(v)
        |         ELSE min(v) + (max(v) - min(v)) * (min(t) - floor(min(t)))
        |    END AS val
        |  FROM sel GROUP BY l_returnflag, p)
        |SELECT q.l_returnflag,
        |  round(max(CASE WHEN p = 0.5 THEN val END), 6) AS median_qty,
        |  round(max(CASE WHEN p = 0.25 THEN val END), 6) AS p25_qty,
        |  min(mm.min_qty) AS min_qty, max(mm.max_qty) AS max_qty
        |FROM q JOIN (SELECT l_returnflag, min(l_quantity) AS min_qty,
        |               max(l_quantity) AS max_qty
        |             FROM lineitem GROUP BY l_returnflag) mm
        |  ON mm.l_returnflag = q.l_returnflag
        |GROUP BY q.l_returnflag ORDER BY q.l_returnflag""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o = li
        .select(col("l_returnflag"), col("l_quantity").cast("double").as("v"),
          col("l_quantity"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("l_quantity")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      val sel = o.crossJoin(Seq(0.25, 0.5).toDF("p"))
        .withColumn("t", lit(1.0) + col("p") * (col("n") - 1))
        .filter(col("rn") === floor(col("t")) || col("rn") === ceil(col("t")))
      val q = sel.groupBy("l_returnflag", "p")
        .agg(when(count(lit(1)) === 1, min("v"))
          .otherwise(min("v") + (max("v") - min("v")) * (min("t") - floor(min("t"))))
          .as("val"))
      val piv = q.groupBy("l_returnflag")
        .agg(round(max(when(col("p") === 0.5, col("val"))), 6).as("median_qty"),
          round(max(when(col("p") === 0.25, col("val"))), 6).as("p25_qty"))
      val mm = li.groupBy("l_returnflag")
        .agg(min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"))
      piv.join(mm, "l_returnflag")
        .select(col("l_returnflag"), col("median_qty"), col("p25_qty"),
          col("min_qty"), col("max_qty"))
        .orderBy("l_returnflag")
    },

    // ---- approximate distinct counting: oracle checks the exact count and
    //      that the HLL estimate lands within 10% (sketch values themselves
    //      are engine-specific, so the bound is the contract) ----
    "q32_approx_count_distinct" -> QueryDef.sql(
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS exact_nd,
        |  true AS approx_within_10pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      Tables.orders(s, dir).groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("exact_nd"),
          approx_count_distinct(col("o_custkey")).as("approx_nd"))
        .select(col("o_orderstatus"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")) <=
            col("exact_nd") * 0.10).as("approx_within_10pct"))
        .orderBy("o_orderstatus")
    },

    // ---- event-time incremental sync, batch form (T2/T3, dossier
    //      :692–725): rows inside max(ts)-48h, deduped per key keeping the
    //      earliest — the watermark+overlap+dedupe contract ----
    "q33_watermark_batch_dedup" -> QueryDef.sql(
      """WITH wm AS (SELECT max(ts) - INTERVAL 48 HOUR AS cutoff FROM events),
        |ranked AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events, wm WHERE ts >= wm.cutoff)
        |SELECT user_id, event_type, ts_us, event_id
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id, event_type""") { (s, dir) =>
      val ev = Tables.events(s, dir)
      val cutoff = ev.agg((max(col("ts")) - expr("INTERVAL 48 HOURS")).as("cutoff"))
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      ev.join(broadcast(cutoff))
        .filter(col("ts") >= col("cutoff"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy("user_id", "event_type")
    },

    // ---- remaining window functions: first/last value with frames,
    //      dense_rank, ntile, percent_rank ----
    "q34_window_first_last" -> QueryDef.sql(
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir).filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(wFull).as("last_ok"),
          dense_rank().over(Window.partitionBy("o_custkey").orderBy("o_orderstatus"))
            .cast("long").as("status_rank"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .drop("o_orderdate")
    },

    // ---- scalar strings, batch 2: translate/reverse/repeat/instr/
    //      split_part/initcap/left/right ----
    "q45_string_funcs2" -> QueryDef.sql(
      """SELECT p_partkey,
        |  translate(p_brand, '#', '-') AS brand_dashed,
        |  reverse(p_type) AS type_reversed,
        |  repeat(p_brand, 2) AS brand_twice,
        |  CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  left(p_name, 3) AS name_left3,
        |  right(p_name, 3) AS name_right3
        |FROM part WHERE p_partkey <= 150 ORDER BY p_partkey""") { (s, dir) =>
      Tables.part(s, dir).filter(col("p_partkey") <= 150)
        .select(col("p_partkey"),
          translate(col("p_brand"), "#", "-").as("brand_dashed"),
          reverse(col("p_type")).as("type_reversed"),
          repeat(col("p_brand"), 2).as("brand_twice"),
          instr(col("p_name"), "a").cast("long").as("first_a"),
          coalesce(element_at(split(col("p_type"), " "), 1), lit(""))
            .as("type_head"),
          substring(col("p_name"), 1, 3).as("name_left3"),
          expr("right(p_name, 3)").as("name_right3"))
        .orderBy("p_partkey")
    },

    // ---- scalar dates, batch 2: datediff/add_months/last_day/day-of-week
    //      (Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday — aligned
    //      by subtracting 1 on the Spark side) ----
    "q46_date_funcs2" -> QueryDef.sql(
      """SELECT o_orderkey,
        |  date_diff('day', o_orderdate, TIMESTAMP '2001-12-31 00:00:00') AS days_to_eoy,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""") { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          datediff(lit("2001-12-31").cast("date"), col("o_orderdate"))
            .cast("long").as("days_to_eoy"),
          add_months(col("o_orderdate"), 3).as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .orderBy("o_orderkey")
    },

    // ---- min/max over orderable non-numeric types + conditional agg ----
    "q35_minmax_conditional_agg" -> QueryDef.sql(
      """SELECT o_orderstatus,
        |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
        |  min(o_orderpriority) AS min_prio, max(o_orderpriority) AS max_prio,
        |  count(CASE WHEN o_totalprice > 250000 THEN 1 END) AS n_big,
        |  CAST(sum(CASE WHEN o_totalprice > 250000 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      val big = col("o_totalprice") > 250000
      Tables.orders(s, dir).groupBy("o_orderstatus")
        .agg(
          min("o_orderdate").as("first_date"), max("o_orderdate").as("last_date"),
          min("o_orderpriority").as("min_prio"), max("o_orderpriority").as("max_prio"),
          count(when(big, 1)).as("n_big"),
          sum(when(big, col("o_totalprice").cast("decimal(18,2)"))).cast("double")
            .as("big_total"))
        .orderBy("o_orderstatus")
    }
  )
}
