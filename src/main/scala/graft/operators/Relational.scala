package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layer-B relational surface (SURVEY.md §2.11): the filter/join/agg/window/
  * sort/set-op/scalar inventory implied by the reference's provenance schema
  * and APS dossier query semantics (reference docs/Golden_Record_API_Dossiers
  * .md:458–491, 683–689), re-expressed as declarative DataFrame plans so
  * Catalyst handles pushdown, pruning, join selection and AQE.
  *
  * Scale notes (100 TB): every query here is shuffle-minimal by construction —
  * dimension joins are broadcast, fact-fact joins are equi-joins that AQE can
  * re-plan, aggregations are partial+final automatically, and no operator ever
  * collects to the driver. Filters/projections are plain column expressions so
  * they push into the parquet scan.
  */
object Relational {

  /** Exact decimal sum rendered as double — identical in Spark and DuckDB
    * regardless of row/partition order (double summation is order-sensitive;
    * decimal is exact). */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def d2(c: Column): Column = c.cast("decimal(18,2)")

  def defs: Map[String, QueryDef] = Map(

    // ---- aggregation: groupBy + partial/final agg (A*, §2.7/2.11) ----
    "q01_pricing_summary" -> QueryDef.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-12-31 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(d2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - d2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- filters: the APS operator set (F*, dossier :469–491) ----
    "q02_filter_predicates" -> QueryDef.sql(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'O'
        |  AND o_orderstatus != 'F'
        |  AND o_totalprice >= 1000.0 AND o_totalprice < 100000.0
        |  AND o_orderpriority LIKE '%URGENT%'
        |  AND o_orderpriority LIKE '1%'
        |  AND o_orderpriority LIKE '%URGENT'
        |  AND o_custkey IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
        |  AND o_orderdate IS NOT NULL
        |ORDER BY o_orderkey""") { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "O")
        .filter(col("o_orderstatus") =!= "F")
        .filter(col("o_totalprice") >= 1000.0 && col("o_totalprice") < 100000.0)
        .filter(col("o_orderpriority").contains("URGENT"))
        .filter(col("o_orderpriority").startsWith("1"))
        .filter(col("o_orderpriority").endsWith("URGENT"))
        .filter(col("o_custkey").isin(1L to 10L: _*))
        .filter(col("o_orderdate").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // ---- joins: multi-way equi join + agg + top-k (J*, §2.5) ----
    "q03_join_revenue_topk" -> QueryDef.sql(
      """SELECT c.c_custkey, c.c_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderstatus = 'O'
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""") { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      val l = Tables.lineitem(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
          sum(d2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - d2(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- joins: snowflake dims via explicit broadcast (100 TB: dims stay
    //      small, so these joins must never shuffle the fact table) ----
    "q04_join_broadcast_dims" -> QueryDef.sql(
      """SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
        |  count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY region_name, nation_name""") { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name").as("region_name"), n("n_name").as("nation_name"))
        .agg(dsum(col("o_totalprice")).as("total_sales"), count(lit(1)).as("n_orders"))
        .orderBy("region_name", "nation_name")
    },

    // ---- joins: left_anti — the reference's INSERT OR IGNORE dedup
    //      semantics (K2/J5, storage/db.py:76) ----
    "q05_join_anti" -> QueryDef.sql(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""") { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // ---- joins: left_semi (EXISTS) ----
    "q06_join_semi" -> QueryDef.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""") { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // ---- joins: left outer preserving unmatched rows ----
    "q07_join_left_outer" -> QueryDef.sql(
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
        |FROM customer c
        |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY c_custkey""") { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(d2(col("o_totalprice"))), lit(0)).cast("double").as("total_spend"))
        .orderBy("c_custkey")
    },

    // ---- joins: full outer ----
    "q08_join_full_outer" -> QueryDef.sql(
      """SELECT n.n_nationkey, s.s_suppkey, s.s_name
        |FROM nation n
        |FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
        |ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""") { (s, dir) =>
      val n = Tables.nation(s, dir)
      val sup = Tables.supplier(s, dir)
      n.join(sup, n("n_nationkey") === sup("s_nationkey"), "full_outer")
        .select(n("n_nationkey"), sup("s_suppkey"), sup("s_name"))
        .orderBy(col("n_nationkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
    },

    // ---- windows: row_number top-k per group (O5 pagination kin) ----
    "q09_window_topk_per_group" -> QueryDef.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // ---- windows: lag + running aggregate with frame ----
    "q10_window_running" -> QueryDef.sql(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  lag(o_totalprice) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  rank() OVER (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey) AS rk
        |FROM orders
        |WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir).filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(d2(col("o_totalprice"))).over(wf).cast("double").as("running_spend"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          rank().over(w).cast("long").as("rk"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    // ---- sort/limit/offset pagination (dossier :683–689) ----
    "q11_pagination" -> QueryDef.sql(
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn > 100 AND rn <= 150
        |ORDER BY rn""") { (s, dir) =>
      val w = Window.orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") > 100 && col("rn") <= 150)
        .orderBy("rn")
        .drop("rn")
    },

    // ---- keyset (seek) pagination: the scale path beside q11. q11's
    //      exact-offset contract needs a GLOBAL row_number — correct, but
    //      the window funnels the table through one partition. The page
    //      an actual pagination loop needs is "the pageSize rows after
    //      the last key I saw", which is a FILTER (pushable to the scan)
    //      + distributed top-k (TakeOrderedAndProject) — no window, no
    //      single-partition exchange, same cost at 100 TB as at 100 MB.
    //      PaginationSpec proves page-equivalence to q11's offset form. ----
    "q85_keyset_pagination" -> QueryDef.sql(
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderdate > TIMESTAMP '1995-06-15 00:00:00'
        |   OR (o_orderdate = TIMESTAMP '1995-06-15 00:00:00' AND o_orderkey > 1234)
        |ORDER BY o_orderdate, o_orderkey
        |LIMIT 50""") { (s, dir) =>
      keysetPage(
        Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_totalprice"),
        Seq("o_orderdate", "o_orderkey"),
        Some(Seq(lit(java.time.LocalDateTime.parse("1995-06-15T00:00:00")), lit(1234L))),
        pageSize = 50)
    },

    // ---- set ops: intersect / except / union distinct ----
    "q12_set_ops" -> QueryDef.sql(
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""") { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- grouping sets: rollup ----
    "q13_rollup" -> QueryDef.sql(
      """SELECT year(o_orderdate) AS order_year, o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
        |  count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
        |ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST""") { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(year(col("o_orderdate")).cast("long").as("order_year"), col("o_orderstatus"))
        .agg(dsum(col("o_totalprice")).as("total_sales"), count(lit(1)).as("n"))
        .orderBy(col("order_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    // ---- grouping sets: cube ----
    "q14_cube" -> QueryDef.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""") { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    // ---- distinct aggregation ----
    "q15_distinct_agg" -> QueryDef.sql(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // ---- scalar string functions (X2–X14) ----
    "q16_string_funcs" -> QueryDef.sql(
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  length(p_name) AS name_len
        |FROM part
        |WHERE p_partkey <= 200
        |ORDER BY p_partkey""") { (s, dir) =>
      Tables.part(s, dir).filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")
    },

    // ---- hash functions — the reference's content key (X0, sha256) ----
    "q17_hash_funcs" -> QueryDef.sql(
      """SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
        |FROM documents
        |WHERE doc_id <= 100
        |ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir).filter(col("doc_id") <= 100)
        .select(col("doc_id"),
          md5(col("text")).as("text_md5"),
          sha2(col("text"), 256).as("text_sha256"))
        .orderBy("doc_id")
    },

    // ---- date/time functions (X10/X11) ----
    "q18_date_funcs" -> QueryDef.sql(
      """SELECT CAST(o_orderdate AS DATE) AS order_date,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  count(*) AS n,
        |  CAST(o_orderdate + INTERVAL 2 DAY AS DATE) AS plus2d
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1995-03-01 00:00:00'
        |GROUP BY o_orderdate
        |ORDER BY order_date""") { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1995-03-01 00:00:00").cast("timestamp"))
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderdate").cast("date").as("order_date"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          col("n"),
          (col("o_orderdate") + expr("INTERVAL 2 DAYS")).cast("date").as("plus2d"))
        .orderBy("order_date")
    },

    // ---- json extraction (X12; events.props is a JSON string) ----
    "q19_json_funcs" -> QueryDef.sql(
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ---- explode / array ops: word count (§2.11 array fns) ----
    "q20_explode_wordcount" -> QueryDef.sql(
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word != ''
        |GROUP BY word
        |ORDER BY n DESC, word
        |LIMIT 50""") { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    },

    // ---- conditional expressions ----
    "q21_case_when" -> QueryDef.sql(
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS tier,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1
        |ORDER BY tier""") { (s, dir) =>
      Tables.orders(s, dir)
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("tier"),
          col("o_totalprice"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("tier")
    },

    // ---- non-equi (range/theta) join against an inline dimension ----
    "q22_range_join" -> QueryDef.sql(
      """SELECT t.tier, count(*) AS n
        |FROM orders o
        |JOIN (VALUES ('t1', 0.0, 100000.0),
        |             ('t2', 100000.0, 300000.0),
        |             ('t3', 300000.0, 1000000.0)) AS t(tier, lo, hi)
        |  ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
        |GROUP BY t.tier
        |ORDER BY t.tier""") { (s, dir) =>
      import s.implicits._
      val tiers = Seq(("t1", 0.0, 100000.0), ("t2", 100000.0, 300000.0),
        ("t3", 300000.0, 1000000.0)).toDF("tier", "lo", "hi")
      // tiny dim → broadcast nested-loop join; at 100 TB the fact side
      // streams through without a shuffle.
      Tables.orders(s, dir)
        .join(broadcast(tiers),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"))
        .orderBy("tier")
    },

    // ---- scalar subquery: compare to a global aggregate ----
    "q23_scalar_subquery" -> QueryDef.sql(
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                   FROM customer) * 1.5
        |ORDER BY c_custkey""") { (s, dir) =>
      val c = Tables.customer(s, dir)
      val avgBal = c.agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal") * 1.5)
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    },

    // ---- correlated EXISTS with predicate (semi join on filtered fact) ----
    "q24_exists_filtered" -> QueryDef.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |ORDER BY o_orderkey""") { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }
  )

  /** Lexicographic "after lastKey" predicate over `orderCols` under
    * Spark's default ASC NULLS FIRST ordering. Expanded OR form rather
    * than a struct comparison so the leading-column range predicate
    * reaches parquet row-group stats — the scan skips every file/
    * row-group entirely before the page.
    *
    * NULL-aware (a plain `c > k` is null-rejecting, which would silently
    * END pagination after the first page whenever an order key is NULL):
    * "strictly after k" under nulls-first is `(k IS NULL AND c IS NOT
    * NULL) OR c > k`, and ties use the null-safe `<=>` — both evaluate
    * correctly whether or not the anchor literal is NULL. */
  private[graft] def seekPredicate(orderCols: Seq[String], lastKey: Seq[Column]): Column = {
    require(orderCols.size == lastKey.size,
      s"lastKey arity ${lastKey.size} != orderCols arity ${orderCols.size}")
    orderCols.zip(lastKey).foldRight(lit(false)) { case ((c, k), rest) =>
      (isnull(k) && col(c).isNotNull) || (col(c) > k) || (col(c) <=> k && rest)
    }
  }

  /** Keyset (seek) pagination: the `pageSize` rows strictly AFTER
    * `lastKey` in `orderCols` order (None = first page). The ordering
    * must be total (include a unique key as the last column) or pages
    * can overlap at ties.
    *
    * This is the 100 TB pagination shape: filter + `limit` compiles to
    * a pushed scan predicate + distributed top-k
    * (TakeOrderedAndProject) — per-partition heaps of pageSize rows and
    * a driver merge, NO global window and NO single-partition exchange.
    * q11's offset form stays as the exact-offset contract (and its
    * oracle); a pagination LOOP should carry the last row's key into
    * the next call instead of re-ranking the table every page. */
  def keysetPage(rows: DataFrame, orderCols: Seq[String],
      lastKey: Option[Seq[Column]], pageSize: Int): DataFrame = {
    val after = lastKey match {
      case Some(k) => rows.filter(seekPredicate(orderCols, k))
      case None => rows
    }
    after.orderBy(orderCols.map(col): _*).limit(pageSize)
  }
}
