package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Layer-B surface, batch 3: approximate quantiles with a bounded-error
  * oracle, histogram binning, correlation from exact decimal moments,
  * regexp group extraction, and null-handling semantics over outer-join
  * generated nulls.
  */
object Relational3 {

  private def d2(c: Column): Column = c.cast("decimal(18,2)")

  def defs: Map[String, QueryDef] = Map(

    // ---- approximate percentile: like q32, the sketch value is
    //      engine-specific, so the oracle checks the exact quantile plus a
    //      relative-error bound on the estimate ----
    // exact median from explicit integer row positions (lower/upper middle
    // of the sorted group) — engines disagree on continuous-quantile
    // interpolation conventions at some group sizes, so the oracle-exact
    // value must avoid interpolation entirely
    "q47_approx_percentile" -> QueryDef.sql(
      """WITH o AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |med AS (
        |  SELECT l_returnflag,
        |    round(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS exact_median
        |  FROM o WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, exact_median, true AS approx_within_2pct
        |FROM med ORDER BY l_returnflag""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag")
        .orderBy("v", "l_orderkey", "l_linenumber")
      val ranked = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice").as("v"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      val med = ranked
        .filter(col("rn") === (col("n") + 1).divide(2).cast("long") ||
          col("rn") === (col("n") + 2).divide(2).cast("long"))
        .groupBy("l_returnflag")
        .agg(round(sum(col("v").cast("decimal(18,2)")).cast("double") / count(lit(1)), 2)
          .as("exact_median"))
      val approx = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_median"))
      med.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_median"),
          (abs(col("approx_median") - col("exact_median")) <=
            col("exact_median") * 0.02).as("approx_within_2pct"))
        .orderBy("l_returnflag")
    },

    // ---- histogram binning (fixed-width buckets via floor arithmetic —
    //      identical IEEE division on both engines) ----
    "q48_histogram" -> QueryDef.sql(
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(CAST(min(o_totalprice) AS DOUBLE), 2) AS lo,
        |  round(CAST(max(o_totalprice) AS DOUBLE), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""") { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("bucket")
    },

    // ---- Pearson correlation from exact decimal moments (built-in corr()
    //      sums doubles in partition order — not cross-engine stable; this
    //      form is) ----
    "q49_corr_exact" -> QueryDef.sql(
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) /
        |        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""") { (s, dir) =>
      val x = d2(col("l_quantity"))
      val y = d2(col("l_extendedprice"))
      val m = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"), sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
      m.select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // ---- regexp group extraction ----
    "q59_regexp_extract" -> QueryDef.sql(
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
        |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first_word,
        |  CAST(regexp_matches(p_name, '[0-9]') AS BOOLEAN) AS name_has_digit
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""") { (s, dir) =>
      Tables.part(s, dir).filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("long")
            .as("brand_num"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_first_word"),
          col("p_name").rlike("[0-9]").as("name_has_digit"))
        .orderBy("p_partkey")
    },

    // ---- pivot: long → wide (oracle expresses the same reshape as
    //      conditional aggregation; pivot's absent cells null-fill to 0) ----
    "q63_pivot" -> QueryDef.sql(
      """SELECT year(o_orderdate) AS order_year,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
        |FROM orders GROUP BY 1 ORDER BY order_year""") { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("O", "F", "P"))
        .select(col("order_year"), col("O").as("n_open"),
          col("F").as("n_finished"), col("P").as("n_pending"))
        .orderBy("order_year")
    },

    // ---- unpivot: wide → long (melt) ----
    "q64_unpivot" -> QueryDef.sql(
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part) t
        |WHERE p_partkey <= 200
        |ORDER BY p_partkey, metric""") { (s, dir) =>
      Tables.part(s, dir).filter(col("p_partkey") <= 200)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .orderBy("p_partkey", "metric")
    },

    // ---- null semantics over outer-join generated nulls: coalesce /
    //      nullif / null-safe equality ----
    "q61_null_semantics" -> QueryDef.sql(
      """SELECT n.n_nationkey,
        |  coalesce(s.s_name, 'no_supplier') AS supplier_name,
        |  coalesce(s.s_acctbal, -1.0) AS bal_or_default,
        |  nullif(n.n_regionkey, 0) AS region_nz,
        |  (s.s_suppkey IS NOT DISTINCT FROM NULL) AS is_unmatched
        |FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
        |ORDER BY n_nationkey, supplier_name""") { (s, dir) =>
      val n = Tables.nation(s, dir)
      val sup = Tables.supplier(s, dir)
      n.join(sup, n("n_nationkey") === sup("s_nationkey"), "left")
        .select(n("n_nationkey"),
          coalesce(col("s_name"), lit("no_supplier")).as("supplier_name"),
          coalesce(col("s_acctbal"), lit(-1.0)).as("bal_or_default"),
          nullif(col("n_regionkey"), lit(0)).as("region_nz"),
          (col("s_suppkey") <=> lit(null)).as("is_unmatched"))
        .orderBy("n_nationkey", "supplier_name")
    }
  )
}
