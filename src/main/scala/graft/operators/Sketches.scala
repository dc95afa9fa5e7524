package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.SketchAggs.{MinKAgg, MisraGriesAgg}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory sketch operators whose FINAL answers are exact — the
  * two-pass pattern: a mergeable fixed-size summary prunes the corpus to
  * a small candidate set, then an exact pass over the candidates produces
  * the answer a direct (but unscalable-by-memory or unscalable-by-sort)
  * query would. Because the answers are exact, both carry a plain-SQL
  * DuckDB oracle — the sketch is invisible in the result, only in the
  * plan (the q92 hashed-face discipline, applied to aggregation).
  *
  *  - q127 exact heavy-hitter tokens: Misra–Gries candidates (capacity
  *    counters per partition buffer) + an exact broadcast-semi-join
  *    rescore. The direct form's groupBy shuffles every distinct token;
  *    this form's corpus-sized aggregation is capped at capacity entries
  *    per map task regardless of vocabulary size.
  *  - q128 exact per-source bottom-k sample: a min-k Aggregator whose
  *    partial buffers are ≤ k rows — the shuffle carries k × partitions
  *    rows per source instead of the whole corpus, and no per-source
  *    sort ever happens (the row_number window face — also implemented,
  *    and pinned equal in the spec — sorts every group).
  */
object Sketches {

  private def words(c: Column): Column = Text.words(c)

  // ---------------------------------------------------------------------
  // Engine-agnostic relational HyperLogLog (the md5 register family):
  // registers and estimates expressed in plain column arithmetic so the
  // DuckDB oracle replays the ENTIRE sketch — the q123 bit-array trade
  // applied to HLL (Flajolet et al. 2007). Fixed p = 12 (m = 4096
  // registers): register index = the first 3 md5 hex chars, rank = 1 +
  // leading zeros of the next 48 bits (49 − bit length, 49 when zero).
  // The harmonic sum is EXACT integer arithmetic — each register
  // contributes 2^(60−r) (absent registers r = 0 contribute 2^60), summed
  // as DECIMAL(38,0) (max 4096·2^60 = 2^72 < 10^38), so both engines
  // divide the identical numerator by the identical denominator: one
  // IEEE division, no order-dependent float summation. Small-range
  // (linear-counting) correction applies below 2.5·m as in the paper;
  // its ln() is the only libm call and sits behind a 3-dp round.
  // Estimates carry the standard ±1.04/√m ≈ 1.6% band, gated in-suite
  // against exact countDistinct; the DataSketches hll_sketch_agg lanes
  // (q89/q98/q169's production forms) stay available on the same shapes.
  // ---------------------------------------------------------------------

  /** alpha_m · m² · 2^60 for m = 4096, as ONE shared literal (computed
    * once as 0.7213/(1 + 1.079/4096) · 4096² · 2^60; both engines parse
    * the shortest-round-trip decimal to the identical double). */
  private[operators] val hllNumerator: Double = 1.3948296730802328e25
  private[operators] val hllNumeratorSql: String = "1.3948296730802328e25"

  /** (keys..., reg, r): max-rank HLL registers of `itemCol` grouped by
    * `keys`. Feed straight to [[hllEstimateFromRegs]], or window-union
    * register frames first (register max is associative/commutative —
    * union = groupBy max, the mergeability HLL is built on). */
  private[operators] def hllRegsMd5(items: DataFrame, keys: Seq[String],
      itemCol: String): DataFrame =
    items
      .withColumn("mh", md5(col(itemCol)))
      .withColumn("reg", expr("CAST(conv(substring(mh, 1, 3), 16, 10) AS INT)"))
      .withColumn("v", expr("CAST(conv(substring(mh, 4, 12), 16, 10) AS BIGINT)"))
      .withColumn("rk", when(col("v") === 0, lit(49))
        .otherwise(lit(49) - length(expr("conv(v, 10, 2)"))))
      .groupBy((keys :+ "reg").map(col): _*)
      .agg(max(col("rk")).as("r"))

  /** (keys..., hll_est): the corrected HLL estimate from a register
    * frame — raw harmonic estimate via the exact scaled-integer sum,
    * linear counting below 2.5·m when zero registers remain. */
  private[operators] def hllEstimateFromRegs(regs: DataFrame,
      keys: Seq[String]): DataFrame =
    regs.groupBy(keys.map(col): _*)
      .agg(sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 60 - r) AS DECIMAL(38,0))"))
          .as("spresent"),
        count(lit(1)).as("pcount"))
      .withColumn("vz", lit(4096L) - col("pcount"))
      .withColumn("ssum", col("spresent")
        + col("vz").cast("decimal(10,0)")
          * lit(1152921504606846976L).cast("decimal(19,0)"))
      .withColumn("e_raw", lit(hllNumerator) / col("ssum").cast("double"))
      .withColumn("hll_est",
        when(col("vz") > 0 && col("e_raw") <= lit(10240.0),
          lit(4096.0) * log(lit(4096.0) / col("vz").cast("double")))
          .otherwise(col("e_raw")))
      .select((keys.map(col) :+ col("hll_est")): _*)

  /** DuckDB mirror of [[hllRegsMd5]]: a `SELECT` over relation `src`
    * (whose item column is `item`), producing (keys..., reg, r). */
  private[operators] def hllRegsSql(src: String, keys: String,
      item: String): String =
    s"""SELECT $keys, CAST(('0x' || substr(md5($item), 1, 3)) AS BIGINT) AS reg,
       |  max(CASE WHEN CAST(('0x' || substr(md5($item), 4, 12)) AS BIGINT) = 0 THEN 49
       |       ELSE 49 - length(ltrim(bin(CAST(('0x' || substr(md5($item), 4, 12)) AS BIGINT)), '0')) END) AS r
       |FROM $src GROUP BY ALL""".stripMargin

  /** DuckDB mirror of [[hllEstimateFromRegs]]: a `SELECT` over a
    * register relation `src`, producing (keys..., `out`). */
  private[operators] def hllEstimateSql(src: String, keys: String,
      out: String): String =
    s"""SELECT $keys,
       |  CASE WHEN vz > 0 AND e_raw <= 10240.0
       |       THEN 4096.0 * ln(4096.0 / CAST(vz AS DOUBLE)) ELSE e_raw END AS $out
       |FROM (SELECT $keys, vz, $hllNumeratorSql / CAST(ssum AS DOUBLE) AS e_raw
       |      FROM (SELECT $keys, 4096 - count(*) AS vz,
       |              sum(CAST((CAST(1 AS BIGINT) << (60 - r)) AS DECIMAL(38,0)))
       |                + CAST(4096 - count(*) AS DECIMAL(10,0))
       |                  * CAST(1152921504606846976 AS DECIMAL(19,0)) AS ssum
       |            FROM $src GROUP BY ALL) hs) he""".stripMargin

  /** Exact tokens with frequency share > phi, found via Misra–Gries
    * candidate pruning + exact rescore. Requires phi > 1/(capacity+1)
    * (the MG completeness bound — every token above the threshold is
    * guaranteed to be a candidate, so the rescored result is EXACT). */
  def mgHeavyHitters(docs: DataFrame, phi: Double = 0.03,
      capacity: Int = 64): DataFrame = {
    require(phi > 1.0 / (capacity + 1),
      s"phi=$phi below MG completeness bound for capacity=$capacity")
    val toks = docs.select(explode(words(col("text"))).as("w"))
    // pass 1: candidates + the total count from ONE corpus scan
    val mgUdaf = udaf(new MisraGriesAgg(capacity))
    val summary = toks.agg(mgUdaf(col("w")).as("summary"),
      count(lit(1)).as("n"))
    val pinned = summary.localCheckpoint(eager = false) // 2 consumers
    val cands = pinned.select(explode(map_keys(col("summary"))).as("w"))
    val nRow = pinned.select(col("n"))
    // pass 2: exact counts over candidates only — the per-token shuffle
    // is bounded by capacity, not vocabulary
    toks.join(broadcast(cands), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(nRow))
      .filter(col("c") > lit(phi) * col("n"))
      .select(col("w"), col("c"),
        round(col("c").cast("double") / col("n"), 6).as("share"))
  }

  /** Map-side top-k per group (q175): the bounded-buffer AGGREGATOR
    * face of the q09 window pattern — top `k` orders per customer by
    * (o_totalprice DESC, o_orderkey). The window face shuffles EVERY
    * row to its group's partition and sorts whole groups; this face
    * reduces to ≤ k rows per group per input partition before the
    * exchange (ObjectHashAggregate partials), so shuffle volume is
    * O(groups·k), not O(rows) — the difference at a 100 TB fact table
    * with hot customers. Ordering rides the q135 fixed-width-string
    * trick: skey = zero-padded DECIMAL(18,2) string of (10⁷ − price),
    * so lexicographic ascending = price descending, ties on o_orderkey
    * (prices are < 10⁷ here; re-anchor the constant for wider domains).
    * Output prices come from a join-back on o_orderkey, so values are
    * byte-identical to the window face (spec-pinned; the oracle is
    * q09's SQL). */
  def topKOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val keyed = orders.select(
        col("o_custkey").cast("string").as("g"),
        lpad((lit(new java.math.BigDecimal(10000000)).cast("decimal(18,2)")
          - col("o_totalprice").cast("decimal(18,2)")).cast("string"), 12, "0")
          .as("skey"),
        col("o_orderkey"), lit(0L).as("pay"))
      .as[(String, String, Long, Long)]
    val picks = keyed.groupByKey(_._1)
      .agg(new graft.functions.SketchAggs.MinKRowAgg(k).toColumn.name("picks"))
      .toDF("g", "picks")
      .select(col("g").cast("long").as("o_custkey"),
        posexplode(col("picks")).as(Seq("pos", "pick")))
      .select(col("o_custkey"), col("pick._2").as("o_orderkey"),
        (col("pos") + 1).cast("long").as("rn"))
    picks.join(orders.select(col("o_orderkey"), col("o_totalprice")), "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Deterministic exact bottom-k sample per source, ordered by
    * (md5(doc_id), doc_id) — the engine-agnostic hash coin the sampling
    * family uses (q76/q107), but with an EXACT per-group size. */
  def minKSamplePerSource(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("source"),
        md5(col("doc_id").cast("string")).as("skey"), col("doc_id"))
      .as[(String, String, Long)]
    keyed.groupByKey(_._1)
      .agg(new MinKAgg(k).toColumn.name("picks"))
      .toDF("source", "picks")
      .select(col("source"), posexplode(col("picks")).as(Seq("pos", "pick")))
      .select(col("source"), col("pick._2").as("doc_id"),
        (col("pos") + 1).cast("long").as("sample_rank"))
  }

  /** The window face of [[minKSamplePerSource]] — same rows by
    * construction; exists so the spec can pin agreement and PlanSpec can
    * document the shape difference (per-group sort vs bounded buffers). */
  def windowSamplePerSource(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("source"), col("doc_id"),
        row_number().over(w).cast("long").as("sample_rank"))
      .filter(col("sample_rank") <= k)
  }

  /** Efraimidis–Spirakis weighted sample without replacement (2006):
    * the exact top-k per source by key u^(1/w), where u is the q104
    * multiplicative-hash coin and w the document's weight (chars here) —
    * heavier docs win proportionally more often, which is the weighted
    * counterpart of q128's uniform sample.
    *
    * Determinism: the key rounds to DECIMAL(18,9) (pow's last-ulp can
    * differ across libm implementations — the q107 n^α discipline) and
    * ties break on doc_id. The bounded aggregator buffers order by the
    * FIXED-WIDTH "%.9f" rendering of (1 − key): values lie in [0, 1], so
    * the lexicographic string order IS the numeric order, ascending
    * (1 − key) = descending key — [[graft.functions.SketchAggs.MinKRowAgg]]
    * reused unchanged. Zero-weight docs are excluded (their key is
    * pow(u, ∞) → ill-defined; E–S assigns them probability 0 anyway). */
  def weightedSamplePerSource(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = esKeyed(docs)
      .select(col("source"),
        // DECIMAL-to-string keeps the full scale ("0.123456789"), so the
        // string is fixed-width past "0." and lexicographic = numeric
        (lit(java.math.BigDecimal.ONE).cast("decimal(18,9)") - col("es_key"))
          .cast("string").as("skey"),
        col("doc_id"), col("w"))
      .as[(String, String, Long, Long)]
    keyed.groupByKey(_._1)
      .agg(new graft.functions.SketchAggs.MinKRowAgg(k).toColumn.name("picks"))
      .toDF("source", "picks")
      .select(col("source"), posexplode(col("picks")).as(Seq("pos", "pick")))
      .select(col("source"), col("pick._2").as("doc_id"),
        col("pick._3").as("weight"),
        round(lit(1.0) - col("pick._1").cast("double"), 9).as("es_key"),
        (col("pos") + 1).cast("long").as("sample_rank"))
  }

  /** The window face of [[weightedSamplePerSource]] — same rows by
    * construction (spec-pinned); the per-group sort shape the oracle SQL
    * mirrors. */
  def windowWeightedSamplePerSource(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("es_key").desc, col("doc_id"))
    esKeyed(docs)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("source"), col("doc_id"), col("w").as("weight"),
        col("es_key").cast("double").as("es_key"), col("sample_rank"))
  }

  /** (source, doc_id, w, es_key DECIMAL(18,9)) — shared by both faces. */
  private def esKeyed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("w"),
        (((col("doc_id") * lit(2654435761L)) % lit(4294967296L)).cast("double")
          / lit(4294967296.0)).as("u"))
      .filter(col("w") > 0)
      .select(col("source"), col("doc_id"), col("w"),
        round(pow(col("u"), lit(1.0) / col("w")), 9).cast("decimal(18,9)")
          .as("es_key"))

  /** Label-balanced undersampling: every label keeps exactly
    * min-class-count rows, picked in deterministic (md5(vec_id), vec_id)
    * hash order — the class-balancing step before training a classifier
    * on skewed labels (the q128 sampling discipline, with the per-group
    * quota DERIVED from the data instead of fixed).
    *
    * Scale shape: one bounded agg for class counts (labels-sized, its
    * min on a one-row broadcast), one per-label window shuffle for the
    * ranks. The quota isn't known until runtime, so the bounded min-k
    * aggregator (fixed k) doesn't apply — at 100 TB the window's
    * per-label sort is the cost, and a two-pass form (rank threshold via
    * distributed selection) would replace it if a single label dominated
    * the corpus. */
  def labelBalancedSample(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mn = embeddings.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("mn"))
    val w = Window.partitionBy("label")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    embeddings.select(col("vec_id"), col("label"))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(mn))
      .filter(col("pick_rank") <= col("mn"))
      .select(col("vec_id"), col("label"), col("pick_rank"))
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- label-balanced undersample: every class down to the smallest
    //      class's count, deterministic hash order. ----
    "q138_label_balance" -> QueryDef.sql(
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (SELECT vec_id, label,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick_rank
        |  FROM embeddings)
        |SELECT vec_id, label, pick_rank FROM r CROSS JOIN m
        |WHERE pick_rank <= mn ORDER BY vec_id""") { (s, dir) =>
      labelBalancedSample(Tables.embeddings(s, dir)).orderBy("vec_id")
    },

    // ---- weighted sample without replacement: exact per-source top-k
    //      by the E–S key, via the bounded min-k aggregator (never a
    //      per-group sort); the oracle is the window form. ----
    "q135_weighted_sample" -> QueryDef.sql(
      """WITH f AS (SELECT doc_id, source, length(text) AS w,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
        |  FROM documents),
        |k AS (SELECT doc_id, source, w,
        |    CAST(round(pow(u, 1.0 / w), 9) AS DECIMAL(18,9)) AS es_key
        |  FROM f WHERE w > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY es_key DESC, doc_id) AS rn FROM k)
        |SELECT source, doc_id, w AS weight, CAST(es_key AS DOUBLE) AS es_key,
        |  rn AS sample_rank
        |FROM r WHERE rn <= 10 ORDER BY source, sample_rank""") { (s, dir) =>
      weightedSamplePerSource(Tables.documents(s, dir), k = 10)
        .orderBy("source", "sample_rank")
    },

    // ---- exact heavy-hitter tokens via Misra–Gries + rescore. The
    //      oracle is the direct group-by-having — the sketch must be
    //      invisible in the result. ----
    "q127_heavy_hitters" -> QueryDef.sql(
      """WITH w AS (SELECT list_filter(string_split(trim(text),' '), x -> x != '') AS ws
        |           FROM documents),
        |t AS (SELECT unnest(ws) AS w FROM w),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT t.w AS w, count(*) AS c,
        |  round(CAST(count(*) AS DOUBLE) / n.n, 6) AS share
        |FROM t, n GROUP BY t.w, n.n HAVING count(*) > 0.03 * n.n
        |ORDER BY w""") { (s, dir) =>
      mgHeavyHitters(Tables.documents(s, dir), phi = 0.03, capacity = 64)
        .orderBy("w")
    },

    // ---- map-side top-k per group: the bounded-buffer aggregator face
    //      of q09 — O(groups·k) shuffle instead of O(rows); the oracle
    //      is the window formulation. ----
    "q175_topk_per_group_agg" -> QueryDef.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""") { (s, dir) =>
      topKOrdersPerCustomer(Tables.orders(s, dir))
    },

    // ---- exact per-source bottom-k sample (deterministic hash order)
    //      via the min-k Aggregator; oracle is the window form. ----
    "q128_mink_sample" -> QueryDef.sql(
      """WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents)
        |SELECT source, doc_id, sample_rank FROM r WHERE sample_rank <= 10
        |ORDER BY source, sample_rank""") { (s, dir) =>
      minKSamplePerSource(Tables.documents(s, dir), k = 10)
        .orderBy("source", "sample_rank")
    })
}
