package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is hot.
  *
  * AQE's skew-join handling (enabled in Bench/production confs) splits
  * oversized partitions at runtime and is the first line of defense. This
  * utility is the explicit form for joins AQE can't fix — e.g. a hot key
  * on the BUILD side of a non-broadcastable join: the big side's hot keys
  * spread across `saltBuckets` sub-keys, the small side replicates per
  * bucket, and the join key becomes (key, salt).
  *
  * Salt assignment is deterministic (hash of the whole row, not rand()) so
  * re-executed partitions produce identical output — the same idempotency
  * requirement the ingest sinks have (SURVEY.md §7 hard parts).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with the big side salted into
    * `saltBuckets` sub-partitions per key. Semantically identical to
    * `big.join(small, key)` for 1:N joins (small side unique on key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val bigCols = big.columns
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols.toIndexedSeq.map(col): _*)), lit(saltBuckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N hottest keys with their frequencies — the diagnostic that
    * decides between broadcast, salting, and AQE-only. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)

  /** [[keyHistogram]] grown into the full pre-shuffle audit (q173): the
    * top-N hottest values of a prospective join/groupBy key with each
    * one's row share and hotness vs a uniform key (×mean) — the numbers
    * that decide broadcast vs salting vs AQE before a 100 TB shuffle is
    * launched. One map-side-combined count aggregation; summary stats
    * ride a one-row broadcast; top-N is a TakeOrdered with total-order
    * ties. x_mean = n·n_keys/n_rows — exact integers until one division. */
  def keySkewAudit(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // consumers: stats + top-k
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
    val w = Window.orderBy(col("n").desc, col(key)) // topN-sized frame
    counts.orderBy(col("n").desc, col(key)).limit(topN)
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col(key).cast("string").as("key_value"),
        col("n"), col("n_keys"), col("n_rows"),
        round(col("n").cast("double") / col("n_rows"), 6).as("share"),
        // round 6, not 2: n·n_keys/n_rows is a terminating decimal for
        // round binned totals (e.g. n·3/200), so a 2-dp round can land
        // exactly on a half — where the engines' double-rounding rules
        // diverge; at 6 dp a 3-decimal rational has no boundary to hit
        round((col("n") * col("n_keys")).cast("double") / col("n_rows"), 6)
          .as("x_mean"))
      .orderBy("rank")
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- join-key skew audit: hottest event users vs a uniform key —
    //      the broadcast/salt/AQE decision input. ----
    "q173_key_skew_audit" -> QueryDef.sql(
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |s AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows FROM c),
        |t AS (SELECT user_id, n,
        |        row_number() OVER (ORDER BY n DESC, user_id) AS rank
        |      FROM c ORDER BY n DESC, user_id LIMIT 10)
        |SELECT rank, CAST(user_id AS VARCHAR) AS key_value, n,
        |  n_keys, n_rows,
        |  round(CAST(n AS DOUBLE) / n_rows, 6) AS share,
        |  round(CAST(n * n_keys AS DOUBLE) / n_rows, 6) AS x_mean
        |FROM t CROSS JOIN s ORDER BY rank""") { (s, dir) =>
      keySkewAudit(Tables.events(s, dir), "user_id")
    })
}
