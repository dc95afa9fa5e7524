package graft.operators

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
}
