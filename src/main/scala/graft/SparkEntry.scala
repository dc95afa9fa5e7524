package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2's inventory;
  * [[oracleSql]] carries the DuckDB-equivalent SQL the driver uses for the
  * hash-match correctness gate (column names are part of the contract).
  */
object SparkEntry {

  /** Full declared inventory, assembled from the operator modules. */
  def all: Map[String, QueryDef] =
    operators.Relational.defs ++ operators.Relational2.defs ++
      operators.Relational3.defs ++ operators.TemporalJoins.defs ++
      operators.SubstrDupStore.defs ++
      operators.TextAnalysis.defs ++ operators.Dedup.defs ++
      operators.DedupIndex.defs ++
      operators.Similarity.defs ++ operators.Multimodal.defs ++
      operators.Curation.defs ++ operators.Retrieval.defs ++
      operators.Unigram.defs ++ operators.Classifier.defs ++
      operators.Wordpiece.defs ++ operators.Maintenance.defs ++
      operators.Sketches.defs ++ operators.EventAnalytics.defs ++
      operators.Affinity.defs ++ operators.Tokenizers.defs ++
      operators.ImageHash.defs ++ operators.Skew.defs ++
      streaming.Streams.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q04_join_broadcast_dims").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.view.mapValues(_.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
