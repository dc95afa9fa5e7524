package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's declared inventory (SURVEY.md §2).
  *
  * @param fn     builds the DataFrame from `(spark, sfDir)`; must alias every
  *               computed column — the driver's oracle compare sorts columns
  *               by NAME before hashing, so names must match `oracle` exactly.
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet tables;
  *               None → driver records a weaker rows-only check.
  *
  * Determinism contract for oracle-checked queries: aggregate through
  * DECIMAL (never sum raw doubles — summation order differs between engines),
  * break every ORDER BY tie with a unique key, and produce only types both
  * engines render identically (long, double, string, date, timestamp).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(o: String)(f: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(f, Some(o.stripMargin.trim))
  def rowsOnly(f: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(f, None)
}
