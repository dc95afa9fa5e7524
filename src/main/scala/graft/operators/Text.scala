package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tokenizer — THE definition of a "word" for every operator
  * family (dedup shingles, BM25 terms, LM bigrams, curation stats).
  * Exactly one implementation so the oracle-parity contract (DuckDB's
  * `list_filter(string_split(trim(text),' '), x -> x != '')`) cannot
  * drift between families: a tokenization tweak applied to one operator
  * but not another would silently desynchronize BM25/LM scores from the
  * dedup/curation token streams. */
private[operators] object Text {
  /** Non-empty whitespace tokens. */
  def words(c: Column): Column = filter(split(trim(c), " "), w => w =!= "")
}
