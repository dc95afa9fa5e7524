package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-family tokenizer audit: train all three tokenizer families the
  * engine implements — BPE (q102/q103, Sennrich et al. 2016), WordPiece
  * (q119/q120, Schuster & Nakajima 2012), and unigram-LM (q108/q109,
  * Kudo 2018) — on the SAME corpus and report one comparable row per
  * family: learned vocabulary units, corpus token counts, fertility
  * (subwords per word), and unknown-token words. This is the audit that
  * picks a tokenizer for a corpus: fertility decides sequence-length
  * budgets, [UNK] rates decide whether the vocab covers the data.
  *
  * Scale shape: each family's train/tokenize pair is the already-budgeted
  * production shape (distinct-word caches, vocab-sized loops); this
  * operator adds only three per-doc aggregations collapsed to ONE ROW
  * each (map-side combine), assembled by unionByName. Fertility divides
  * exact integer sums once — engine-identical digits. No SQL oracle (the
  * underlying faces are iterative argmax/EM); each family is already
  * cross-checked against an independent plain-Scala reference in its own
  * suite, and the audit row is golden-pinned.
  */
object Tokenizers {

  /** One comparable summary row per tokenizer family. */
  def tokenizerAudit(docs: DataFrame): DataFrame = {
    val d = docs.localCheckpoint(eager = false) // consumers: 3 train+apply pipelines
    def row(name: String, perDoc: DataFrame, subCol: String, unkCol: Option[String],
        vocabUnits: DataFrame): DataFrame = {
      val agg = perDoc.agg(
        sum(col("n_words")).as("n_words"),
        sum(col(subCol)).as("n_subwords"),
        unkCol.map(c => sum(col(c))).getOrElse(lit(0L)).as("n_unk_words"))
      agg.crossJoin(broadcast(vocabUnits))
        .select(lit(name).as("tokenizer"), col("vocab_units"),
          col("n_words"), col("n_subwords"), col("n_unk_words"),
          round(col("n_subwords").cast("double") / col("n_words"), 6)
            .as("fertility"))
    }
    val bpeMerges = Curation.bpeTrainMerges(d)
      .localCheckpoint(eager = false) // consumers: tokenize + unit count
    val wpMerges = Wordpiece.wordpieceTrainMerges(d)
      .localCheckpoint(eager = false)
    val ugPieces = Unigram.unigramTrain(d)
      .localCheckpoint(eager = false)
    def units(t: DataFrame): DataFrame = t.agg(count(lit(1)).as("vocab_units"))
    val bpe = row("bpe", Curation.bpeTokenize(d, bpeMerges),
      "n_subwords", None, units(bpeMerges))
    val wp = row("wordpiece", Wordpiece.wordpieceTokenize(d, wpMerges),
      "n_subwords", Some("n_unk_words"), units(wpMerges))
    val ug = row("unigram", Unigram.unigramTokenize(d, ugPieces),
      "n_pieces", None, units(ugPieces))
    bpe.unionByName(wp).unionByName(ug).orderBy("tokenizer")
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- tokenizer bake-off: all three families on one corpus, one
    //      comparable row each. Golden-pinned; the families carry their
    //      own independent-reference cross-checks. ----
    "q158_tokenizer_audit" -> QueryDef.rowsOnly { (s, dir) =>
      tokenizerAudit(Tables.documents(s, dir))
    })
}
