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
    //      comparable row each. ORACLE-CHECKED since r13: with every
    //      family's training/runtime now relationally replayable
    //      (q102/q103, q119/q120, q108/q109), the bake-off oracle embeds
    //      all three unrolled replays in ONE statement (prefix-
    //      namespaced CTEs) and assembles the same three summary rows
    //      from corpus-weighted per-word results. The families keep
    //      their own independent-reference cross-checks. ----
    "q158_tokenizer_audit" -> QueryDef.sql(dkQ158Sql) { (s, dir) =>
      tokenizerAudit(Tables.documents(s, dir))
    })

  /** The composite bake-off oracle: BPE/WordPiece/unigram replays under
    * `bp_`/`wp_`/`ug_` prefixes, then one summary row per family. The
    * per-doc aggregations collapse to corpus-weighted per-word sums
    * (the token-stream join drops nothing: every distinct word is in
    * each family's cache by construction), so Σ_docs = Σ_w wc·f(w). */
  private[graft] def dkQ158Sql: String = {
    val bpeUnits = (1 to Curation.dkBpeMerges)
      .map(k => s"SELECT pair_count FROM bp_b$k")
      .mkString("SELECT CAST(count(*) AS BIGINT) FROM (", " UNION ALL ",
        ") WHERE pair_count > 0")
    val wpUnits = (1 to Wordpiece.dkWpMerges)
      .map(k => s"SELECT pair_count FROM wp_b$k")
      .mkString("SELECT CAST(count(*) AS BIGINT) FROM (", " UNION ALL ",
        ") WHERE pair_count > 0")
    s"""WITH RECURSIVE
       |${Curation.dkBpeTrainCtes(Curation.dkBpeMerges, "bp_")},
       |${Wordpiece.dkWpTrainCtes(Wordpiece.dkWpMerges, "wp_")},
       |${Wordpiece.dkWpVocabCte("wp_")},
       |${Wordpiece.dkWpWalkCtes("wp_")},
       |${Unigram.dkUnigramTrainCtes("ug_")},
       |ug_lpF AS MATERIALIZED (
       |  SELECT piece, ln(CAST(cnt AS DOUBLE)) - ln(tot) AS lp
       |  FROM ug_p2, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM ug_p2)),
       |${Unigram.dkViterbiCtes("F", "ug_lpF", "ug_")},
       |bpe_row AS (
       |  SELECT 'bpe' AS tokenizer, ($bpeUnits) AS vocab_units,
       |    CAST(sum(wc) AS BIGINT) AS n_words,
       |    CAST(sum(wc * len(syms)) AS BIGINT) AS n_subwords,
       |    CAST(0 AS BIGINT) AS n_unk_words,
       |    round(CAST(sum(wc * len(syms)) AS DOUBLE) / CAST(sum(wc) AS DOUBLE), 6)
       |      AS fertility
       |  FROM bp_v${Curation.dkBpeMerges}),
       |wp_row AS (
       |  SELECT 'wordpiece' AS tokenizer, ($wpUnits) AS vocab_units,
       |    CAST(sum(v.wc) AS BIGINT) AS n_words,
       |    CAST(sum(v.wc * g.n_sub) AS BIGINT) AS n_subwords,
       |    CAST(sum(v.wc * g.is_unk) AS BIGINT) AS n_unk_words,
       |    round(CAST(sum(v.wc * g.n_sub) AS DOUBLE) / CAST(sum(v.wc) AS DOUBLE), 6)
       |      AS fertility
       |  FROM wp_seg g JOIN wp_v0 v ON v.w = g.w),
       |ug_row AS (
       |  SELECT 'unigram' AS tokenizer,
       |    (SELECT CAST(count(*) AS BIGINT) FROM ug_p2) AS vocab_units,
       |    (SELECT CAST(sum(wc) AS BIGINT) FROM ug_vw) AS n_words,
       |    CAST(sum(wc) AS BIGINT) AS n_subwords,
       |    CAST(0 AS BIGINT) AS n_unk_words,
       |    round(CAST(sum(wc) AS DOUBLE) /
       |      (SELECT CAST(sum(wc) AS DOUBLE) FROM ug_vw), 6) AS fertility
       |  FROM ug_piecesF)
       |SELECT * FROM (
       |  SELECT * FROM bpe_row UNION ALL
       |  SELECT * FROM wp_row UNION ALL
       |  SELECT * FROM ug_row)
       |ORDER BY tokenizer""".stripMargin
  }
}
