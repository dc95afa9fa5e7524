package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (SentencePiece-style, Kudo 2018 "Subword
  * Regularization") — the other major subword family next to BPE
  * (q102/q103): a fixed piece vocabulary with log-probabilities, applied
  * by VITERBI segmentation (max total piece log-prob), trained by
  * hard-EM over the corpus word vocabulary.
  *
  * Training (q108):
  *  1. SEED: count every substring of length 1..[[maxPieceLen]] across
  *     the distinct-word vocabulary (corpus-weighted, every occurrence
  *     position); vocab = ALL single-code-point pieces (coverage
  *     guarantee: any word stays segmentable) + top-k multi-char pieces
  *     by (count desc, piece UTF-8 asc).
  *  2. EM rounds (hard/Viterbi EM): E — segment every vocab word under
  *     the current piece log-probs; M — re-count pieces from the
  *     segmentations (corpus-weighted), drop multi-char pieces that won
  *     zero positions, floor single-char pieces at count 1 (coverage).
  *     Log-probs renormalize each round: lp = ln(cnt) − ln(Σcnt).
  *
  * Tokenization (q109): Viterbi-segment the DISTINCT words under the
  * trained table, then join the per-word piece counts back onto the
  * token stream for per-doc fertility — the q103 distinct-word-cache
  * lesson (per-occurrence DP re-ran 6.6× slower there; Heaps' law makes
  * the gap grow with corpus size).
  *
  * Determinism (no SQL oracle — DuckDB has no Viterbi; golden-pinned +
  * an independent plain-Scala reference EM in UnigramSpec, the q102
  * two-faces pattern): all tie-breaks are total orders (count desc then
  * UTF-8 piece; score then smallest split point = longest piece), ln
  * runs on identical doubles everywhere, and each word's DP adds doubles
  * in one fixed order — partitioning cannot reorder anything.
  *
  * Scale shape: the corpus is read ONCE per face (word-frequency
  * aggregate); everything else is vocabulary-sized. The piece table
  * collapses to a ONE-ROW map (≤ a few KB) broadcast into the in-row DP
  * — no join against the piece table, no shuffle inside a round beyond
  * the piece re-count (piece-vocab-sized, map-side combined). Per-round
  * state is ≤2 pinned piece tables ([[graft.Barriers.release]], the
  * q102 loop discipline).
  */
object Unigram {
  private def words(c: Column): Column = Text.words(c)

  /** Longest piece considered — SentencePiece's default-ish bound keeps
    * the seed table near-linear in corpus vocab size. */
  val maxPieceLen = 4

  /** Unknown-character log-prob: only single-char DP steps fall back to
    * it (a char absent from training data), keeping every word
    * segmentable at apply time without letting unk beat any real piece. */
  val unkLogProb = -1e9

  def defs: Map[String, QueryDef] = Map(
    // ---- unigram-LM train: the final piece table after seeding + 2
    //      hard-EM rounds. rank orders by (count desc, piece) — the
    //      stable artifact a tokenizer build ships. ----
    "q108_unigram_train" -> QueryDef.rowsOnly { (s, dir) =>
      unigramTrain(Tables.documents(s, dir), vocabSize = 60, emRounds = 2)
        .orderBy("rank")
    },

    // ---- unigram-LM tokenize: per-doc fertility under the trained
    //      table (the q103-shaped apply face). ----
    "q109_unigram_tokenize" -> QueryDef.rowsOnly { (s, dir) =>
      val docs = Tables.documents(s, dir)
      unigramTokenize(docs, unigramTrain(docs, vocabSize = 60, emRounds = 2))
        .orderBy("doc_id")
    }
  )

  /** (w, wc): distinct corpus words with corpus-weighted counts — the
    * only corpus-sized aggregation either face performs. */
  private def vocabWords(docs: DataFrame): DataFrame =
    docs.select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))

  /** Seed piece table (piece, cnt): every substring occurrence of length
    * 1..maxPieceLen, corpus-weighted; all single-char pieces plus the
    * top `vocabSize` multi-char pieces by (cnt desc, piece). */
  private[graft] def seedPieces(vocab: DataFrame, vocabSize: Int): DataFrame = {
    val subs = vocab
      .select(col("wc"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(i, least(length(w), i + ${maxPieceLen - 1})),
           |    j -> substring(w, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    chars.unionByName(multi)
  }

  /** One-row frame holding the piece→logp map: lp = ln(cnt) − ln(Σcnt),
    * entries sorted so the map builds identically on any partitioning. */
  private[graft] def pieceLogProbs(pieces: DataFrame): DataFrame =
    pieces.agg(sum(col("cnt")).as("tot"),
        collect_list(struct(col("piece"), col("cnt"))).as("pc"))
      .select(expr(
        """map_from_entries(transform(array_sort(pc),
          |  x -> struct(x.piece, ln(x.cnt) - ln(tot))))""".stripMargin).as("lp"))

  /** Viterbi DP over one word, in-row. Forward pass builds
    * best[i] = max over j of best[j] + lp(w[j+1..i]) with backpointers
    * (ties → smallest j, i.e. the longest piece); backward pass walks the
    * backpointers into the piece array. Single-char steps fall back to
    * [[unkLogProb]] so unknown characters never make a word
    * unsegmentable; longer pieces must be in the map. */
  private def viterbiExpr: String =
    s"""transform(
       |  array(aggregate(sequence(1, length(w)),
       |    array(struct(CAST(0.0 AS DOUBLE) AS s, -1 AS bp)),
       |    (acc, i) -> concat(acc, array(
       |      aggregate(
       |        filter(transform(sequence(greatest(0, i - $maxPieceLen), i - 1),
       |          j -> struct(
       |            element_at(acc, j + 1).s + CASE
       |              WHEN i - j = 1 THEN coalesce(element_at(lp, substring(w, j + 1, 1)), CAST($unkLogProb AS DOUBLE))
       |              ELSE element_at(lp, substring(w, j + 1, i - j)) END AS s,
       |            j AS bp)),
       |          c -> c.s IS NOT NULL),
       |        CAST(NULL AS STRUCT<s: DOUBLE, bp: INT>),
       |        (b, c) -> CASE WHEN b IS NULL THEN c
       |                       WHEN c.s > b.s OR (c.s = b.s AND c.bp < b.bp) THEN c
       |                       ELSE b END))))),
       |  tbl -> aggregate(sequence(1, length(w)),
       |    struct(length(w) AS pos, CAST(array() AS ARRAY<STRING>) AS ps),
       |    (st, k) -> CASE WHEN st.pos <= 0 THEN st
       |      ELSE struct(element_at(tbl, st.pos + 1).bp AS pos,
       |        concat(array(substring(w, element_at(tbl, st.pos + 1).bp + 1,
       |                               st.pos - element_at(tbl, st.pos + 1).bp)), st.ps) AS ps)
       |      END,
       |    st -> st.ps))[0]""".stripMargin

  /** (w, wc, pieces): Viterbi segmentation of every distinct word under
    * a broadcast one-row log-prob map. */
  private[graft] def segmented(vocab: DataFrame, lp: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(lp))
      .select(col("w"), col("wc"), expr(viterbiExpr).as("pieces"))

  /** Full training loop: seed, then `emRounds` hard-EM rounds. Returns
    * (rank, piece, cnt, logp) — logp from the FINAL counts. */
  def unigramTrain(docs: DataFrame, vocabSize: Int = 60,
      emRounds: Int = 2): DataFrame = {
    val vocab = vocabWords(docs).localCheckpoint(eager = true)
    var pieces = seedPieces(vocab, vocabSize).localCheckpoint(eager = true)
    (1 to emRounds).foreach { _ =>
      val seg = segmented(vocab, pieceLogProbs(pieces))
      val viterbiCounts = seg
        .select(col("wc"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum(col("wc")).as("vcnt"))
      // M step: multi-char pieces live on Viterbi wins alone; single-char
      // pieces floor at 1 so coverage survives even when a char's every
      // occurrence is swallowed by longer pieces
      val next = pieces.select(col("piece")).join(viterbiCounts, Seq("piece"), "left")
        .select(col("piece"),
          when(length(col("piece")) === 1, greatest(coalesce(col("vcnt"), lit(0L)), lit(1L)))
            .otherwise(coalesce(col("vcnt"), lit(0L))).as("cnt"))
        .filter(col("cnt") > 0)
        .localCheckpoint(eager = true)
      graft.Barriers.release(pieces)
      pieces = next
    }
    import org.apache.spark.sql.expressions.Window
    // global (single-partition) rank window — deliberate: it runs on the
    // FINAL piece table, which is tokenizer-sized (vocabSize + alphabet,
    // hundreds of rows) regardless of corpus size, never on corpus data.
    // The no-global-window discipline (q80/q85) is about corpus-sized
    // frames; a tokenizer artifact is the exception that proves it.
    val byRank = Window.orderBy(col("cnt").desc, col("piece"))
    val out = pieces
      .crossJoin(broadcast(pieces.agg(sum(col("cnt")).as("tot"))))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double")) - log(col("tot").cast("double")), 9).as("logp"))
      .withColumn("rank", row_number().over(byRank))
      .select("rank", "piece", "cnt", "logp")
      .localCheckpoint(eager = true)
    graft.Barriers.release(pieces)
    graft.Barriers.release(vocab)
    out
  }

  /** Tokenize/fertility face: per-doc (n_words, n_pieces,
    * pieces_per_word) under a trained piece table — DP once per DISTINCT
    * word, join back onto the token stream (unhinted: AQE broadcasts the
    * word cache when it fits). */
  def unigramTokenize(docs: DataFrame, pieceTable: DataFrame): DataFrame = {
    val lp = pieceLogProbs(pieceTable.select(col("piece"), col("cnt")))
    val perWord = segmented(vocabWords(docs), lp)
      .select(col("w"), size(col("pieces")).cast("long").as("n_pieces"))
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .join(perWord, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("pieces_per_word"))
  }
}
