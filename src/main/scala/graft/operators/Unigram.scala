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
    //      stable artifact a tokenizer build ships. ORACLE-CHECKED
    //      since r13: the fixed round count unrolls the EM, and the
    //      in-row Viterbi DP replays as a recursive-CTE forward pass
    //      carrying the 4-deep best-score window + a backpointer
    //      string, then a recursive backward walk (see the replay
    //      block below; ln() drift is knife-edge-audited — small but
    //      REAL on these corpora's inputs, and proven harmless by a
    //      full drifted-ln DP replay + margin analysis). UnigramSpec's
    //      plain-Scala reference EM and the GoldenSpec digests
    //      remain. ----
    "q108_unigram_train" -> QueryDef.sql(dkUnigramQ108Sql) { (s, dir) =>
      unigramTrain(Tables.documents(s, dir), vocabSize = 60, emRounds = 2)
        .orderBy("rank")
    },

    // ---- unigram-LM tokenize: per-doc fertility under the trained
    //      table (the q103-shaped apply face). ORACLE-CHECKED since
    //      r13: DuckDB replays the unrolled training AND a third DP
    //      pass under the final table's log-probs. ----
    "q109_unigram_tokenize" -> QueryDef.sql(dkUnigramQ109Sql) { (s, dir) =>
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

  // ---------------------------------------------------------------------
  // DuckDB oracle replay (q108/q109): the EM round count is FIXED (2),
  // so the training unrolls (the q110/q102 pattern). The novel piece is
  // the in-row Viterbi DP, which replays LAMBDA-FREE (the q120 lesson)
  // as two recursive CTEs per pass:
  //  - FORWARD: one row per (word, position i), carrying the last four
  //    best scores (maxPieceLen = 4 — a recursive CTE only sees the
  //    previous iteration, so the window rides as columns) plus the
  //    chosen piece length per position as a space-joined backpointer
  //    string; candidate scores come from four LEFT JOINs against the
  //    round's log-prob table (L = 1 falls back to unkLogProb exactly as
  //    the Spark fold's coalesce; L ≥ 2 candidates drop on a missing
  //    piece via NULL). The tie-break (smallest backpointer j = LONGEST
  //    piece) replays as a largest-L-first CASE over score equality.
  //  - BACKWARD: walk pos -= L(pos) from length(w), emitting pieces.
  // Scores accumulate ONE addition per step along each path in both
  // engines, so given bit-identical log-probs the DP is bit-exact —
  // ties included. The ONE drift source, libm ln() vs Java Math.log,
  // DOES differ on these corpora's actual (cnt, tot) inputs (measured:
  // 2–11 of ~176 per SF, ≤ 1.78e-15 — the zero-drift hope was FALSE),
  // so safety is proven two ways by graft.UnigramKnifeEdge +
  // tools/ln_knife_edge.py: (a) every DP decision's winner beats the
  // runner-up by ≥ 8.1e-5 — nine orders beyond the ≤ 2.8e-14 worst
  // path drift (≤ 8 pieces × 2 ln calls × 1.78e-15) — and the 9-dp
  // logp gate sits ≥ 1e-12 from a boundary; (b) decisively, the
  // audit replays the ENTIRE three-pass DP under DuckDB's drifted ln
  // values and reproduces every segmentation — exact ties included —
  // word-for-word at all three SFs (numbers in COVERAGE.md).
  // ---------------------------------------------------------------------

  /** Shared corpus-derived CTEs: tokenized words, the word vocab, the
    * seed piece table, and the two unrolled EM rounds ending at `p2`. */
  private[graft] def dkUnigramTrainCtes(pfx: String = ""): String = {
    val head =
      s"""${pfx}vw AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
         |    SELECT unnest(list_filter(string_split(trim(text), ' '),
         |      x -> x != '')) AS w
         |    FROM documents) GROUP BY w),
         |${pfx}subs AS (
         |  SELECT sub.piece AS piece, CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM ${pfx}vw, unnest(flatten(list_transform(range(1, length(w) + 1),
         |    i -> list_transform(range(i, least(length(w), i + ${maxPieceLen - 1}) + 1),
         |      j -> substr(w, CAST(i AS INT), CAST(j - i + 1 AS INT)))))) AS sub(piece)
         |  GROUP BY 1),
         |${pfx}p0 AS MATERIALIZED (
         |  SELECT piece, cnt FROM ${pfx}subs WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM ${pfx}subs WHERE length(piece) >= 2
         |    ORDER BY cnt DESC, piece LIMIT 60))""".stripMargin
    (head +: (1 to 2).map(r =>
        dkUnigramRound(r, s"${pfx}p${r - 1}", s"${pfx}p$r", pfx)))
      .mkString(",\n")
  }

  /** One Viterbi-DP pass under log-prob table `lp` — forward CTE `fw`,
    * terminal rows `fwt`, backward walk `bw`, emitted `pieces`. */
  private[graft] def dkViterbiCtes(tag: String, lpRel: String,
      pfx: String = ""): String =
    s"""${pfx}fw$tag AS (
       |  SELECT w, wc, 0 AS i, CAST(0.0 AS DOUBLE) AS b0,
       |    CAST(NULL AS DOUBLE) AS b1, CAST(NULL AS DOUBLE) AS b2,
       |    CAST(NULL AS DOUBLE) AS b3, '' AS bps
       |  FROM ${pfx}vw
       |  UNION ALL
       |  SELECT w, wc, i + 1,
       |    greatest(c1, c2, c3, c4) AS b0, b0 AS b1, b1 AS b2, b2 AS b3,
       |    CASE WHEN bps = '' THEN '' ELSE bps || ' ' END ||
       |      CAST(CASE WHEN c4 = greatest(c1, c2, c3, c4) THEN 4
       |                WHEN c3 = greatest(c1, c2, c3, c4) THEN 3
       |                WHEN c2 = greatest(c1, c2, c3, c4) THEN 2
       |                ELSE 1 END AS VARCHAR) AS bps
       |  FROM (
       |    SELECT f.w, f.wc, f.i, f.b0, f.b1, f.b2, f.bps,
       |      f.b0 + coalesce(l1.lp, CAST($unkLogProb AS DOUBLE)) AS c1,
       |      f.b1 + l2.lp AS c2,
       |      f.b2 + l3.lp AS c3,
       |      f.b3 + l4.lp AS c4
       |    FROM ${pfx}fw$tag f
       |    LEFT JOIN $lpRel l1 ON l1.piece = substr(f.w, f.i + 1, 1)
       |    LEFT JOIN $lpRel l2 ON f.i >= 1 AND l2.piece = substr(f.w, f.i, 2)
       |    LEFT JOIN $lpRel l3 ON f.i >= 2 AND l3.piece = substr(f.w, f.i - 1, 3)
       |    LEFT JOIN $lpRel l4 ON f.i >= 3 AND l4.piece = substr(f.w, f.i - 2, 4)
       |    WHERE f.i < length(f.w))),
       |${pfx}fwt$tag AS MATERIALIZED (
       |  SELECT w, wc, bps FROM ${pfx}fw$tag WHERE i = length(w)),
       |${pfx}bw$tag AS (
       |  SELECT w, wc, length(w) AS pos, bps FROM ${pfx}fwt$tag
       |  UNION ALL
       |  SELECT w, wc,
       |    pos - CAST(split_part(bps, ' ', pos) AS INT) AS pos, bps
       |  FROM ${pfx}bw$tag WHERE pos > 0),
       |${pfx}pieces$tag AS MATERIALIZED (
       |  SELECT w, wc,
       |    substr(w, pos - CAST(split_part(bps, ' ', pos) AS INT) + 1,
       |      CAST(split_part(bps, ' ', pos) AS INT)) AS piece
       |  FROM ${pfx}bw$tag WHERE pos > 0)""".stripMargin

  /** One EM round: log-probs from `src`, Viterbi counts, M-step floor. */
  private def dkUnigramRound(r: Int, src: String, dst: String,
      pfx: String = ""): String =
    s"""${pfx}lp$r AS MATERIALIZED (
       |  SELECT piece, ln(CAST(cnt AS DOUBLE)) - ln(tot) AS lp
       |  FROM $src, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM $src)),
       |${dkViterbiCtes(r.toString, s"${pfx}lp$r", pfx)},
       |${pfx}vc$r AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS vcnt
       |  FROM ${pfx}pieces$r GROUP BY 1),
       |$dst AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT p.piece,
       |      CASE WHEN length(p.piece) = 1
       |           THEN greatest(coalesce(vc.vcnt, 0), 1)
       |           ELSE coalesce(vc.vcnt, 0) END AS cnt
       |    FROM $src p LEFT JOIN ${pfx}vc$r vc ON vc.piece = p.piece)
       |  WHERE cnt > 0)""".stripMargin

  private[graft] def dkUnigramQ108Sql: String =
    s"""WITH RECURSIVE ${dkUnigramTrainCtes()}
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank,
       |  piece, cnt,
       |  round(ln(CAST(cnt AS DOUBLE)) - ln(tot), 9) AS logp
       |FROM p2, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM p2)
       |ORDER BY rank""".stripMargin

  private[graft] def dkUnigramQ109Sql: String =
    s"""WITH RECURSIVE ${dkUnigramTrainCtes()},
       |lpF AS MATERIALIZED (
       |  SELECT piece, ln(CAST(cnt AS DOUBLE)) - ln(tot) AS lp
       |  FROM p2, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM p2)),
       |${dkViterbiCtes("F", "lpF")},
       |pw AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n_pieces
       |  FROM piecesF GROUP BY w),
       |tok AS (SELECT doc_id,
       |    unnest(list_filter(string_split(trim(text), ' '), x -> x != '')) AS w
       |  FROM documents)
       |SELECT tok.doc_id,
       |  count(*) AS n_words,
       |  CAST(sum(pw.n_pieces) AS BIGINT) AS n_pieces,
       |  round(CAST(sum(pw.n_pieces) AS DOUBLE) / count(*), 6) AS pieces_per_word
       |FROM tok JOIN pw ON pw.w = tok.w
       |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin

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
