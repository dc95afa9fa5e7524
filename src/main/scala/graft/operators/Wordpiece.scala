package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
  * the third tokenizer family beside BPE (q102/q103) and unigram-LM
  * (q108/q109), covering the third training objective: BPE merges the
  * most FREQUENT adjacent pair; WordPiece merges the pair with the best
  * LIKELIHOOD ratio score(a,b) = c(ab)/(c(a)·c(b)) — the merge that most
  * increases a unigram LM's corpus likelihood, which prefers pairs that
  * co-occur out of proportion to their parts (cf. q114's PMI, whose
  * argmax this is, per round, over the current segmentation).
  *
  * Symbols carry BERT's `##` continuation convention: word-initial units
  * are bare, word-internal units `##`-prefixed, and a merge product
  * keeps the left symbol's prefix status (the right side of any adjacent
  * pair is never word-initial, so it is always `##`-prefixed — the fold
  * strips exactly that marker when concatenating).
  *
  * The tokenize face is the REAL WordPiece runtime: greedy
  * longest-prefix match against the final vocabulary (alphabet units +
  * every merge product), whole word → `[UNK]` when any position fails to
  * match. Greedy matching is deliberately NOT a replay of the training
  * merges — BERT's runtime/training asymmetry is part of the contract,
  * and WordpieceSpec pins an example where the two segmentations differ.
  *
  * Scale shape mirrors q102/q103 (SCALING.md): the corpus is read once
  * per face (word-frequency vocab; the q103 distinct-word cache), every
  * training round runs on the vocab table with a 1-row pinned argmax
  * broadcast back, per-round barriers released immediately
  * ([[graft.Barriers.release]]) so live state is ≤2 vocab copies; the
  * vocabulary rides a ONE-ROW broadcast map into the in-row greedy fold.
  */
object Wordpiece {

  private def words(c: Column): Column = Text.words(c)

  /** Longest-match window for the greedy tokenizer. Merge products grow
    * by at most one unit per round, so 30 rounds cannot produce a piece
    * longer than 31 chars; 64 leaves headroom for larger merge budgets
    * without making the per-position probe unbounded. */
  private val maxPieceLen = 64

  def defs: Map[String, QueryDef] = Map(

    // ---- WordPiece training (no SQL oracle — the per-round argmax +
    //      greedy replacement is iterative, not relational, exactly as
    //      q102; WordpieceSpec pins an independent plain-Scala reference
    //      merge-for-merge and GoldenSpec digests both SFs). ----
    "q119_wordpiece_train" -> QueryDef.rowsOnly { (s, dir) =>
      wordpieceTrainMerges(Tables.documents(s, dir)).orderBy("merge_rank")
    },

    // ---- WordPiece tokenize/fertility (the q103 apply-face shape):
    //      train, then greedy-longest-match the corpus against the
    //      learned vocabulary and report per-doc fertility + UNK
    //      counts. ----
    "q120_wordpiece_tokenize" -> QueryDef.rowsOnly { (s, dir) =>
      val docs = Tables.documents(s, dir)
      wordpieceTokenize(docs, wordpieceTrainMerges(docs)).orderBy("doc_id")
    }
  )

  /** Initial segmentation: first char bare, the rest `##`-prefixed. */
  private val initialUnitsExpr =
    """transform(sequence(1, length(w)),
      |  i -> CASE WHEN i = 1 THEN substring(w, i, 1)
      |       ELSE concat('##', substring(w, i, 1)) END)""".stripMargin

  /** Ordered merge table (merge_rank, l, r, pair_count, score): `nMerges`
    * rounds of argmax over score = c(lr)/(c(l)·c(r)) with ties broken by
    * raw pair count, then (l, r) lexicographically. Counts are exact
    * integers; the score is one IEEE division per pair — identical on
    * any partitioning — and ships rounded to 9 places. Exhaustion (no
    * adjacent pairs left) emits sentinel rounds that are filtered out,
    * as in q102. */
  def wordpieceTrainMerges(docs: DataFrame, nMerges: Int = 30): DataFrame = {
    val spark = docs.sparkSession
    var vocab = docs.select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(expr(initialUnitsExpr).as("syms"), col("wc"))
      .localCheckpoint(eager = true)
    val merges = Seq.newBuilder[DataFrame]
    (1 to nMerges).foreach { k =>
      val best = wordpieceRoundScores(vocab)
        .unionByName(spark.range(1).select(lit("").as("l"), lit("").as("r"),
          lit(-1L).as("pair_count"), lit(-1.0).as("score")))
        .orderBy(col("score").desc, col("pair_count").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint(eager = true) // 1 row: pins this round's argmax
      merges += best.select(lit(k.toLong).as("merge_rank"), col("l"), col("r"),
        col("pair_count"), round(col("score"), 9).as("score"))
      // same greedy left-to-right fold as BPE (and the same non-overlap
      // argument: after a merge the accumulator's last element is l++r',
      // which can never equal l again within this pass); the merge
      // product strips r's leading '##' and keeps l's prefix status
      val next = vocab.crossJoin(broadcast(best.select(col("l"), col("r"))))
        .select(expr(
          """aggregate(syms, slice(syms, 1, 0),
            |  (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = l AND x = r
            |    THEN concat(slice(acc, 1, size(acc) - 1),
            |                array(concat(l, substring(r, 3))))
            |    ELSE concat(acc, array(x)) END)""".stripMargin).as("syms"),
          col("wc"))
        .localCheckpoint(eager = true)
      graft.Barriers.release(vocab)
      vocab = next
    }
    val perRound = merges.result()
    val out = perRound.reduce(_.unionByName(_))
      .filter(col("pair_count") > 0)
      .localCheckpoint(eager = true)
    graft.Barriers.release(vocab)
    perRound.foreach(graft.Barriers.release)
    out
  }

  /** One training round's scored pair table (the loop body the per-round
    * plan gate budgets — a regression here multiplies by nMerges):
    * [[Curation.bpeRoundPairs]]'s adjacent-pair counts joined against
    * the current symbol counts, scored c(lr)/(c(l)·c(r)). Both
    * aggregates are map-side combined over the barriered vocab; the
    * joins are symbol-vocabulary-sized. */
  private[graft] def wordpieceRoundScores(vocab: DataFrame): DataFrame = {
    val pairs = Curation.bpeRoundPairs(vocab)
    val syms = vocab.select(col("wc"), explode(col("syms")).as("s"))
      .groupBy("s").agg(sum(col("wc")).as("sc"))
    pairs
      .join(syms.select(col("s").as("l"), col("sc").as("lc")), "l")
      .join(syms.select(col("s").as("r"), col("sc").as("rc")), "r")
      .select(col("l"), col("r"), col("pair_count"),
        (col("pair_count").cast("double")
          / (col("lc").cast("double") * col("rc").cast("double"))).as("score"))
  }

  /** Runtime vocabulary: every initial unit (alphabet coverage — a bare
    * and a `##` form per observed char) plus every merge product. No
    * replay of the training state is needed: each merge creates exactly
    * one new symbol type, `l ++ strip##(r)` — the BERT convention of
    * shipping alphabet + merge products as the vocab file. */
  def wordpieceVocab(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val units = docs.select(explode(words(col("text"))).as("w"))
      .select(explode(expr(initialUnitsExpr)).as("piece"))
      .distinct()
    val products = mergeTable
      .select(concat(col("l"), expr("substring(r, 3)")).as("piece"))
    units.unionByName(products).distinct()
  }

  /** One-row piece→true map, entries sorted so the map builds identically
    * on any partitioning (the q108 pieceLogProbs convention). */
  private[operators] def vocabMap(vocab: DataFrame): DataFrame =
    vocab.agg(collect_list(col("piece")).as("ps"))
      .select(expr(
        "map_from_entries(transform(array_sort(ps), p -> struct(p, true)))")
        .as("vm"))

  /** Greedy longest-prefix-match fold over one word, in-row under the
    * broadcast vocab map. State = (pos consumed, pieces, failed); each
    * step consumes the LONGEST matching piece at pos (word-initial bare,
    * else `##`-prefixed); any position with no match turns the whole
    * word into `[UNK]` (BERT semantics). Steps after full consumption
    * pass through, so `length(w)` iterations always suffice. */
  private def greedyExpr: String =
    s"""aggregate(sequence(1, length(w)),
       |  struct(0 AS pos, CAST(array() AS ARRAY<STRING>) AS ps, false AS bad),
       |  (st, k) -> CASE WHEN st.bad OR st.pos >= length(w) THEN st ELSE
       |    element_at(transform(array(
       |      get(filter(transform(
       |          sequence(least($maxPieceLen, length(w) - st.pos), 1, -1),
       |          L -> CASE WHEN st.pos = 0 THEN substring(w, 1, L)
       |               ELSE concat('##', substring(w, st.pos + 1, L)) END),
       |        c -> element_at(vm, c) IS NOT NULL), 0)),
       |      m -> CASE WHEN m IS NULL THEN struct(length(w) AS pos,
       |          CAST(array('[UNK]') AS ARRAY<STRING>) AS ps, true AS bad)
       |        ELSE struct(
       |          st.pos + length(m) - CASE WHEN st.pos = 0 THEN 0 ELSE 2 END AS pos,
       |          concat(st.ps, array(m)) AS ps, false AS bad) END), 1) END,
       |  st -> st.ps)""".stripMargin

  /** (w, pieces): greedy segmentation of every distinct word under the
    * broadcast vocabulary — the per-word cache, exposed for the
    * reconstruction/UNK properties. */
  private[graft] def segmented(vocab: DataFrame, wordsDf: DataFrame): DataFrame =
    wordsDf.crossJoin(broadcast(vocabMap(vocab)))
      .select(col("w"), expr(greedyExpr).as("pieces"))

  /** Per-doc fertility + UNK counts under the trained merge table —
    * the q103 shape: greedy fold once per DISTINCT word, per-word piece
    * counts join back onto the token stream UNHINTED, map-side-combined
    * per-doc aggregation. The alphabet units derive from the SAME
    * barrier-backed distinct-word frame the fold reads (a standalone
    * [[wordpieceVocab]] call would pay a third corpus scan for them). */
  def wordpieceTokenize(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val distinctWords = docs.select(explode(words(col("text"))).as("w")).distinct()
      .localCheckpoint(eager = false)
    val vocab = distinctWords
      .select(explode(expr(initialUnitsExpr)).as("piece")).distinct()
      .unionByName(mergeTable
        .select(concat(col("l"), expr("substring(r, 3)")).as("piece")))
      .distinct()
    val perWord = segmented(vocab, distinctWords)
      .select(col("w"), size(col("pieces")).cast("long").as("n_sub"),
        (col("pieces") === array(lit("[UNK]"))).cast("long").as("is_unk"))
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .join(perWord, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"),
        sum(col("is_unk")).as("n_unk_words"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        col("n_unk_words"),
        round(col("n_subwords").cast("double") / col("n_words"), 6)
          .as("subwords_per_word"))
  }
}
