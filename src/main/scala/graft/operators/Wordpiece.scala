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

    // ---- WordPiece training. ORACLE-CHECKED since r13: the fixed merge
    //      count unrolls into 30 relational stages (the q102/q110
    //      pattern) — adjacent-pair counts + symbol counts, the
    //      likelihood score c(lr)/(c(l)·c(r)) as ONE double multiply +
    //      divide on exact integers (bit-identical), the sentinel-
    //      guarded (score DESC, count DESC, l, r) argmax, and the greedy
    //      merge fold with the `##`-stripping product. WordpieceSpec's
    //      plain-Scala reference and the GoldenSpec digests remain. ----
    "q119_wordpiece_train" -> QueryDef.sql(dkWpQ119Sql) { (s, dir) =>
      wordpieceTrainMerges(Tables.documents(s, dir)).orderBy("merge_rank")
    },

    // ---- WordPiece tokenize/fertility (the q103 apply-face shape):
    //      train, then greedy-longest-match the corpus against the
    //      learned vocabulary and report per-doc fertility + UNK
    //      counts. ORACLE-CHECKED since r13: DuckDB replays the
    //      unrolled training, rebuilds the runtime vocab (alphabet
    //      units + merge products), and runs the SAME greedy
    //      longest-prefix fold per distinct word — the fold state is a
    //      "pos nPieces bad" string (q120 only consumes the counts),
    //      with ' ' as the separator no token can contain. ----
    "q120_wordpiece_tokenize" -> QueryDef.sql(dkWpQ120Sql) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      wordpieceTokenize(docs, wordpieceTrainMerges(docs)).orderBy("doc_id")
    }
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle replay (q119/q120): the q102 unrolled-loop pattern with
  // two WordPiece twists — the argmax key is the likelihood ratio
  // (double-exact on integer inputs), and the runtime face replays
  // BERT's greedy longest-prefix matcher rather than the training
  // merges (the declared runtime/training asymmetry). Stage CTEs are
  // MATERIALIZED (the q160 inlining lesson).
  // ---------------------------------------------------------------------

  private[graft] val dkWpMerges = 30

  /** Greedy-merge fold under stage argmax (l, r): BPE's fold with the
    * merge product `l ‖ strip##(r)`. Space-joined string accumulator —
    * sound because the corpus splits words on ' '. (No continuation
    * line may start with `||`: the enclosing template stripMargins
    * after interpolation.) */
  private def dkWpMergeFold: String =
    """string_split(list_reduce(list_prepend('', v.syms), (acc, x) ->
      |      CASE WHEN acc = '' THEN x
      |           WHEN string_split(acc, ' ')[-1] = b.l AND x = b.r THEN
      |             CASE WHEN length(acc) = length(string_split(acc, ' ')[-1])
      |                  THEN b.l || substr(b.r, 3)
      |                  ELSE left(acc, length(acc) - length(string_split(acc, ' ')[-1]) - 1) ||
      |                       ' ' || b.l || substr(b.r, 3) END
      |           ELSE acc || ' ' || x END), ' ')""".stripMargin

  private[graft] def dkWpTrainCtes(nMerges: Int, pfx: String = ""): String = {
    val head =
      s"""${pfx}v0 AS MATERIALIZED (
        |  SELECT w, wc,
        |    list_transform(range(1, length(w) + 1),
        |      i -> CASE WHEN i = 1 THEN substr(w, 1, 1)
        |           ELSE '##' || substr(w, CAST(i AS INT), 1) END) AS syms
        |  FROM (SELECT w, count(*) AS wc FROM (
        |          SELECT unnest(list_filter(string_split(trim(text), ' '),
        |            x -> x != '')) AS w
        |          FROM documents) GROUP BY w))""".stripMargin
    val stages = (1 to nMerges).map { k =>
      s"""${pfx}p$k AS (SELECT u.s.l AS l, u.s.r AS r, CAST(sum(wc) AS BIGINT) AS pair_count
         |  FROM ${pfx}v${k - 1}, unnest(list_transform(range(1, len(syms)),
         |    i -> {'l': syms[i], 'r': syms[i + 1]})) AS u(s)
         |  GROUP BY 1, 2),
         |${pfx}sy$k AS (SELECT t.s AS s, CAST(sum(wc) AS BIGINT) AS sc
         |  FROM ${pfx}v${k - 1}, unnest(syms) AS t(s) GROUP BY 1),
         |${pfx}b$k AS MATERIALIZED (SELECT l, r, pair_count, score FROM (
         |    SELECT p.l, p.r, p.pair_count,
         |      CAST(p.pair_count AS DOUBLE) /
         |        (CAST(sl.sc AS DOUBLE) * CAST(sr.sc AS DOUBLE)) AS score
         |    FROM ${pfx}p$k p JOIN ${pfx}sy$k sl ON sl.s = p.l JOIN ${pfx}sy$k sr ON sr.s = p.r
         |    UNION ALL SELECT '', '', CAST(-1 AS BIGINT), CAST(-1.0 AS DOUBLE))
         |  ORDER BY score DESC, pair_count DESC, l, r LIMIT 1),
         |${pfx}v$k AS MATERIALIZED (SELECT v.w, v.wc, $dkWpMergeFold AS syms
         |  FROM ${pfx}v${k - 1} v, ${pfx}b$k b)""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  private[graft] def dkWpQ119Sql: String =
    s"WITH ${dkWpTrainCtes(dkWpMerges)}\nSELECT * FROM (\n" +
      (1 to dkWpMerges).map(k =>
        s"SELECT CAST($k AS BIGINT) AS merge_rank, l, r, pair_count, round(score, 9) AS score FROM b$k")
        .mkString("", "\nUNION ALL\n", ")\n") +
      "WHERE pair_count > 0 ORDER BY merge_rank"

  /** q120's greedy longest-prefix matcher, replayed RELATIONALLY: a
    * (word, consumed-pos) → longest-matching-piece-length table (join
    * against the vocab, max per position — greedy at pos consumes
    * exactly the longest match, and both bare and `##` pieces of
    * match-length L consume L chars), then a recursive-CTE walk that
    * advances pos by bestL until consumption or a missing match (UNK).
    * Deliberately lambda-free: DuckDB 1.0 mis-evaluates a nested
    * list_contains lambda that captures a cross-joined column under
    * some plans (measured: the same fold returned 6 pieces inline and
    * 7 under the full query), so the oracle avoids outer-column capture
    * in lambdas entirely. */
  private[graft] def dkWpWalkCtes(pfx: String = ""): String =
    s"""${pfx}cands AS (
       |  SELECT dw.w, pp.p, LL.L,
       |    CASE WHEN pp.p = 0 THEN substr(dw.w, 1, CAST(LL.L AS INT))
       |         ELSE '##' || substr(dw.w, pp.p + 1, CAST(LL.L AS INT)) END AS piece
       |  FROM (SELECT DISTINCT w FROM ${pfx}v0) dw,
       |    LATERAL unnest(range(0, length(dw.w))) AS pp(p),
       |    LATERAL unnest(range(1, least($maxPieceLen, length(dw.w) - pp.p) + 1)) AS LL(L)),
       |${pfx}matches AS MATERIALIZED (
       |  SELECT c.w, c.p, max(c.L) AS bestL
       |  FROM ${pfx}cands c JOIN ${pfx}vocab v ON v.piece = c.piece GROUP BY c.w, c.p),
       |${pfx}walk AS (
       |  SELECT w, 0 AS pos, 0 AS n, false AS bad FROM (SELECT DISTINCT w FROM ${pfx}v0)
       |  UNION ALL
       |  SELECT wk.w,
       |    CAST(CASE WHEN m.bestL IS NULL THEN length(wk.w)
       |         ELSE wk.pos + m.bestL END AS INT) AS pos,
       |    wk.n + 1 AS n,
       |    m.bestL IS NULL AS bad
       |  FROM ${pfx}walk wk LEFT JOIN ${pfx}matches m ON m.w = wk.w AND m.p = wk.pos
       |  WHERE NOT wk.bad AND wk.pos < length(wk.w)),
       |${pfx}seg AS MATERIALIZED (
       |  SELECT w,
       |    CAST(CASE WHEN bad THEN 1 ELSE n END AS BIGINT) AS n_sub,
       |    CASE WHEN bad THEN 1 ELSE 0 END AS is_unk
       |  FROM ${pfx}walk WHERE bad OR pos >= length(w))""".stripMargin

  /** Runtime vocab CTE: alphabet units + merge products. */
  private[graft] def dkWpVocabCte(pfx: String = ""): String =
    s"""${pfx}vocab AS MATERIALIZED (
       |  SELECT DISTINCT piece FROM (
       |    SELECT u.u AS piece FROM ${pfx}v0, unnest(syms) AS u(u)
       |    UNION ALL
       |    SELECT l || substr(r, 3) AS piece FROM (
       |${(1 to dkWpMerges).map(k => s"      SELECT l, r, pair_count FROM ${pfx}b$k")
            .mkString("\n      UNION ALL\n")}
       |    ) WHERE pair_count > 0))""".stripMargin

  private[graft] def dkWpQ120Sql: String =
    s"""WITH RECURSIVE ${dkWpTrainCtes(dkWpMerges)},
       |${dkWpVocabCte()},
       |${dkWpWalkCtes()},
       |tok AS (SELECT doc_id,
       |    unnest(list_filter(string_split(trim(text), ' '), x -> x != '')) AS w
       |  FROM documents)
       |SELECT tok.doc_id,
       |  count(*) AS n_words,
       |  CAST(sum(seg.n_sub) AS BIGINT) AS n_subwords,
       |  CAST(sum(seg.is_unk) AS BIGINT) AS n_unk_words,
       |  round(CAST(sum(seg.n_sub) AS DOUBLE) / count(*), 6) AS subwords_per_word
       |FROM tok JOIN seg ON seg.w = tok.w
       |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin

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
