package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (BM25) retrieval over the documents table — the hard-negative
  * mining / keyword-recall operator a training-data pipeline pairs with
  * embedding ANN (Similarity): given query documents, rank the corpus by
  * Okapi BM25 (Robertson et al., TREC-3) and keep the top k per query.
  *
  * Scale design: the corpus side is an inverted index — (doc_id, term,
  * tf) postings built with ONE shuffle of the tokenized corpus (doc
  * length rides in the grouping key, so no doc-keyed length join later).
  * The query side (query terms + their document frequencies) is tiny and
  * BROADCAST onto the postings, so candidate generation touches only
  * postings of query terms; nothing all-pairs, no shuffle of the corpus
  * by query. Per-query top-k is a rank window partitioned by query id
  * (WindowGroupLimit keeps per-partition state at k rows).
  *
  * Oracle determinism (the float-sum problem): each per-term BM25
  * contribution is rounded to 9 decimals and cast to DECIMAL(18,9)
  * BEFORE the per-document sum, making the aggregation exact and
  * order-independent in both engines; only the final score rounds to 6.
  * Ranks tie-break on doc_id, so ordering is total.
  */
object Retrieval {

  /** Non-empty whitespace tokens — delegates to [[Text.words]], the
    * single tokenizer shared by every operator family. */
  private def words(c: Column): Column = Text.words(c)

  /** Okapi BM25 top-k: rows matching `isQuery` are the query documents
    * (their distinct terms form the query); every OTHER doc is scored as
    * a candidate. k1/b are the standard Robertson defaults. Returns
    * (qid, doc_id, bm25, rank), rank 1..k per qid.
    *
    * IDF = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative
    * Lucene-style variant, so stopword-ish terms contribute ~0 instead
    * of negative scores. */
  def bm25TopK(docs: DataFrame, isQuery: Column, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // postings with the doc length IN the grouping key: one shuffle of
    // the tokenized corpus builds tf AND carries dl to the scorer
    // localCheckpoint barrier: the index has THREE consumers (the df
    // aggregate, the corpus stats, and the probe join) and without it
    // the tokenize+shuffle subtree runs per consumer — AQE replaces the
    // exchanges per-consumer so ReuseExchange never fires (the q51
    // failure mode). Persisting IS the operator's semantics here: build
    // the inverted index once, probe it per query set.
    val tf = bm25Postings(docs).localCheckpoint(eager = false)
    val q = docs.filter(isQuery)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(words(col("text")))).as("term"))
    bm25TopKAgainst(tf, q, k, k1, b)
  }

  /** The inverted index as a standalone persistable relation
    * (doc_id, dl, term, tf) — [[bm25TopKAgainst]]'s input, and the ONLY
    * state retrieval needs: document frequencies and the corpus stats
    * both derive from it without touching the corpus. Build once per
    * corpus snapshot, write as parquet (partition/bucket by term for
    * probe locality), and every query batch after that is an
    * index-probe job that never re-tokenizes a document — the
    * benchShingleSet precompute pattern applied to retrieval. */
  def bm25Postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** Okapi BM25 probe of a prebuilt (possibly persisted) postings
    * relation by a (qid, term) query-term relation — distinct terms per
    * query. Document frequencies and corpus stats (n_docs, avgdl)
    * derive from the postings themselves: df = postings rows per term
    * over distinct docs (each (doc, term) appears once), n_docs/avgdl
    * from the distinct (doc_id, dl) pairs — so a persisted index is
    * self-contained. Query terms + df are tiny and broadcast onto the
    * postings; the index is probed, never re-shuffled. */
  def bm25TopKAgainst(postings: DataFrame, queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus stats: one row (exact integer sums under the divide)
    val stats = postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qdf = queryTerms.join(dfreq, "term").crossJoin(broadcast(stats))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart = (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    // round each contribution to DECIMAL(18,9) BEFORE summing: the sum
    // becomes exact integer arithmetic — same value on any engine, any
    // partitioning, any add order
    val contrib = postings.join(broadcast(qdf), "term")
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        round(idf * tfPart, 9).cast("decimal(18,9)").as("c"))
    val rankW = Window.partitionBy("qid").orderBy(col("bm25").desc, col("doc_id"))
    contrib.groupBy("qid", "doc_id")
      .agg(round(sum(col("c")).cast("double"), 6).as("bm25"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Dense-vocabulary face of [[bm25TopKAgainst]] — SAME SCORES, different
    * join geometry. The postings probe materializes one row per
    * (query term × posting) match; on a corpus whose vocabulary is small
    * and ubiquitous (every doc carries most terms — this testdata, or
    * any stopword-dense slice), that degenerates to
    * |queries|·|docs|·|vocab| exploded rows through a shuffle (measured:
    * 67 s for q150 at sf0.1). Here each doc's per-term BM25
    * contributions collapse into ONE dense DECIMAL(18,9) vector over
    * the ordered vocabulary (contributions are query-independent), each
    * query into a 0/1 presence vector, and the score is an IN-ROW
    * zip_with/aggregate dot product over a docs × queries pair frame —
    * |queries|·|docs| rows, vocab-wide work per row, no match
    * explosion. Exactness: a term absent from the query multiplies by
    * 0, a term absent from the doc contributes a 0-valued decimal cell
    * — both add exact zero to the same order-free decimal sum the
    * postings face computes, so the two faces are value-identical (the
    * q51/q78 two-face contract; RetrievalSpec pins it). Use when
    * vocab ≤ ~10⁴ (the presence vectors must broadcast); the postings
    * face remains the sparse-vocabulary production path. */
  def bm25TopKDense(postings: DataFrame, queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = postings.localCheckpoint(eager = false) // consumers: df/stats/vocab/vectors
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = p.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // ordered vocabulary index (vocab-sized; the single-partition window
    // is the documented q115 exemption at this cardinality)
    val vocabIdx = dfreq.select(col("term"))
      .withColumn("idx", (row_number().over(Window.orderBy("term")) - 1).cast("int"))
    val vSize = vocabIdx.count().toInt
    val rankW = Window.partitionBy("qid").orderBy(col("bm25").desc, col("doc_id"))
    bm25DenseScoresFrom(p, dfreq, stats, vocabIdx, vSize, queryTerms, k1, b)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The dense pair-score kernel shared by [[bm25TopKDense]] and the
    * self-eval's sort-free rank counting: (qid, doc_id, bm25) for every
    * matching pair. Each cell is the EXACT per-(term, doc) DECIMAL(18,9)
    * contribution carried as its ×10⁹ scaled integer (an exact decimal
    * multiply) in a DOUBLE: every cell and every partial sum stays below
    * 2⁵³, so the codegen'd `graft_dot` fold is exact integer arithmetic
    * in disguise, and one exact toDouble + correctly-rounded ÷10⁹
    * reproduces the postings face's decimal-sum-cast bit for bit
    * (measured: the BigDecimal zip_with fold ran 52 s at sf0.1; this is
    * the q54 native-expression path). Pairs with no matching term (an
    * exact 0 — idf/tf factors are strictly positive, a real match
    * contributes ≥ ~10⁴ scaled units) are dropped to keep the two faces
    * row-identical. */
  private def bm25DenseScoresFrom(p: DataFrame, dfreq: DataFrame,
      stats: DataFrame, vocabIdx: DataFrame, vSize: Int,
      queryTerms: DataFrame, k1: Double, b: Double): DataFrame = {
    graft.functions.VectorExpressions.register(p.sparkSession)
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart = (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val docVecs = p
      .join(broadcast(dfreq.join(vocabIdx, "term").crossJoin(broadcast(stats))), "term")
      .select(col("doc_id"), col("idx"),
        (round(idf * tfPart, 9).cast("decimal(18,9)") * lit(1000000000L))
          .cast("long").cast("double").as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("c")))).as("m"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${vSize - 1}), i -> coalesce(m[i], 0D))")
        .as("cvec"))
    val qVecs = queryTerms.join(broadcast(vocabIdx), "term")
      .groupBy("qid")
      .agg(map_from_entries(collect_list(struct(col("idx"), lit(1.0)))).as("m"))
      .select(col("qid"), expr(
        s"transform(sequence(0, ${vSize - 1}), i -> coalesce(m[i], 0D))").as("qvec"))
    docVecs.crossJoin(broadcast(qVecs))
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        round(expr("graft_dot(cvec, qvec)") / 1e9, 6).as("bm25"))
      .filter(col("bm25") > 0.0)
  }

  /** Dense scores from raw postings + query terms — the entry the
    * self-eval uses (no ranking; its ranks come from counting). */
  private[graft] def bm25DenseScores(postings: DataFrame,
      queryTerms: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = postings.localCheckpoint(eager = false)
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = p.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val vocabIdx = dfreq.select(col("term"))
      .withColumn("idx", (row_number().over(Window.orderBy("term")) - 1).cast("int"))
    bm25DenseScoresFrom(p, dfreq, stats, vocabIdx, vocabIdx.count().toInt,
      queryTerms, k1, b)
  }

  /** Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09): fuse a
    * lexical and a semantic ranking into one list per query,
    * score = Σ 1/(rrfK + rank) over the lists that ranked the doc. Both
    * inputs are (qid, doc_id, rank). The fusion is a FULL OUTER equi-join
    * on (qid, doc_id) — each side is already top-k-bounded (queries × k
    * rows), so the join is tiny regardless of corpus size; the per-doc
    * score is two in-row IEEE divisions added in a fixed order, bit-equal
    * on any engine, so no decimal machinery is needed. */
  def rrfFusion(lex: DataFrame, sem: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = lex.select(col("qid"), col("doc_id"), col("rank").as("lex_rank"))
    val s = sem.select(col("qid"), col("doc_id"), col("rank").as("sem_rank"))
    val fusedScore = round(
      coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)), 6)
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
    l.join(s, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"), fusedScore.as("rrf"),
        col("lex_rank"), col("sem_rank"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The 100 TB form of q86: fuse BM25 with the MULTI-PROBE LSH ANN
    * ranking instead of the exact cosine scan — same RRF contract, the
    * semantic side's cost drops from queries × corpus dot products to
    * the (band, key) candidate join. Exact-cosine q86 stays as the
    * oracle-checked baseline; RetrievalSpec gates this form's agreement
    * against it (ANN recall is the only approximation — fused scores of
    * surfaced docs are identical by construction). */
  def hybridRetrievalAnn(docs: DataFrame, embeddings: DataFrame,
      nQueries: Int, k: Int, planesPerBand: Int = 6, bands: Int = 16,
      probes: Int = 2): DataFrame = {
    val lex = bm25TopK(docs, col("doc_id") < nQueries, k = 2 * k)
      .select(col("qid"), col("doc_id"), col("rank"))
    val sem = Similarity.annLshTopK(embeddings, nQueries, k = 2 * k,
        planesPerBand, bands, probes)
      .select(col("qid"), col("nid").as("doc_id"), col("rank"))
    rrfFusion(lex, sem, k)
  }

  /** Retrieval-quality evaluation with FREE ground truth (q150): query
    * the corpus with EDITED copies of its own documents (the q124
    * derived snapshot's 'changed' docs — text + ' rev2') and measure
    * whether BM25 finds each edit's original: recall@1, recall@k, and
    * MRR. No human labels, no circularity — the relevance judgment is
    * the identity mapping the edit construction defines. This is the
    * regression gate a retrieval stack runs when anything upstream
    * (tokenizer, index params, scoring) changes.
    *
    * Query ids ride at +1000000 so the probe's more-like-this
    * self-exclusion (doc_id != qid) can never mask the target. Per-query
    * reciprocal ranks round to DECIMAL(18,9) pre-sum (the q87
    * discipline); misses contribute zero. Scale shape: the postings
    * barrier + broadcast query terms are q84's; the metric collapse is
    * hits-sized. */
  def retrievalSelfEval(docs: DataFrame, k: Int = 10): DataFrame = {
    val queries = docs
      .filter(col("doc_id") % 7 === 0 &&
        substring(md5(col("text")), 1, 1) =!= "f")
      .select((col("doc_id") + 1000000L).as("qid"),
        concat(col("text"), lit(" rev2")).as("qtext"))
    val qTerms = queries.select(col("qid"),
      explode(array_distinct(words(col("qtext")))).as("term"))
    // dense face: this corpus's vocabulary is ~30 ubiquitous words, so
    // the postings probe explodes to |queries|·|docs|·|vocab| matched
    // rows (measured 67 s at sf0.1); the dense dot product computes the
    // IDENTICAL scores in |queries|·|docs| rows (RetrievalSpec pins the
    // two faces equal; the DuckDB oracle is the postings formulation).
    // Ranks come from COUNTING, not sorting: only each query's TARGET
    // rank feeds the metrics, and rank(target) = 1 + |docs ordered
    // before it| — a broadcast join + aggregate instead of a full
    // per-query sort of every score.
    val scores = bm25DenseScores(bm25Postings(docs), qTerms)
      .localCheckpoint(eager = false) // consumers: target scores + rank counts
    val targets = scores.filter(col("doc_id") === col("qid") - 1000000L)
      .select(col("qid"), col("doc_id").as("tdoc"), col("bm25").as("tscore"))
    val hits = scores.join(broadcast(targets), Seq("qid"))
      .filter(col("bm25") > col("tscore") ||
        (col("bm25") === col("tscore") && col("doc_id") < col("tdoc")))
      .groupBy("qid").agg(count(lit(1)).as("better"))
      .join(targets.select(col("qid")), Seq("qid"), "right")
      .select((coalesce(col("better"), lit(0L)) + 1L).as("rank"))
      .filter(col("rank") <= k)
    val nQ = queries.agg(count(lit(1)).as("n_queries"))
    val h = hits.agg(
      sum(when(col("rank") === 1, 1L).otherwise(0L)).as("h1"),
      count(lit(1)).as("hk"),
      sum(round(lit(1.0) / col("rank"), 9).cast("decimal(18,9)")).as("rr"))
    nQ.crossJoin(broadcast(h))
      .select(col("n_queries"),
        coalesce(col("h1"), lit(0L)).as("hits_at_1"),
        coalesce(col("hk"), lit(0L)).as("hits_at_k"),
        round(coalesce(col("h1"), lit(0L)).cast("double")
          / nullif(col("n_queries"), lit(0L)), 6).as("recall_at_1"),
        round(coalesce(col("hk"), lit(0L)).cast("double")
          / nullif(col("n_queries"), lit(0L)), 6).as("recall_at_k"),
        round(coalesce(col("rr").cast("double"), lit(0.0))
          / nullif(col("n_queries"), lit(0L)), 6).as("mrr"))
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- retrieval self-evaluation: edited copies as queries, the
    //      original as ground truth — recall@1/@k and MRR. ----
    "q150_retrieval_self_eval" -> QueryDef.sql(
      """WITH w AS (SELECT doc_id, list_filter(string_split(trim(text),' '), x -> x != '') AS ws
        |           FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf
        |       FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w)
        |       GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM w WHERE len(ws) > 0),
        |qd AS (SELECT doc_id + 1000000 AS qid, text || ' rev2' AS qtext
        |       FROM documents
        |       WHERE doc_id % 7 = 0 AND substring(md5(text), 1, 1) != 'f'),
        |q AS (SELECT DISTINCT qid,
        |        unnest(list_filter(string_split(trim(qtext),' '), x -> x != '')) AS term
        |      FROM qd),
        |contrib AS (
        |  SELECT q.qid, tf.doc_id,
        |    CAST(round(
        |      ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
        |      * (CAST(tf AS DOUBLE) * 2.2)
        |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
        |      9) AS DECIMAL(18,9)) AS c
        |  FROM q
        |  JOIN tf ON tf.term = q.term AND tf.doc_id != q.qid
        |  JOIN dfreq ON dfreq.term = q.term
        |  CROSS JOIN stats),
        |scores AS (SELECT qid, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS bm25
        |           FROM contrib GROUP BY 1, 2),
        |r AS (SELECT qid, doc_id,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
        |      FROM scores),
        |hits AS (SELECT rank FROM r WHERE rank <= 10 AND doc_id = qid - 1000000),
        |nq AS (SELECT count(*) AS n_queries FROM qd),
        |h AS (SELECT CAST(sum(CASE WHEN rank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |        count(*) AS hk,
        |        sum(CAST(round(1.0 / rank, 9) AS DECIMAL(18,9))) AS rr
        |      FROM hits)
        |SELECT n_queries,
        |  coalesce(h1, 0) AS hits_at_1,
        |  coalesce(hk, 0) AS hits_at_k,
        |  round(CAST(coalesce(h1, 0) AS DOUBLE) / nullif(n_queries, 0), 6) AS recall_at_1,
        |  round(CAST(coalesce(hk, 0) AS DOUBLE) / nullif(n_queries, 0), 6) AS recall_at_k,
        |  round(coalesce(CAST(rr AS DOUBLE), 0.0) / nullif(n_queries, 0), 6) AS mrr
        |FROM nq CROSS JOIN h""") { (s, dir) =>
      retrievalSelfEval(Tables.documents(s, dir))
    },

    // ---- BM25 top-k retrieval: first 10 docs are the query set,
    //      scored against the rest of the corpus (more-like-this /
    //      hard-negative mining shape) ----
    "q84_bm25_topk" -> QueryDef.sql(
      """WITH w AS (SELECT doc_id, list_filter(string_split(trim(text),' '), x -> x != '') AS ws
        |           FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf
        |       FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w)
        |       GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM w WHERE len(ws) > 0),
        |q AS (SELECT DISTINCT doc_id AS qid, unnest(ws) AS term FROM w WHERE doc_id < 10),
        |contrib AS (
        |  SELECT q.qid, tf.doc_id,
        |    CAST(round(
        |      ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
        |      * (CAST(tf AS DOUBLE) * 2.2)
        |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
        |      9) AS DECIMAL(18,9)) AS c
        |  FROM q
        |  JOIN tf ON tf.term = q.term AND tf.doc_id != q.qid
        |  JOIN dfreq ON dfreq.term = q.term
        |  CROSS JOIN stats),
        |scores AS (SELECT qid, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS bm25
        |           FROM contrib GROUP BY 1, 2),
        |r AS (SELECT qid, doc_id, bm25,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
        |      FROM scores)
        |SELECT qid, doc_id, bm25, rank FROM r WHERE rank <= 10
        |ORDER BY qid, rank""") { (s, dir) =>
      bm25TopK(Tables.documents(s, dir), col("doc_id") < 10, k = 10)
        .orderBy("qid", "rank")
    },

    // ---- hybrid retrieval: RRF fusion of the BM25 lexical ranking and
    //      the exact-cosine semantic ranking (the standard two-tower +
    //      keyword retrieval stack for hard-negative mining). Both
    //      rankings are top-20-bounded before the fusion join, so the
    //      fusion itself is queries × k sized at any corpus scale. ----
    "q86_hybrid_retrieval_rrf" -> QueryDef.sql(
      """WITH w AS (SELECT doc_id, list_filter(string_split(trim(text),' '), x -> x != '') AS ws
        |           FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf
        |       FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w)
        |       GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM w WHERE len(ws) > 0),
        |q AS (SELECT DISTINCT doc_id AS qid, unnest(ws) AS term FROM w WHERE doc_id < 10),
        |contrib AS (
        |  SELECT q.qid, tf.doc_id,
        |    CAST(round(
        |      ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
        |      * (CAST(tf AS DOUBLE) * 2.2)
        |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
        |      9) AS DECIMAL(18,9)) AS c
        |  FROM q
        |  JOIN tf ON tf.term = q.term AND tf.doc_id != q.qid
        |  JOIN dfreq ON dfreq.term = q.term
        |  CROSS JOIN stats),
        |bscores AS (SELECT qid, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS bm25
        |            FROM contrib GROUP BY 1, 2),
        |lex AS (SELECT qid, doc_id,
        |          CAST(row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
        |        FROM bscores),
        |lex20 AS (SELECT qid, doc_id, lex_rank FROM lex WHERE lex_rank <= 20),
        |eq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT eq.vec_id AS qid, e.vec_id AS doc_id,
        |    round(sum(CAST(eq.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE))
        |      / (sqrt(sum(CAST(eq.embedding[i.i] AS DOUBLE) * CAST(eq.embedding[i.i] AS DOUBLE)))
        |         * sqrt(sum(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM eq, embeddings e, (SELECT unnest(range(1, 4097)) AS i) i
        |  WHERE e.vec_id != eq.vec_id AND i.i <= len(e.embedding)
        |  GROUP BY eq.vec_id, e.vec_id),
        |sem AS (SELECT qid, doc_id,
        |          CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS sem_rank
        |        FROM p),
        |sem20 AS (SELECT qid, doc_id, sem_rank FROM sem WHERE sem_rank <= 20),
        |f AS (SELECT qid, doc_id,
        |        round(coalesce(1.0 / (60 + lex_rank), 0)
        |              + coalesce(1.0 / (60 + sem_rank), 0), 6) AS rrf,
        |        lex_rank, sem_rank
        |      FROM lex20 FULL OUTER JOIN sem20 USING (qid, doc_id)),
        |r AS (SELECT qid, doc_id, rrf, lex_rank, sem_rank,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
        |      FROM f)
        |SELECT qid, doc_id, rrf, lex_rank, sem_rank, rank FROM r WHERE rank <= 10
        |ORDER BY qid, rank""") { (s, dir) =>
      val lex = bm25TopK(Tables.documents(s, dir), col("doc_id") < 10, k = 20)
        .select(col("qid"), col("doc_id"), col("rank"))
      val sem = Similarity.cosineTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 20)
        .select(col("qid"), col("nid").as("doc_id"), col("rank"))
      rrfFusion(lex, sem, k = 10).orderBy("qid", "rank")
    }
  )
}
