package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-maintenance operators: the jobs a training-data pipeline runs
  * BETWEEN crawls — reconcile a new snapshot against the previous one
  * (q124), normalize raw text before any downstream hashing or
  * tokenization (q125), and audit per-source lexical diversity for the
  * dataset datasheet (q129).
  *
  * Reference context: the reference's sync loop re-fetches sources and
  * appends only new artifacts (dedup-append keyed on content sha256 —
  * run_capture.py's provenance contract); q124 is that reconciliation
  * generalized to a whole-corpus diff, q125 is the canonicalization it
  * applies before hashing (canonical JSON — here canonical text).
  *
  * Scale design:
  *  - q124 joins the two snapshots on the 8-byte doc_id carrying ONLY
  *    32-byte sha256 digests — never text — so the shuffle is
  *    ~40 B/row regardless of document size; no side is assumed small
  *    (both are corpus-sized → sort-merge is the correct shape).
  *  - q125 is a pure per-row column expression chain (regexp_replace
  *    folds): shuffle-free, fully codegen'd, streams at scan speed.
  *  - q129 tokenizes once behind a barrier (two consumers: unigram and
  *    bigram aggregations — the q51 subtree-recompute guard) and
  *    shuffles (source, token) pairs; counts are exact (the datasheet
  *    face); a 100 TB run swaps count_distinct for HLL the way
  *    q98 does vs q96.
  */
object Maintenance {

  private def words(c: Column): Column = Text.words(c)

  // ---------------------------------------------------------------------
  // q124 snapshot diff
  // ---------------------------------------------------------------------

  /** Changeset between two corpus snapshots keyed by doc_id: rows are
    * 'added' (key only in `newDf`), 'removed' (key only in `oldDf`), or
    * 'changed' (both, content digest differs); unchanged rows are
    * dropped. Digests travel instead of text, so the join shuffle is
    * fixed-width per row. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val a = oldDf.select(col("doc_id"), sha2(col("text"), 256).as("old_digest"))
    val b = newDf.select(col("doc_id"), sha2(col("text"), 256).as("new_digest"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"), col("old_digest"), col("new_digest"))
  }

  /** Deterministic stand-in for "the next crawl" so the diff has a fixed
    * oracle on one physical snapshot: docs whose md5(text) starts 'f'
    * are dropped (~1/16 removals), docs with doc_id % 7 = 0 get ' rev2'
    * appended (edits), and docs with doc_id % 13 = 0 spawn a new doc at
    * doc_id + 1000000 with ' new' appended (additions; the offset is
    * far above any testdata doc_id). Both engines construct the
    * byte-identical snapshot — the q72 planted-data discipline. */
  private def derivedSnapshot(docs: DataFrame): DataFrame = {
    val kept = docs.filter(substring(md5(col("text")), 1, 1) =!= "f")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    val added = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" new")).as("text"))
    kept.unionByName(added)
  }

  // ---------------------------------------------------------------------
  // q139 fuzzy snapshot diff
  // ---------------------------------------------------------------------

  /** The near-dup layer over [[snapshotDiff]]: for every doc the exact
    * diff reports as 'added' or 'changed', the best-Jaccard match in the
    * OLD snapshot (distinct word 8-grams), with attribution. The exact
    * diff says THAT content changed; this says HOW MUCH and WHAT an
    * "added" doc is actually a near-copy of — the recrawl-with-small-
    * edits detector a corpus reconciliation runs before counting
    * additions as new data.
    *
    * Scale shape: the changed/added set is semi-filtered BEFORE
    * shingling (the q101 lesson — never explode the whole new snapshot
    * to score a small changeset); the old-snapshot shingle index joins
    * by SHUFFLE on the shingle key (both sides corpus-sized — broadcast
    * is q101's luxury, not available here) with the standard df cap as
    * the skew guard; the argmax is a map-side max(struct), never a
    * window. Self-pairs (same doc_id across snapshots) are the POINT:
    * a 'changed' doc's best match is usually its old self. */
  def snapshotFuzzyDiff(oldDf: DataFrame, newDf: DataFrame,
      n: Int = 8, threshold: Double = 0.5): DataFrame = {
    val st = snapshotDiff(oldDf, newDf)
      .filter(col("status").isin("added", "changed"))
      .select(col("doc_id"), col("status"))
      .localCheckpoint(eager = false) // consumers: semi filter + output join
    // hashed-identity shingle streams on BOTH sides (r17, the q74
    // change): every consumer is identity-only (set sizes + the
    // intersection counts; no shingle surfaces), so neither snapshot
    // builds n-gram strings and the index join keys on 8-byte longs
    val bSh = Curation.shingleHashesN(
        newDf.join(st.select(col("doc_id")), Seq("doc_id"), "left_semi"), n)
      .select(col("doc_id").as("b_id"), col("sh"))
      .localCheckpoint(eager = false) // consumers: sizes + index join
    val aSh = Curation.shingleHashesN(oldDf, n)
      .select(col("doc_id").as("a_id"), col("sh"))
      .localCheckpoint(eager = false) // consumers: sizes + index join
    val na = aSh.groupBy("a_id").agg(count(lit(1)).as("n_a"))
    val nb = bSh.groupBy("b_id").agg(count(lit(1)).as("n_b"))
    val inter = aSh.join(bSh, Seq("sh"))
      .groupBy("b_id", "a_id").agg(count(lit(1)).as("n_inter"))
    // raw-double jaccard for the argmax (integer ratio — one correctly-
    // rounded division, engine-identical; the q101 argmax discipline),
    // rounded only in the output
    val jac = inter.join(nb, Seq("b_id")).join(na, Seq("a_id"))
      .select(col("b_id"), col("a_id"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jac"))
    val best = jac
      .groupBy("b_id")
      .agg(max(struct(col("jac"), (-col("a_id")).as("neg"))).as("m"))
      .select(col("b_id").as("doc_id"), (-col("m.neg")).as("best_match"),
        col("m.jac").as("jac"))
    st.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("status"), col("best_match"),
        round(col("jac"), 6).as("best_jaccard"),
        coalesce(col("jac") >= threshold, lit(false)).as("near_dup"))
  }

  // ---------------------------------------------------------------------
  // q143 per-source snapshot drift
  // ---------------------------------------------------------------------

  /** Per-source unigram-distribution drift between two snapshots:
    * KL(p_new ‖ p_old) with add-half smoothing over each source's UNION
    * vocabulary (new words have no old count — smoothing is what makes
    * the divergence finite), plus the argmax drift word. The monitoring
    * face of the snapshot family: q124 says WHICH docs changed, q139
    * what they're copies of, THIS whether a source's language shifted —
    * the audit that catches a domain pivot or spam flood between crawls
    * even when every individual diff looks routine. q122 is the same
    * statistic ACROSS sources within one snapshot.
    *
    * Determinism: counts are exact integers; each term is a fixed
    * sequence of correctly-rounded double ops rounded to DECIMAL(18,9)
    * pre-sum (the q105/q122 discipline). Scale shape: two corpus scans
    * (one per snapshot) collapse to (source, word) counts; the
    * full-outer union-vocab join and everything after are
    * sources×vocab-bounded; the count frame sits behind a barrier for
    * its two consumers (totals + contributions). */
  def snapshotDrift(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(col("source"), explode(words(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as(as))
    val j = counts(oldDf, "c_a").join(counts(newDf, "c_b"),
        Seq("source", "w"), "full_outer")
      .select(col("source"), col("w"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .localCheckpoint(eager = false) // consumers: totals + contributions
    val tot = j.groupBy("source").agg(
      sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("v"))
    val pB = (col("c_b") + 0.5) / (col("n_b") + col("v") * 0.5)
    val pA = (col("c_a") + 0.5) / (col("n_a") + col("v") * 0.5)
    val con = j.join(tot, Seq("source"))
      .select(col("source"), col("w"),
        round(pB * log(pB / pA), 9).cast("decimal(18,9)").as("ct"))
      .localCheckpoint(eager = false) // consumers: KL sum + argmax
    val kl = con.groupBy("source")
      .agg(round(sum(col("ct")).cast("double"), 6).as("kl_drift"))
    val top = con.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("ct").desc, col("w"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("w").as("top_word"),
        round(col("ct").cast("double"), 6).as("top_contrib"))
    kl.join(tot, Seq("source")).join(top, Seq("source"))
      .select(col("source"), col("n_a").as("n_tokens_old"),
        col("n_b").as("n_tokens_new"), col("v").as("union_vocab"),
        col("kl_drift"), col("top_word"), col("top_contrib"))
  }

  /** [[derivedSnapshot]] with the source column retained — q143 needs
    * per-source attribution; additions inherit their origin's source. */
  private def derivedSnapshotWithSource(docs: DataFrame): DataFrame = {
    val kept = docs.filter(substring(md5(col("text")), 1, 1) =!= "f")
      .select(col("source"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    val added = docs.filter(col("doc_id") % 13 === 0)
      .select(col("source"), concat(col("text"), lit(" new")).as("text"))
    kept.unionByName(added)
  }

  // ---------------------------------------------------------------------
  // q125 text normalization
  // ---------------------------------------------------------------------

  /** Canonical text: strip C0 control chars + DEL (keeping \t \r \n,
    * which are then mapped to spaces), collapse space runs, trim. The
    * class lists are shared with the oracle-SQL builder below so the two
    * sides cannot drift. */
  private val ctrlClass = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""
  private val wsClass = """[\t\r\n]"""

  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(regexp_replace(c, ctrlClass, ""), wsClass, " "),
      " {2,}", " "))

  private def normalizeSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(regexp_replace($e, '$ctrlClass', '', 'g'), '$wsClass', ' ', 'g'), ' {2,}', ' ', 'g'))"

  /** Planted noise, a pure function of doc_id (q72 discipline): tab+space
    * prefix (%3), doubled inner spaces (%2), trailing BEL+VT (%5), CRLF
    * suffix (%7). Every planted byte is exactly what [[normalizeText]]
    * removes, so the cleaned text must round-trip to the original —
    * which the spec asserts row-for-row. */
  private def noisyText(): Column = concat(
    when(col("doc_id") % 3 === 0, lit("\t ")).otherwise(""),
    when(col("doc_id") % 2 === 0, regexp_replace(col("text"), " ", "  "))
      .otherwise(col("text")),
    when(col("doc_id") % 5 === 0, concat(lit(" "), lit("\u0007\u000B"))).otherwise(""),
    when(col("doc_id") % 7 === 0, lit("\r\n")).otherwise(""))

  private val noisyTextSql: String =
    """concat(CASE WHEN doc_id % 3 = 0 THEN chr(9) || ' ' ELSE '' END,
      |      CASE WHEN doc_id % 2 = 0 THEN replace(text, ' ', '  ') ELSE text END,
      |      CASE WHEN doc_id % 5 = 0 THEN ' ' || chr(7) || chr(11) ELSE '' END,
      |      CASE WHEN doc_id % 7 = 0 THEN chr(13) || chr(10) ELSE '' END)""".stripMargin

  // ---------------------------------------------------------------------
  // q129 per-source lexical diversity
  // ---------------------------------------------------------------------

  /** Per-source type-token ratio and distinct-bigram ratio — the
    * standard diversity audit for synthetic/generated data (low distinct
    * n-gram share = template collapse). Exact counts; the 100 TB path
    * swaps count_distinct for the q98 HLL sketch. */
  def sourceDiversity(docs: DataFrame): DataFrame = {
    // one tokenize, two consumers (unigram + bigram aggregations)
    val tok = docs.select(col("source"), words(col("text")).as("ws"))
      .localCheckpoint(eager = false)
    val uni = tok.select(col("source"), explode(col("ws")).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("n_types"))
    val big = tok.filter(size(col("ws")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))")).as("b"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("b")).as("n_distinct_bigrams"))
    uni.join(big, Seq("source"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        col("n_bigrams"), col("n_distinct_bigrams"),
        round(col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 6)
          .as("bigram_diversity"))
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- corpus snapshot reconciliation: the changeset a re-crawl
    //      produces against the previous snapshot (added / removed /
    //      changed), computed from content digests so the corpus-sized
    //      join never moves text. ----
    "q124_snapshot_diff" -> QueryDef.sql(
      """WITH a AS (SELECT doc_id, sha256(text) AS old_digest FROM documents),
        |b0 AS (SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
        |       FROM documents WHERE substring(md5(text), 1, 1) != 'f'
        |       UNION ALL
        |       SELECT doc_id + 1000000, text || ' new' FROM documents WHERE doc_id % 13 = 0),
        |b AS (SELECT doc_id, sha256(text) AS new_digest FROM b0),
        |d AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, old_digest, new_digest,
        |        CASE WHEN a.doc_id IS NULL THEN 'added'
        |             WHEN b.doc_id IS NULL THEN 'removed'
        |             WHEN old_digest != new_digest THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id, status, old_digest, new_digest FROM d
        |WHERE status != 'unchanged' ORDER BY doc_id""") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      snapshotDiff(docs, derivedSnapshot(docs)).orderBy("doc_id")
    },

    // ---- fuzzy snapshot reconciliation: the near-dup layer over q124 —
    //      best old-snapshot Jaccard match for every added/changed doc
    //      (how much did it change; what is an "added" doc a copy of). ----
    "q139_snapshot_fuzzy_diff" -> QueryDef.sql(
      """WITH b0 AS (SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
        |       FROM documents WHERE substring(md5(text), 1, 1) != 'f'
        |       UNION ALL
        |       SELECT doc_id + 1000000, text || ' new' FROM documents WHERE doc_id % 13 = 0),
        |ad AS (SELECT doc_id, sha256(text) AS dg FROM documents),
        |bd AS (SELECT doc_id, sha256(text) AS dg FROM b0),
        |st AS (SELECT b.doc_id,
        |         CASE WHEN a.doc_id IS NULL THEN 'added' ELSE 'changed' END AS status
        |       FROM bd b LEFT JOIN ad a ON a.doc_id = b.doc_id
        |       WHERE a.doc_id IS NULL OR a.dg != b.dg),
        |wA AS (SELECT doc_id, list_filter(string_split(trim(text),' '), x -> x != '') AS ws
        |       FROM documents),
        |aSh AS (SELECT DISTINCT doc_id AS a_id,
        |          unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] for i in range(1, len(ws)-6)]) AS sh
        |        FROM wA WHERE len(ws) >= 8),
        |wB AS (SELECT b0.doc_id, list_filter(string_split(trim(b0.text),' '), x -> x != '') AS ws
        |       FROM b0 JOIN st USING (doc_id)),
        |bSh AS (SELECT DISTINCT doc_id AS b_id,
        |          unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] for i in range(1, len(ws)-6)]) AS sh
        |        FROM wB WHERE len(ws) >= 8),
        |na AS (SELECT a_id, count(*) AS n_a FROM aSh GROUP BY 1),
        |nb AS (SELECT b_id, count(*) AS n_b FROM bSh GROUP BY 1),
        |inter AS (SELECT b_id, a_id, count(*) AS n_inter FROM aSh JOIN bSh USING (sh) GROUP BY 1, 2),
        |j AS (SELECT b_id, a_id, CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jac
        |      FROM inter JOIN nb USING (b_id) JOIN na USING (a_id)),
        |best AS (SELECT b_id, a_id, jac,
        |           row_number() OVER (PARTITION BY b_id ORDER BY jac DESC, a_id) AS rn
        |         FROM j)
        |SELECT st.doc_id, st.status, b.a_id AS best_match,
        |  round(b.jac, 6) AS best_jaccard,
        |  coalesce(b.jac >= 0.5, false) AS near_dup
        |FROM st LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON st.doc_id = b.b_id
        |ORDER BY doc_id""") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      snapshotFuzzyDiff(docs, derivedSnapshot(docs)).orderBy("doc_id")
    },

    // ---- per-source snapshot drift: KL(new ‖ old) of each source's
    //      unigram distribution across the recrawl, with argmax-word
    //      attribution — the language-shift monitor between crawls. ----
    "q143_snapshot_drift" -> QueryDef.sql(
      """WITH b0 AS (SELECT source,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
        |       FROM documents WHERE substring(md5(text), 1, 1) != 'f'
        |       UNION ALL
        |       SELECT source, text || ' new' FROM documents WHERE doc_id % 13 = 0),
        |ta AS (SELECT source, unnest(list_filter(string_split(trim(text),' '), x -> x != '')) AS w
        |       FROM documents),
        |tb AS (SELECT source, unnest(list_filter(string_split(trim(text),' '), x -> x != '')) AS w
        |       FROM b0),
        |ca AS (SELECT source, w, count(*) AS c_a FROM ta GROUP BY 1, 2),
        |cb AS (SELECT source, w, count(*) AS c_b FROM tb GROUP BY 1, 2),
        |j AS (SELECT source, w, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
        |      FROM ca FULL JOIN cb USING (source, w)),
        |tot AS (SELECT source, CAST(sum(c_a) AS BIGINT) AS n_a,
        |          CAST(sum(c_b) AS BIGINT) AS n_b, count(*) AS v
        |        FROM j GROUP BY 1),
        |con AS (SELECT j.source, j.w,
        |    CAST(round(((c_b + 0.5) / (n_b + 0.5 * v))
        |      * ln(((c_b + 0.5) / (n_b + 0.5 * v)) / ((c_a + 0.5) / (n_a + 0.5 * v))), 9)
        |      AS DECIMAL(18,9)) AS ct
        |  FROM j JOIN tot USING (source)),
        |kl AS (SELECT source, round(CAST(sum(ct) AS DOUBLE), 6) AS kl_drift
        |       FROM con GROUP BY 1),
        |top AS (SELECT source, w, ct,
        |          row_number() OVER (PARTITION BY source ORDER BY ct DESC, w) AS rn
        |        FROM con)
        |SELECT source, n_a AS n_tokens_old, n_b AS n_tokens_new, v AS union_vocab,
        |  kl_drift, t.w AS top_word, round(CAST(t.ct AS DOUBLE), 6) AS top_contrib
        |FROM kl JOIN tot USING (source)
        |JOIN (SELECT source, w, ct FROM top WHERE rn = 1) t USING (source)
        |ORDER BY source""") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      snapshotDrift(docs.select(col("source"), col("text")),
        derivedSnapshotWithSource(docs)).orderBy("source")
    },

    // ---- text normalization: strip control chars, unify whitespace,
    //      collapse runs, trim — the canonicalization that must run
    //      before any content hashing (q50/q124) or tokenization, since
    //      two byte-different renderings of the same text would
    //      otherwise defeat exact dedup. Planted noise round-trips to
    //      the original text (spec-asserted). ----
    "q125_normalize_text" -> QueryDef.sql(
      s"""WITH n AS (SELECT doc_id, text,
        |    $noisyTextSql
        |    AS noisy
        |  FROM documents)
        |SELECT doc_id,
        |  length(noisy) AS n_chars_noisy,
        |  ${normalizeSql("noisy")} AS clean,
        |  length(${normalizeSql("noisy")}) AS n_chars_clean,
        |  ${normalizeSql("noisy")} = text AS roundtrip
        |FROM n ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), noisyText().as("noisy"))
        .select(col("doc_id"),
          length(col("noisy")).cast("long").as("n_chars_noisy"),
          normalizeText(col("noisy")).as("clean"),
          length(normalizeText(col("noisy"))).cast("long").as("n_chars_clean"),
          (normalizeText(col("noisy")) === col("text")).as("roundtrip"))
        .orderBy("doc_id")
    },

    // ---- per-source lexical diversity: TTR + distinct-bigram ratio,
    //      the datasheet signal that catches template-collapsed or
    //      machine-generated sources (near-1.0 bigram diversity = fresh
    //      text; low = boilerplate). ----
    "q129_source_diversity" -> QueryDef.sql(
      """WITH w AS (SELECT source, list_filter(string_split(trim(text),' '), x -> x != '') AS ws
        |           FROM documents),
        |t AS (SELECT source, unnest(ws) AS w FROM w),
        |ts AS (SELECT source, count(*) AS n_tokens, count(DISTINCT w) AS n_types
        |       FROM t GROUP BY 1),
        |bg AS (SELECT source, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b
        |       FROM w WHERE len(ws) >= 2),
        |bs AS (SELECT source, count(*) AS n_bigrams, count(DISTINCT b) AS n_distinct_bigrams
        |       FROM bg GROUP BY 1)
        |SELECT source, n_tokens, n_types,
        |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
        |  n_bigrams, n_distinct_bigrams,
        |  round(CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 6) AS bigram_diversity
        |FROM ts JOIN bs USING (source) ORDER BY source""") { (s, dir) =>
      sourceDiversity(Tables.documents(s, dir)).orderBy("source")
    })
}
