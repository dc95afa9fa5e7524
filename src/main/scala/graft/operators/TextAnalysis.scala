package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north star in
  * BASELINE.json): token counting, quality scoring, language ID, document
  * fingerprinting. All per-row column expressions — no UDFs, fully
  * codegen'd, shuffle-free until the final aggregation, so they stream
  * through a 100 TB corpus at scan speed.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped — delegates to
    * [[Text.words]], the single tokenizer shared by every operator
    * family. */
  private def words(c: Column): Column = Text.words(c)

  private val stopwordsEn = Seq("the", "a", "and", "of", "to", "is", "in")

  /** The q41 heuristic-quality features, shared by every consumer of the
    * score (q41's oracle face, q167's percentile normalization) so the
    * formula cannot drift between them. Keeps the input's other columns.
    *
    * nullif guards: an empty/whitespace-only doc has n_chars or n_words
    * = 0, and Spark's non-ANSI divide yields NULL while DuckDB's double
    * divide yields inf/NaN — nullif in BOTH engines makes the degenerate
    * rows agree (NULL quality; least() skips the NULL factor identically
    * on both sides). */
  private[graft] def qualityFeatures(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val stopArr = array(stopwordsEn.map(lit): _*)
    docs
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_words", size(words(col("text"))).cast("long"))
      .withColumn("n_punct", expr("regexp_count(text, '[^A-Za-z0-9 ]')").cast("long"))
      .withColumn("n_stop",
        size(filter(words(col("text")), w => array_contains(stopArr, w))).cast("long"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / nullif(col("n_words"), lit(0L)), 6))
      .withColumn("quality", round(
        least(col("n_words").cast("double") / 20.0, lit(1.0))
          * (lit(1.0) - col("n_punct").cast("double") / nullif(col("n_chars"), lit(0L)))
          * (lit(0.5) + lit(0.5) *
              least(col("n_stop").cast("double") / nullif(col("n_words"), lit(0L)) * 5.0, lit(1.0))),
        6))
  }

  /** Per-source percentile normalization of the q41 quality score: the
    * raw heuristic is NOT comparable across sources (a boilerplate-heavy
    * source's median may outscore a clean source's p90), so curation
    * thresholds must cut on the WITHIN-SOURCE percentile. Ranks are
    * hierarchical (within-bucket row_number on floor(quality·50) value
    * buckets + exclusive per-source offsets — the q121/q149 discipline;
    * never a per-source global window that collapses a source onto one
    * partition); pct = (rank−1)/(n−1), one correctly-rounded division.
    * Degenerate docs (NULL quality) are excluded. The oracle's per-source
    * percent_rank-style windows prove the decomposition exact. */
  def qualityPercentileNorm(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = qualityFeatures(docs)
      .select(col("doc_id"), col("source"), col("quality"))
      .filter(col("quality").isNotNull)
      .withColumn("bkt", floor(col("quality") * 50).cast("long"))
      .localCheckpoint(eager = false) // consumers: ranks + offsets + counts
    val rnIn = base.withColumn("rn_in", row_number().over(
      Window.partitionBy("source", "bkt").orderBy("quality", "doc_id")))
    val offsets = base.groupBy("source", "bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.partitionBy("source").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src",
        sum(col("cnt")).over(Window.partitionBy("source")))
      .select(col("source"), col("bkt"), col("off"), col("n_src"))
    rnIn.join(offsets, Seq("source", "bkt"))
      .select(col("doc_id"), col("source"), col("quality"),
        (col("off") + col("rn_in")).as("rk"),
        when(col("n_src") === 1, lit(0.0)).otherwise(
          round((col("off") + col("rn_in") - 1).cast("double")
            / (col("n_src") - 1), 6)).as("pct_rank"))
      .orderBy("doc_id")
  }

  /** Per-doc character-level Shannon entropy (nats): the gibberish /
    * degenerate-text signal the word-level quality heuristics (q41) and
    * repetition stats can't see — base64 blobs score high, single-char
    * floods score ~0. H = ln N − (Σ n_c·ln n_c)/N over exact integer
    * character counts; each n·ln n term rounds to DECIMAL(18,9) before
    * the order-free sum (the q116/q143 ln discipline), so both engines
    * derive identical digits. Scale shape: one explode to (doc, char)
    * cells that collapses under map-side combine — the per-doc state is
    * the doc's distinct-char histogram, never its text.
    *
    * Characters are CODE POINTS via the native `graft_codepoints`
    * (built-in `split(text, '')` splits UTF-16 code units, so emoji /
    * astral CJK would become two lone-surrogate cells and diverge from
    * the oracle's code-point `string_split` — invisible on ASCII,
    * wrong on any real crawl). */
  def charEntropy(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    val cells = docs
      .select(col("doc_id"), explode(expr("graft_codepoints(text)")).as("c"))
      .filter(col("c") =!= "")
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
    cells.groupBy("doc_id").agg(
        sum(col("n")).as("n_chars"),
        count(lit(1)).as("n_distinct"),
        sum(expr("CAST(round(n * ln(n), 9) AS DECIMAL(18,9))")).as("t"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct"),
        round(log(col("n_chars")) - col("t").cast("double") / col("n_chars"), 6)
          .as("entropy_nats"))
      .orderBy("doc_id")
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- char-level Shannon entropy: the degenerate-text detector;
    //      exact integer histograms, decimal-summed ln terms. ----
    "q163_char_entropy" -> QueryDef.sql(
      """WITH cells AS (
        |  SELECT doc_id, c, count(*) AS n FROM (
        |    SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
        |  WHERE c != '' GROUP BY 1, 2),
        |g AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
        |        count(*) AS n_distinct,
        |        sum(CAST(round(n * ln(n), 9) AS DECIMAL(18,9))) AS t
        |      FROM cells GROUP BY 1)
        |SELECT doc_id, n_chars, n_distinct,
        |  round(ln(n_chars) - CAST(t AS DOUBLE) / n_chars, 6) AS entropy_nats
        |FROM g ORDER BY doc_id""") { (s, dir) =>
      charEntropy(Tables.documents(s, dir))
    },

    // ---- per-source quality percentile normalization: cross-source
    //      comparable scores via hierarchical within-source ranks. ----
    "q167_quality_percentile_norm" -> QueryDef.sql(
      """WITH f AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(trim(text),' '), x -> x != '')) AS n_words,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
        |    len(list_filter(string_split(trim(text),' '),
        |        x -> list_contains(['the','a','and','of','to','is','in'], x))) AS n_stop
        |  FROM documents),
        |q AS (SELECT doc_id, source,
        |    round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |      * (1.0 - CAST(n_punct AS DOUBLE) / nullif(n_chars, 0))
        |      * (0.5 + 0.5 * least(CAST(n_stop AS DOUBLE) / nullif(n_words, 0) * 5.0, 1.0)), 6) AS quality
        |  FROM f),
        |r AS (SELECT doc_id, source, quality,
        |    row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM q WHERE quality IS NOT NULL)
        |SELECT doc_id, source, quality, rk,
        |  CASE WHEN n_src = 1 THEN 0.0
        |       ELSE round(CAST(rk - 1 AS DOUBLE) / (n_src - 1), 6) END AS pct_rank
        |FROM r ORDER BY doc_id""") { (s, dir) =>
      qualityPercentileNorm(Tables.documents(s, dir))
    },

    // ---- token counting: whitespace tokens + a BPE-ish regex token count
    //      (word pieces and punctuation as separate tokens) ----
    "q40_token_stats" -> QueryDef.sql(
      """SELECT doc_id,
        |  len(list_filter(string_split(trim(text),' '), x -> x != '')) AS n_words,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS n_tokens,
        |  length(text) AS n_chars_actual,
        |  n_chars AS n_chars_declared
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(words(col("text"))).cast("long").as("n_words"),
          expr("regexp_count(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')").cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_actual"),
          col("n_chars").as("n_chars_declared"))
        .orderBy("doc_id")
    },

    // ---- quality scoring: length/punctuation/stopword signals combined
    //      into a deterministic per-row score ----
    "q41_quality_score" -> QueryDef.sql(
      """WITH f AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(trim(text),' '), x -> x != '')) AS n_words,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
        |    len(list_filter(string_split(trim(text),' '),
        |        x -> list_contains(['the','a','and','of','to','is','in'], x))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_chars, n_words, n_punct, n_stop,
        |  round(CAST(n_stop AS DOUBLE) / nullif(n_words, 0), 6) AS stop_ratio,
        |  round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |        * (1.0 - CAST(n_punct AS DOUBLE) / nullif(n_chars, 0))
        |        * (0.5 + 0.5 * least(CAST(n_stop AS DOUBLE) / nullif(n_words, 0) * 5.0, 1.0)), 6) AS quality
        |FROM f ORDER BY doc_id""") { (s, dir) =>
      qualityFeatures(Tables.documents(s, dir))
        .select("doc_id", "n_chars", "n_words", "n_punct", "n_stop",
          "stop_ratio", "quality")
        .orderBy("doc_id")
    },

    // ---- language ID: stopword-hit n-gram heuristic with a fixed
    //      tie-break order (en > de > es > fr > other) ----
    "q42_lang_id" -> QueryDef.sql(
      """WITH h AS (
        |  SELECT doc_id, lang AS declared_lang,
        |    len(list_filter(string_split(trim(text),' '), x -> list_contains(['the','and','of','to','is'], x))) AS en_hits,
        |    len(list_filter(string_split(trim(text),' '), x -> list_contains(['der','die','und','das','ist'], x))) AS de_hits,
        |    len(list_filter(string_split(trim(text),' '), x -> list_contains(['el','la','de','que','los'], x))) AS es_hits,
        |    len(list_filter(string_split(trim(text),' '), x -> list_contains(['le','les','des','est','une'], x))) AS fr_hits
        |  FROM documents)
        |SELECT doc_id, declared_lang, en_hits, de_hits, es_hits, fr_hits,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
        |       WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
        |       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
        |       WHEN fr_hits > 0 THEN 'fr'
        |       ELSE 'und' END AS predicted_lang
        |FROM h ORDER BY doc_id""") { (s, dir) =>
      def hits(ws: Seq[String]): Column =
        size(filter(words(col("text")), w => array_contains(array(ws.map(lit): _*), w)))
          .cast("long")
      val h = Tables.documents(s, dir).select(
        col("doc_id"), col("lang").as("declared_lang"),
        hits(Seq("the", "and", "of", "to", "is")).as("en_hits"),
        hits(Seq("der", "die", "und", "das", "ist")).as("de_hits"),
        hits(Seq("el", "la", "de", "que", "los")).as("es_hits"),
        hits(Seq("le", "les", "des", "est", "une")).as("fr_hits"))
      h.withColumn("predicted_lang",
          when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits")
            && col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits")
            && col("de_hits") > 0, "de")
          .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("und"))
        .orderBy("doc_id")
    },

    // ---- language ID, char-n-gram depth (NEXT #7): character trigram
    //      profile hits with a confidence score — robust to unseen words
    //      where q42's word-stopword hits are not. Same shuffle-free
    //      codegen'd shape. ----
    "q68_lang_id_ngram" -> QueryDef.sql(
      """WITH t AS (SELECT doc_id, lang AS declared_lang, lower(text) AS t FROM documents),
        |g AS (SELECT doc_id, declared_lang,
        |        [substring(t, i, 3) for i in range(1, greatest(len(t)-1, 1))] AS tg
        |      FROM t),
        |h AS (SELECT doc_id, declared_lang,
        |  len(list_filter(tg, x -> list_contains(['the',' th','he ','and',' an','nd ','ing','ng ',' of','of '], x))) AS en_hits,
        |  len(list_filter(tg, x -> list_contains(['der','die','und','ein','ich','sch','cht',' da','das','en '], x))) AS de_hits,
        |  len(list_filter(tg, x -> list_contains(['que',' qu','el ',' el','la ',' la','los','ión','ado','nte'], x))) AS es_hits,
        |  len(list_filter(tg, x -> list_contains(['les',' le','le ','des',' de','de ','ent','une',' un','ais'], x))) AS fr_hits
        |  FROM g)
        |SELECT doc_id, declared_lang, en_hits, de_hits, es_hits, fr_hits,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
        |       WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
        |       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
        |       WHEN fr_hits > 0 THEN 'fr'
        |       ELSE 'und' END AS predicted_lang,
        |  CASE WHEN en_hits + de_hits + es_hits + fr_hits = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE round(CAST(greatest(en_hits, de_hits, es_hits, fr_hits) AS DOUBLE)
        |                  / (en_hits + de_hits + es_hits + fr_hits), 6) END AS confidence
        |FROM h ORDER BY doc_id""") { (s, dir) =>
      langIdNgram(Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("declared_lang"), col("text")))
        .orderBy("doc_id")
    },

    // ---- language ID, 7-language breadth (NEXT #4): same trigram-profile
    //      classifier widened with pt/it/nl; the oracle SQL is GENERATED
    //      from the same profile constants, so gram lists and argmax order
    //      cannot drift between engines ----
    "q69_lang_id_wide" -> QueryDef.sql(langIdOracleSql(langProfilesWide)) { (s, dir) =>
      langIdNgramOver(Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("declared_lang"), col("text")),
        langProfilesWide)
        .orderBy("doc_id")
    },

    // ---- deterministic content-hash sampling: the reproducible corpus
    //      subsample a training-data pipeline uses (same rows on every
    //      engine/run, no RNG state to coordinate across 1000 executors) ----
    "q44_deterministic_sample" -> QueryDef.sql(
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substring(md5(text), 1, 1) = '0'
        |ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir)
        .filter(substring(md5(col("text")), 1, 1) === "0")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // ---- TF-IDF: top-3 distinguishing terms per doc. tf and df are
    //      integer counts (cross-engine exact); the only float op is the
    //      final per-row ln + multiply, rounded before ranking ----
    "q48b_tfidf_topterms" -> QueryDef.sql(
      """WITH wds AS (SELECT doc_id, unnest(list_filter(string_split(trim(text),' '), x -> x != '')) AS word
        |             FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM wds GROUP BY 1, 2),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM wds GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.word,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (word) CROSS JOIN n
        |  WHERE tf.doc_id < 50),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, word) AS rnk FROM scored)
        |SELECT doc_id, word, tfidf, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val wds = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      val tf = wds.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = wds.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "word").join(broadcast(nDocs))
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("word"),
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
            .as("tfidf"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    },

    // ---- document fingerprinting: canonical-form content hash (the
    //      reference's sha256 content key, X0, applied to normalized text) ----
    "q43_doc_fingerprint" -> QueryDef.sql(
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp_md5,
        |  sha256(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp_sha256,
        |  length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS canonical_len
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val canonical = lower(trim(regexp_replace(col("text"), " +", " ")))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(canonical).as("fp_md5"),
          sha2(canonical, 256).as("fp_sha256"),
          length(canonical).cast("long").as("canonical_len"))
        .orderBy("doc_id")
    }
  )

  /** Character-trigram language-ID profiles: the highest-frequency trigrams
    * of each language's function words (public rank-order statistics à la
    * Cavnar–Trenkle n-gram categorization, cut to a 10-gram profile). */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "he ", "and", " an", "nd ", "ing", "ng ", " of", "of "),
    "de" -> Seq("der", "die", "und", "ein", "ich", "sch", "cht", " da", "das", "en "),
    "es" -> Seq("que", " qu", "el ", " el", "la ", " la", "los", "ión", "ado", "nte"),
    "fr" -> Seq("les", " le", "le ", "des", " de", "de ", "ent", "une", " un", "ais"))

  /** Breadth extension (NEXT #4): pt/it/nl on top of the base four.
    * Profiles may share trigrams across languages (e.g. "de " in fr and
    * nl) — each profile is counted independently and the fixed argmax
    * order below keeps prediction deterministic. */
  private[graft] val langProfilesWide: Seq[(String, Seq[String])] = langProfiles ++ Seq(
    "pt" -> Seq("ão ", "çõe", "não", " nã", "uma", " um", "os ", "dos", " do", "ara"),
    "it" -> Seq("che", " ch", "di ", " di", "lla", "ell", "zio", "gli", " gl", "per"),
    "nl" -> Seq("een", " ee", "het", " he", "van", " va", "ijk", "aar", "oor", "ver"))

  /** DuckDB rendering of [[langIdNgramOver]], generated from the SAME
    * profile constants so the Spark result and the oracle can never drift
    * on gram lists, argmax order, or column names. */
  private[graft] def langIdOracleSql(profiles: Seq[(String, Seq[String])]): String = {
    val hitExprs = profiles.map { case (l, gs) =>
      val lst = gs.map(g => s"'$g'").mkString("[", ",", "]")
      s"  len(list_filter(tg, x -> list_contains($lst, x))) AS ${l}_hits"
    }.mkString(",\n")
    val hitNames = profiles.map { case (l, _) => s"${l}_hits" }
    val cases = hitNames.zip(profiles.map(_._1))
      .map { case (h, l) => s"WHEN $h = best AND $h > 0 THEN '$l'" }
      .mkString("\n       ")
    s"""WITH t AS (SELECT doc_id, lang AS declared_lang, lower(text) AS t FROM documents),
       |g AS (SELECT doc_id, declared_lang,
       |        [substring(t, i, 3) for i in range(1, greatest(len(t)-1, 1))] AS tg
       |      FROM t),
       |h AS (SELECT doc_id, declared_lang,
       |$hitExprs
       |  FROM g),
       |s AS (SELECT *, greatest(${hitNames.mkString(", ")}) AS best,
       |        ${hitNames.mkString(" + ")} AS total FROM h)
       |SELECT doc_id, declared_lang, ${hitNames.mkString(", ")},
       |  CASE $cases
       |       ELSE 'und' END AS predicted_lang,
       |  CASE WHEN total = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE round(CAST(best AS DOUBLE) / total, 6) END AS confidence
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Profile-parametric char-trigram language ID (see [[langIdNgram]] for
    * the contract). Adding a language is one more profile row — the hit
    * columns, argmax chain, and confidence denominator are all derived
    * from the profile list. Ties resolve to the EARLIEST profile in list
    * order with a maximal nonzero hit count. */
  def langIdNgramOver(
      docs: org.apache.spark.sql.DataFrame,
      profiles: Seq[(String, Seq[String])]): org.apache.spark.sql.DataFrame = {
    // one native single-pass scan for ALL profile counts (see
    // graft.functions.TrigramProfileHits — the declarative
    // trigram-array + per-language filter form cost ~4× at sf0.1)
    graft.functions.TextExpressions.register(docs.sparkSession)
    val spec = graft.functions.TextExpressions.encodeProfiles(profiles)
    val withHits = docs.withColumn("_hits",
      expr(s"graft_trigram_hits(lower(text), '$spec')"))
    val hits = profiles.zipWithIndex.foldLeft(withHits) {
      case (df, ((lang, _), i)) =>
        df.withColumn(s"${lang}_hits", element_at(col("_hits"), i + 1))
    }
    val hitCols = profiles.map { case (l, _) => col(s"${l}_hits") }
    val total = hitCols.reduce(_ + _)
    val best = greatest(hitCols: _*)
    val predicted = profiles.foldLeft(when(lit(false), "und")) {
      case (w, (l, _)) => w.when(col(s"${l}_hits") === best && col(s"${l}_hits") > 0, l)
    }.otherwise("und")
    hits.select(Seq(col("doc_id"), col("declared_lang")) ++ hitCols ++ Seq(
      predicted.as("predicted_lang"),
      when(total === 0, lit(0.0))
        .otherwise(round(best.cast("double") / total.cast("double"), 6))
        .as("confidence")): _*)
  }

  /** Char-trigram language ID with confidence. Input: (doc_id,
    * declared_lang, text); output adds per-language profile hit counts,
    * `predicted_lang` (argmax, tie-break en > de > es > fr, 'und' when no
    * profile hits), and `confidence` = best_hits / total_hits (0.0 when
    * undetermined). Pure codegen'd column expressions — trigram explosion
    * happens INSIDE the row (higher-order array functions), so the operator
    * is shuffle-free and streams at scan speed; profiles are literals, so
    * adding a language is one more profile row, not a join. */
  def langIdNgram(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    langIdNgramOver(docs, langProfiles)
}
