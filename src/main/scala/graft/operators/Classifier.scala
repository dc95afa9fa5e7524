package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering (q110/q111) — the classifier face of the
  * quality family (heuristic q41 → self-trained LM q87/q105 → THIS): a
  * logistic regression over hashed bag-of-words features, trained to
  * separate a reference slice from the rest of the corpus, then scoring
  * every document with p(reference-like). This is the GPT-3/CCNet-shaped
  * "quality classifier" step (Brown et al. 2020 §A; Wenzek et al. 2019):
  * label 1 = the md5-prefix reference slice (the q105 convention — the
  * stand-in for "Wikipedia-quality" text), label 0 = everything else.
  *
  * Training (q110), batch gradient descent:
  *  - FEATURES ONCE: per doc, term frequencies over hashed token dims
  *    (polynomial-31 hash mod [[dims]] — implementable identically in
  *    plain Scala for the in-suite reference); stored as an in-row
  *    dim-sorted array, pinned behind a barrier. The corpus is read once;
  *    every round runs on the feature frame.
  *  - Per round: margin = in-row dot(w, feats) under a ONE-ROW broadcast
  *    weight array (no join); residual = sigmoid(margin) − y; per-dim
  *    gradient contributions round to DECIMAL(18,9) BEFORE the sum (the
  *    q87 discipline — double summation order differs across
  *    partitionings) and aggregate map-side to [[dims]] rows; the new
  *    weight vector collapses to one row and broadcasts into the next
  *    round. Plan budget: ONE shuffle per round, feature-frame-sized
  *    input, dims-sized output.
  *
  * Scoring (q111): sigmoid(dot(w, feats)) per doc under the trained
  * weights — in-row, zero shuffle beyond the output sort.
  *
  * ORACLE-CHECKED (round 13): the round count is FIXED, so training
  * unrolls into [[rounds]] relational stages a DuckDB oracle replays
  * end-to-end (the replay builders at the bottom of this object; the
  * knife-edge audit there proves the 1-ulp exp() drift cannot flip a
  * rounding on these corpora). The independent plain-Scala reference LR
  * in ClassifierSpec remains, asserted weight-for-weight and
  * score-for-score (the q102/q108 two-faces pattern), plus the
  * separation property (reference docs score higher in aggregate than
  * non-reference docs).
  *
  * Scale shape: feature extraction is the only corpus-sized work; rounds
  * cost one map-side-combined shuffle each; weights are dims-sized
  * (1-row broadcast). At 100 TB the feature frame persists like the BM25
  * postings (build once per corpus snapshot); gradient rounds are
  * embarrassingly parallel over it.
  */
object Classifier {
  private def words(c: Column): Column = Text.words(c)

  /** Hashed feature dimensionality — small enough that the golden digest
    * stays readable, large enough that planted vocabularies don't fully
    * collide. */
  val dims = 256

  /** Gradient-descent hyperparameters: fixed, part of the declared
    * contract (determinism over tunability). */
  val learningRate = 0.5
  val rounds = 5

  /** Calibration (reliability-diagram) audit of the q41 heuristic as a
    * predictor of reference-slice membership: docs bucket into
    * value-based quality deciles; each bin reports its mean predicted
    * quality vs the empirical reference rate, and the |gap| between
    * them — the per-bin ECE contribution before the n/N weighting. The
    * model-eval face of the quality family: q41 scores, q110/q111
    * learn, THIS measures whether the scores mean anything.
    *
    * Determinism: quality is already 6-dp rounded — it sums exactly as
    * DECIMAL(18,9); every output is one correctly-rounded double
    * division of exact quantities. NULL-quality (degenerate) docs are
    * excluded, matching the q81/q104 gate semantics. One pruned corpus
    * scan, one bins-sized aggregation. */
  def qualityCalibration(docs: DataFrame, bins: Int = 10,
      isRef: Column = substring(md5(col("text")), 1, 1) <= "3"): DataFrame = {
    val q = docs.select(Curation.qualityExpr(col("text")).as("q"),
        isRef.as("is_ref"))
      .filter(col("q").isNotNull)
      .select(least(floor(col("q") * bins), lit(bins - 1)).cast("long").as("bin"),
        col("q").cast("decimal(18,9)").as("qd"), col("is_ref"))
    q.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(col("qd")).as("qsum"))
      .select(col("bin"), col("n"), col("n_ref"),
        round(col("qsum").cast("double") / col("n"), 6).as("mean_quality"),
        round(col("n_ref").cast("double") / col("n"), 6).as("ref_rate"),
        round(abs(col("qsum").cast("double") / col("n")
          - col("n_ref").cast("double") / col("n")), 6).as("gap"))
      .orderBy("bin")
  }

  /** Uncertainty-sampling batch (q181): the `k` docs the trained
    * classifier is LEAST sure about (|p − 0.5| smallest, ties on
    * doc_id) — the batch an active-learning loop sends for labels;
    * confidently-scored docs teach the model nothing. Scoring is the
    * q111 in-row path; the cut is one TakeOrdered over a total order. */
  def activeLearningBatch(docs: DataFrame, weights: DataFrame,
      k: Int = 50): DataFrame =
    classifierScore(docs, weights)
      .select(col("doc_id"), col("score"),
        round(abs(col("score") - 0.5), 6).as("uncertainty"))
      .orderBy(col("uncertainty"), col("doc_id"))
      .limit(k)

  /** Isotonic calibration of the q142 reliability bins (q182): the
    * monotone-nondecreasing probability curve closest (weighted least
    * squares) to the per-bin reference rates — what turns a raw
    * heuristic score into a usable probability when the reliability
    * diagram zig-zags. Computed via the PAVA MINIMAX closed form
    * f(i) = max_{j≤i} min_{k≥i} wavg(rate, j..k) instead of the
    * sequential pool-adjacent-violators loop: on the bins-sized frame
    * the O(bins³) interval enumeration is a few hundred cells of exact
    * INTEGER sums (Σ n_ref / Σ n per interval, one rounded division),
    * fully parallel and engine-identical — the same
    * closed-form-over-a-bounded-frame move as q140's waterfall. */
  def isotonicCalibration(docs: DataFrame, bins: Int = 10,
      isRef: Column = substring(md5(col("text")), 1, 1) <= "3"): DataFrame = {
    val base = qualityCalibration(docs, bins, isRef)
      .select(col("bin"), col("n"), col("n_ref"), col("mean_quality"),
        col("ref_rate"))
      .localCheckpoint(eager = false) // consumers: intervals, members, output
    val iv = base.select(col("bin").as("j")).as("l")
      .join(base.select(col("bin").as("k")).as("r"), col("j") <= col("k"))
      .join(base.select(col("bin").as("m"), col("n"), col("n_ref")),
        col("m") >= col("j") && col("m") <= col("k"))
      .groupBy("j", "k")
      .agg(round(sum(col("n_ref")).cast("double") / sum(col("n")), 9).as("a"))
    val iso = base.select(col("bin"))
      .join(iv, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy(col("bin"), col("j")).agg(min(col("a")).as("mja"))
      .groupBy("bin").agg(round(max(col("mja")), 6).as("iso_rate"))
    base.join(iso, "bin")
      .select(col("bin"), col("n"), col("n_ref"), col("mean_quality"),
        col("ref_rate"), col("iso_rate"))
      .orderBy("bin")
  }

  /** Split-conformal threshold for the quality classifier (q190):
    * calibrate τ on one deterministic half of the corpus so that
    * "score ≥ τ ⇒ reference-like" holds with (1−α) marginal coverage,
    * then MEASURE the realized coverage on the held-out half — the
    * distribution-free guarantee (Vovk; Lei et al.) that turns raw
    * scores into a deployable accept rule. τ is the
    * ⌊α·(n_cal+1)⌋-th smallest calibration-reference score (so at
    * least (1−α)(n_cal+1)−1 of them sit at or above τ).
    *
    * The exact order statistic never sorts the corpus: 6-dp scores
    * live in a BOUNDED value domain (≤ 10⁶+1 distinct values), so a
    * value-histogram CDF (count per score, cumulative over the
    * value-ordered frame) finds the rank exactly — the q157 histogram
    * trick as an order-statistic engine. Split/eval are md5-parity
    * halves of doc_id (deterministic, RNG-free). */
  def conformalThreshold(docs: DataFrame, weights: DataFrame,
      alpha: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = classifierScore(docs, weights)
      .withColumn("cal", substring(md5(col("doc_id").cast("string")), 1, 1) <= "7")
      .localCheckpoint(eager = false) // consumers: calibration + eval
    val calRef = scored.filter(col("cal") && col("is_reference"))
    val nCal = calRef.agg(count(lit(1)).as("n_cal"))
    // value-histogram CDF over the bounded score domain
    val hist = calRef.groupBy("score").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy("score").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val tau = hist.crossJoin(broadcast(nCal))
      .filter(col("cum") >= floor(lit(alpha) * (col("n_cal") + 1)))
      .agg(min(col("score")).as("tau"))
    val eval_ = scored.filter(!col("cal") && col("is_reference"))
      .crossJoin(broadcast(tau))
      .agg(count(lit(1)).as("n_eval_ref"),
        sum(when(col("score") >= col("tau"), 1L).otherwise(0L)).as("n_covered"))
    nCal.crossJoin(broadcast(tau)).crossJoin(broadcast(eval_))
      .select(lit(alpha).as("alpha"), col("n_cal"), col("tau"),
        col("n_eval_ref"),
        round(col("n_covered").cast("double")
          / nullif(col("n_eval_ref"), lit(0L)), 6).as("coverage"))
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- split-conformal accept threshold + held-out coverage for the
    //      classifier, ORACLE-CHECKED: DuckDB rebuilds features, scores
    //      against the persisted weight artifact (the q219/q65 pattern),
    //      and replays the histogram-CDF order statistic + coverage
    //      measurement verbatim. Order-statistic reference retained in
    //      ClassifierSpec. Scores against the PERSISTED artifact (a
    //      100 TB gate loads weights, it doesn't retrain per decision);
    //      byte-equal to the inline-trained form because training rounds
    //      weights to 9 dp before persisting. ----
    "q190_conformal_threshold" -> QueryDef.sql(clfQ190Sql) { (s, dir) =>
      conformalThreshold(Tables.documents(s, dir), oracleWeights(s, dir, "q190"))
    },

    // ---- active-learning batch: most-uncertain docs under the trained
    //      classifier, ORACLE-CHECKED from the persisted artifact (same
    //      replay as q217 + the uncertainty/limit tail); machinery
    //      reference-checked in ClassifierSpec. ----
    "q181_active_learning_batch" -> QueryDef.sql(clfQ181Sql) { (s, dir) =>
      activeLearningBatch(Tables.documents(s, dir), oracleWeights(s, dir, "q181"))
    },

    // ---- isotonic calibration: monotone probability curve over the
    //      q142 bins via the PAVA minimax closed form. ----
    "q182_isotonic_calibration" -> QueryDef.sql(
      """WITH f AS (
        |  SELECT md5(text) AS h,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(trim(text),' '), x -> x != '')) AS n_words,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
        |    len(list_filter(string_split(trim(text),' '),
        |        x -> list_contains(['the','a','and','of','to','is','in'], x))) AS n_stop
        |  FROM documents),
        |q AS (SELECT substring(h, 1, 1) <= '3' AS is_ref,
        |    round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |          * (1.0 - CAST(n_punct AS DOUBLE) / nullif(n_chars, 0))
        |          * (0.5 + 0.5 * least(CAST(n_stop AS DOUBLE) / nullif(n_words, 0) * 5.0, 1.0)), 6) AS q
        |  FROM f),
        |b AS (SELECT CAST(least(floor(q * 10), 9) AS BIGINT) AS bin,
        |        CAST(q AS DECIMAL(18,9)) AS qd, is_ref
        |      FROM q WHERE q IS NOT NULL),
        |g AS (SELECT bin, count(*) AS n,
        |        CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |        sum(qd) AS qsum
        |      FROM b GROUP BY 1),
        |base AS (SELECT bin, n, n_ref,
        |    round(CAST(qsum AS DOUBLE) / n, 6) AS mean_quality,
        |    round(CAST(n_ref AS DOUBLE) / n, 6) AS ref_rate FROM g),
        |iv AS (SELECT l.bin AS j, r.bin AS k,
        |    round(CAST(sum(m.n_ref) AS DOUBLE) / sum(m.n), 9) AS a
        |  FROM base l JOIN base r ON l.bin <= r.bin
        |  JOIN base m ON m.bin >= l.bin AND m.bin <= r.bin
        |  GROUP BY 1, 2),
        |iso AS (SELECT bin, round(max(mja), 6) AS iso_rate FROM (
        |    SELECT b2.bin, iv.j, min(iv.a) AS mja
        |    FROM base b2 JOIN iv ON iv.j <= b2.bin AND iv.k >= b2.bin
        |    GROUP BY 1, 2) GROUP BY 1)
        |SELECT base.bin, n, n_ref, mean_quality, ref_rate, iso_rate
        |FROM base JOIN iso USING (bin) ORDER BY bin""") { (s, dir) =>
      isotonicCalibration(Tables.documents(s, dir))
    },

    // ---- quality-classifier training: final per-dim weights after 5
    //      batch GD rounds on reference-vs-rest labels — ORACLE-CHECKED
    //      by unrolling the fixed-round GD into relational stages DuckDB
    //      replays end-to-end (see the replay block below; knife-edge
    //      audit proves the 1-ulp exp() drift cannot flip a rounding on
    //      these corpora). Plain-Scala reference LR retained in
    //      ClassifierSpec. ----
    "q110_quality_classifier_train" -> QueryDef.sql(clfQ110Sql) { (s, dir) =>
      classifierTrain(Tables.documents(s, dir)).orderBy("dim")
    },

    // ---- calibration audit: quality-decile reliability diagram vs the
    //      reference slice. ----
    "q142_quality_calibration" -> QueryDef.sql(
      """WITH f AS (
        |  SELECT md5(text) AS h,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(trim(text),' '), x -> x != '')) AS n_words,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
        |    len(list_filter(string_split(trim(text),' '),
        |        x -> list_contains(['the','a','and','of','to','is','in'], x))) AS n_stop
        |  FROM documents),
        |q AS (SELECT substring(h, 1, 1) <= '3' AS is_ref,
        |    round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |          * (1.0 - CAST(n_punct AS DOUBLE) / nullif(n_chars, 0))
        |          * (0.5 + 0.5 * least(CAST(n_stop AS DOUBLE) / nullif(n_words, 0) * 5.0, 1.0)), 6) AS q
        |  FROM f),
        |b AS (SELECT CAST(least(floor(q * 10), 9) AS BIGINT) AS bin,
        |        CAST(q AS DECIMAL(18,9)) AS qd, is_ref
        |      FROM q WHERE q IS NOT NULL),
        |g AS (SELECT bin, count(*) AS n,
        |        CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |        sum(qd) AS qsum
        |      FROM b GROUP BY 1)
        |SELECT bin, n, n_ref,
        |  round(CAST(qsum AS DOUBLE) / n, 6) AS mean_quality,
        |  round(CAST(n_ref AS DOUBLE) / n, 6) AS ref_rate,
        |  round(abs(CAST(qsum AS DOUBLE) / n - CAST(n_ref AS DOUBLE) / n), 6) AS gap
        |FROM g ORDER BY bin""") { (s, dir) =>
      qualityCalibration(Tables.documents(s, dir))
    },

    // ---- classifier scoring: p(reference-like) per doc under the
    //      trained weights — the model-based quality gate. Declared
    //      self-contained (train + score in one face); q217 is the
    //      pipeline-shaped twin. ORACLE-CHECKED: DuckDB replays the
    //      unrolled training AND the scoring pass. ----
    "q111_quality_classifier_score" -> QueryDef.sql(clfQ111Sql) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      classifierScore(docs, classifierTrain(docs)).orderBy("doc_id")
    },

    // ---- classifier scoring against PERSISTED weights: what a 100 TB
    //      gate actually runs — the q110 artifact loaded from parquet
    //      (trained once per corpus snapshot, the DedupIndex.ensure
    //      pattern), then one in-row scoring pass. Byte-equal to q111
    //      (training rounds weights to 9 dp before persisting, so the
    //      stored table IS the inline table); ClassifierSpec pins it.
    //      ORACLE-CHECKED from the persisted artifact: the face writes
    //      the weight table to the fixed oracle path and DuckDB replays
    //      feature build + margin + sigmoid from those exact bytes.
    //      The bench median prices SCORING, not the training q111
    //      deliberately includes. ----
    "q217_classifier_score_persisted" -> QueryDef.sql(clfQ217Sql) { (s, dir) =>
      classifierScore(Tables.documents(s, dir), oracleWeights(s, dir, "q217"))
        .orderBy("doc_id")
    }
  )

  private val weightsFor = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cheap metadata-level fingerprint of `sfDir`'s documents table
    * (file names + lengths + mtimes through the session's Hadoop FS —
    * no data scan): the weight-artifact cache key, so a corpus that
    * changes under the same directory string trains FRESH weights
    * instead of silently serving stale ones (r12 ADVICE). */
  private def corpusFingerprint(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val sts =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).filter(_.isFile)
      else Array(fs.getFileStatus(p))
    val sig = sts.sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$sig".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Persisted weight table for `sfDir`'s documents — trained once per
    * corpus FINGERPRINT and written parquet through the session's
    * Hadoop FS; every later call (same JVM via the cache, later JVMs
    * via the `_SUCCESS`-gated artifact) loads the files. The base
    * location comes from `graft.state.dir` when set — on a cluster,
    * point it at a shared filesystem so executors can read the
    * artifact; the local-tmp default is for single-JVM runs. The stored
    * table is the 9-dp-rounded q110 output, so scoring from it
    * reproduces the inline face bit-for-bit. */
  def ensureWeights(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val fp = corpusFingerprint(spark, sfDir)
    val base = spark.conf.getOption("graft.state.dir")
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_state")
    val dir = weightsFor.computeIfAbsent(fp, _ => {
      // v2: bump when classifierTrain's semantics change — the corpus
      // fingerprint alone cannot invalidate an artifact trained by an
      // older code version
      val d = s"$base/clf_weights/v2/$fp"
      val done = new org.apache.hadoop.fs.Path(s"$d/_SUCCESS")
      val fs = done.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(done)) {
        // two JVMs can both observe _SUCCESS missing; an Overwrite write
        // straight at `d` deletes-then-writes, so a concurrent reader
        // could see a torn artifact. Write to a unique temp sibling and
        // atomically rename into place (the DedupIndex swapIn
        // discipline); if the rename target appeared meanwhile, discard
        // ours and serve the winner's (r13 ADVICE).
        val tmp = s"$d.tmp.${java.util.UUID.randomUUID().toString.take(8)}"
        classifierTrain(Tables.documents(spark, sfDir))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
        val tmpPath = new org.apache.hadoop.fs.Path(tmp)
        if (!fs.rename(tmpPath, new org.apache.hadoop.fs.Path(d)))
          fs.delete(tmpPath, true) // lost the race — a complete artifact won
      }
      d
    })
    spark.read.parquet(dir)
  }

  /** Polynomial-31 token hash mod [[dims]] — the classic string hash,
    * reproducible in any language (Java Long wrap semantics on both
    * sides). */
  private def dimExpr: String =
    s"CAST(pmod(aggregate(sequence(1, length(t)), CAST(0 AS BIGINT), (h, i) -> h * 31 + ascii(substring(t, i, 1))), $dims) AS INT)"

  /** (doc_id, y, feats array<struct<dim int, tf double>> dim-sorted):
    * hashed term frequencies + the reference label, one corpus scan.
    * tf = count(dim)/n_tokens keeps margins bounded regardless of doc
    * length. Dim-sorted array = one fixed double-summation order for
    * the in-row dot product on any partitioning. */
  private[graft] def features(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        (substring(md5(col("text")), 1, 1) <= "3").cast("double").as("y"),
        words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("y"), expr(
        s"""concat(
           |  transform(
           |    array_sort(map_entries(
           |      aggregate(transform(ws, t -> $dimExpr),
           |        CAST(map() AS MAP<INT, BIGINT>),
           |        (m, d) -> map_concat(map_filter(m, (k, v) -> k != d),
           |                             map(d, coalesce(element_at(m, d), CAST(0 AS BIGINT)) + 1))))),
           |    e -> struct(e.key AS dim, CAST(e.value AS DOUBLE) / size(ws) AS tf)),
           |  array(struct(CAST($dims AS INT) AS dim, CAST(1.0 AS DOUBLE) AS tf)))"""
          .stripMargin).as("feats"))

  /** One-row weight frame (w: array<double>, index = dim; slot [[dims]]
    * is the intercept). */
  private def weightRow(weights: DataFrame): DataFrame =
    weights.agg(collect_list(struct(col("dim"), col("weight"))).as("dw"))
      .select(expr(
        s"""transform(sequence(0, $dims),
           |  d -> coalesce(element_at(map_from_entries(array_sort(dw)), d), CAST(0.0 AS DOUBLE)))"""
          .stripMargin).as("w"))

  /** margin = Σ w[dim]·tf over the doc's dim-sorted feature array —
    * in-row, fixed order. (`w` is 0-indexed by dim via element_at+1.) */
  private def marginExpr: String =
    "aggregate(feats, CAST(0.0 AS DOUBLE), (acc, f) -> acc + element_at(w, f.dim + 1) * f.tf)"

  /** One GD round over a pinned feature frame: returns the dims-sized
    * (dim, weight) table, stepping by the MEAN gradient (sum/n — the
    * batch-GD normalization that keeps the step size corpus-size-
    * independent). Gradient contributions round to DECIMAL(18,9)
    * pre-sum; dims with no contributions keep their previous weight; n
    * rides a one-row broadcast, never a driver-side count. */
  private[graft] def gdRound(feats: DataFrame, wRow: DataFrame,
      prevWeights: DataFrame): DataFrame = {
    val nRow = feats.agg(count(lit(1)).cast("double").as("n"))
    val grads = feats.crossJoin(broadcast(wRow))
      .select(col("y"), col("feats"), expr(marginExpr).as("m"))
      .select(col("feats"),
        (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"))
      .select(explode(col("feats")).as("f"), col("r"))
      .select(col("f.dim").as("dim"),
        round((col("r") * col("f.tf")).cast("double"), 9)
          .cast("decimal(18,9)").as("g"))
      .groupBy("dim").agg(sum(col("g")).as("grad"))
    prevWeights.join(grads, Seq("dim"), "left")
      .crossJoin(broadcast(nRow))
      .select(col("dim"),
        (col("weight") - lit(learningRate) *
          coalesce(col("grad").cast("double") / col("n"), lit(0.0))).as("weight"))
  }

  /** `k` GD rounds from `init` over a pinned feature frame. Rounds
    * supersede their predecessor immediately (≤2 pinned weight tables
    * live, the q102 discipline); `releaseInit` guards the FIRST release
    * so a caller-owned starting table (the warm-start path) is never
    * freed out from under the caller. */
  private def gdLoop(feats: DataFrame, init: DataFrame, k: Int,
      releaseInit: Boolean): DataFrame = {
    var weights = init
    var canRelease = releaseInit
    (1 to k).foreach { _ =>
      val next = gdRound(feats, weightRow(weights), weights)
        .localCheckpoint(eager = true)
      if (canRelease) graft.Barriers.release(weights)
      canRelease = true
      weights = next
    }
    weights
  }

  /** Full training loop → (dim, weight) with weight rounded to 9 places
    * for the stable artifact (the raw weights feed [[classifierScore]]
    * through the same rounding, so train and score agree exactly). */
  def classifierTrain(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val feats = features(docs).localCheckpoint(eager = true)
    val init = spark.range(0, dims + 1) // slot `dims` = intercept
      .select(col("id").cast("int").as("dim"), lit(0.0).as("weight"))
      .localCheckpoint(eager = true)
    val trained = gdLoop(feats, init, rounds, releaseInit = true)
    val out = trained
      .select(col("dim"), round(col("weight"), 9).as("weight"))
      .localCheckpoint(eager = true)
    graft.Barriers.release(trained)
    graft.Barriers.release(feats)
    out
  }

  /** Incremental refresh (the nearDup/sketch/postings pattern applied to
    * the classifier): resume GD from a PERSISTED weight table on a new
    * batch — the nightly "fold today's crawl into the quality model"
    * step that never re-reads yesterday's corpus. Starts from the
    * 9-dp-rounded checkpoint (exactly what a persisted artifact holds),
    * so a warm-start is reproducible from the stored table alone. The
    * input table is left untouched. */
  def classifierContinue(newDocs: DataFrame, weights: DataFrame,
      gdRounds: Int = rounds): DataFrame = {
    val feats = features(newDocs).localCheckpoint(eager = true)
    val start = weights.select(col("dim"), col("weight"))
      .localCheckpoint(eager = true) // own pinned copy; caller's frame untouched
    val cont = gdLoop(feats, start, gdRounds, releaseInit = true)
    val out = cont
      .select(col("dim"), round(col("weight"), 9).as("weight"))
      .localCheckpoint(eager = true)
    graft.Barriers.release(cont)
    graft.Barriers.release(feats)
    out
  }

  /** p(reference-like) per doc under a trained weight table — in-row dot
    * + sigmoid, zero shuffle beyond the caller's sort. */
  def classifierScore(docs: DataFrame, weights: DataFrame): DataFrame =
    features(docs).crossJoin(broadcast(weightRow(weights)))
      .select(col("doc_id"),
        col("y").cast("boolean").as("is_reference"),
        round(lit(1.0) / (lit(1.0) + exp(-expr(marginExpr))), 6).as("score"))
      .withColumn("predicted_reference", col("score") >= 0.5)

  // ---------------------------------------------------------------------
  // DuckDB oracle replay (q110/q111/q181/q190/q217): the classifier is
  // gradient descent — iterative, but with a FIXED round count, so the
  // whole training unrolls into [[rounds]] relational stages DuckDB
  // replays verbatim: tokenize → poly-31 dim hash (Java long wrap
  // reproduced in HUGEINT mod 2⁶⁴; since 256 | 2⁶⁴ the signed pmod
  // collapses to one unsigned modulo) → tf → per-round ORDERED-fold
  // margins (list_reduce mirrors Spark's aggregate fold element for
  // element, so the double sums are bit-identical) → sigmoid residuals →
  // DECIMAL(18,9) gradient sums (order-free, exact) → weight step.
  //
  // The ONE libm call, exp(), differs from Java Math.exp at the last ulp
  // on ~11 % of the real margins (measured — graft.ClfKnifeEdge dumps
  // every margin with Spark's own exp value, tools/knife_edge.py
  // recomputes them in DuckDB on the same double bits): max sigmoid-level
  // drift 1.11e-16 = 1 ulp at 0.5, identical on a 200k-point sweep of
  // the margin range. Safety is MEASURED, not assumed: across all three
  // SFs the closest 9-dp gradient contribution sits 9.5e-16 from a
  // rounding boundary (sf0.1; 1.9e-15 at sf0.01, 3.4e-14 at sf0.001 —
  // exact BigDecimal distances over all 574,675/57,810/58,020
  // contributions), final raw weights ≥ 3.6e-12, 6-dp scores ≥ 8.3e-11 —
  // every rounded quantity clears the worst-case drift by ≥ 8.5×, so the
  // replay cannot flip a rounding on these corpora; and once a round's
  // roundings agree, its decimal gradient sums — and hence the next
  // round's weights and margins — are bit-identical, so drift never
  // compounds across rounds. (Method + numbers: COVERAGE.md §2.12;
  // regression-gated in ClassifierSpec.)
  // ---------------------------------------------------------------------

  /** Feature CTEs shared by every classifier oracle: documents →
    * (doc_id, y, dim-sorted (dim, tf) list + intercept slot), the doc
    * count, and the zero initial weights. */
  private def dkClfFeatCtes: String =
    s"""cbase AS (
       |  SELECT doc_id,
       |    CASE WHEN substring(md5(text), 1, 1) <= '3' THEN 1.0 ELSE 0.0 END AS y,
       |    list_filter(string_split(trim(text), ' '), w -> w != '') AS ws
       |  FROM documents
       |  WHERE len(list_filter(string_split(trim(text), ' '), w -> w != '')) > 0),
       |ctok AS (SELECT doc_id, y, len(ws) AS nw, unnest(ws) AS t FROM cbase),
       |cdim AS (SELECT doc_id, y, nw,
       |  CAST(list_reduce(
       |    list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(t) + 1),
       |        i -> CAST(ascii(substring(t, CAST(i AS INT), 1)) AS HUGEINT))),
       |    (a, c) -> (a * 31 + c) % CAST('18446744073709551616' AS HUGEINT)) % $dims AS INT) AS dim
       |  FROM ctok),
       |ctf AS (SELECT doc_id, y, nw, dim, count(*) AS c FROM cdim GROUP BY 1, 2, 3, 4),
       |feats AS (SELECT doc_id, any_value(y) AS y,
       |    list_append(list({'dim': dim, 'tf': CAST(c AS DOUBLE) / nw} ORDER BY dim),
       |                {'dim': $dims, 'tf': 1.0}) AS fl
       |  FROM ctf GROUP BY doc_id),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats),
       |w0 AS (SELECT CAST(unnest(range(0, ${dims + 1})) AS INT) AS dim, 0.0 AS weight)"""
      .stripMargin

  /** One unrolled GD round: margins under w`i` (ordered fold), sigmoid
    * residuals, 9-dp decimal gradient sums, mean-gradient step → w`i+1`. */
  private def dkClfGdRound(i: Int): String =
    s"""wr$i AS (SELECT list(weight ORDER BY dim) AS w FROM w$i),
       |mg$i AS (SELECT doc_id, fl,
       |    1.0 / (1.0 + exp(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(fl, f -> wr$i.w[f.dim + 1] * f.tf)),
       |      (a, x) -> a + x))) - y AS r
       |  FROM feats, wr$i),
       |gg$i AS (SELECT f.dim, sum(CAST(round(mg$i.r * f.tf, 9) AS DECIMAL(18,9))) AS grad
       |  FROM mg$i, unnest(mg$i.fl) AS u(f) GROUP BY 1),
       |w${i + 1} AS (SELECT w$i.dim,
       |    w$i.weight - $learningRate * coalesce(CAST(gg$i.grad AS DOUBLE) / nn.n, 0.0) AS weight
       |  FROM w$i LEFT JOIN gg$i ON gg$i.dim = w$i.dim, nn)"""
      .stripMargin

  /** Training unrolled to the final 9-dp weight table `wfin`. */
  private def dkClfTrainCtes: String =
    (dkClfFeatCtes +: (0 until rounds).map(dkClfGdRound)).mkString(",\n") +
      s",\nwfin AS (SELECT dim, round(weight, 9) AS weight FROM w$rounds)"

  /** Artifact head for the persisted-weights faces: `wfin` read from the
    * parquet the face wrote (the q219/q65 artifact pattern). */
  private[operators] def dkClfArtifactCtes(name: String): String =
    dkClfFeatCtes +
      s",\nwfin AS (SELECT dim, weight FROM read_parquet('${Similarity.annOracleRoot}/$name/weights/*.parquet'))"

  /** Scoring tail: `scored(doc_id, is_reference, score)` under `wfin`,
    * mirroring [[weightRow]]'s coalesce-to-0 slotting and the ordered
    * margin fold. */
  private[operators] def dkClfScoreCte: String =
    s"""wrf AS (SELECT list(coalesce(wt.weight, 0.0) ORDER BY dd.d) AS w
       |  FROM (SELECT unnest(range(0, ${dims + 1})) AS d) dd
       |  LEFT JOIN wfin wt ON wt.dim = dd.d),
       |scored AS (SELECT f.doc_id, f.y = 1.0 AS is_reference,
       |    round(1.0 / (1.0 + exp(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(f.fl, x -> wrf.w[x.dim + 1] * x.tf)),
       |      (a, v) -> a + v))), 6) AS score
       |  FROM feats f, wrf)"""
      .stripMargin

  private def dkClfScoreSelect: String =
    "SELECT doc_id, is_reference, score, score >= 0.5 AS predicted_reference\nFROM scored ORDER BY doc_id"

  private[graft] def clfQ110Sql: String =
    "WITH " + dkClfTrainCtes + "\nSELECT dim, weight FROM wfin ORDER BY dim"

  private[graft] def clfQ111Sql: String =
    "WITH " + dkClfTrainCtes + ",\n" + dkClfScoreCte + "\n" + dkClfScoreSelect

  private[graft] def clfQ217Sql: String =
    "WITH " + dkClfArtifactCtes("q217") + ",\n" + dkClfScoreCte + "\n" + dkClfScoreSelect

  private[graft] def clfQ181Sql: String =
    "WITH " + dkClfArtifactCtes("q181") + ",\n" + dkClfScoreCte + "\n" +
      """SELECT doc_id, score, round(abs(score - 0.5), 6) AS uncertainty
        |FROM scored ORDER BY uncertainty, doc_id LIMIT 50""".stripMargin

  private[graft] def clfQ190Sql: String =
    "WITH " + dkClfArtifactCtes("q190") + ",\n" + dkClfScoreCte + ",\n" +
      """sc AS (SELECT scored.*,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7' AS cal FROM scored),
        |calref AS (SELECT score FROM sc WHERE cal AND is_reference),
        |ncal AS (SELECT count(*) AS n_cal FROM calref),
        |hist AS (SELECT score, count(*) AS c FROM calref GROUP BY 1),
        |cumh AS (SELECT score, sum(c) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
        |tau AS (SELECT min(score) AS tau FROM cumh, ncal
        |        WHERE cum >= floor(CAST(0.1 AS DOUBLE) * (n_cal + 1))),
        |ev AS (SELECT count(*) AS n_eval_ref,
        |    CAST(sum(CASE WHEN score >= tau.tau THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |  FROM sc, tau WHERE NOT cal AND is_reference)
        |SELECT CAST(0.1 AS DOUBLE) AS alpha, n_cal, tau, n_eval_ref,
        |  round(CAST(n_covered AS DOUBLE) / nullif(n_eval_ref, 0), 6) AS coverage
        |FROM ncal, tau, ev""".stripMargin

  /** Artifact discipline for the persisted-weights faces: write the
    * weight table to the fixed oracle path for `name` and read it back,
    * so the face scores from the EXACT bytes DuckDB replays. */
  private def oracleWeights(s: org.apache.spark.sql.SparkSession,
      dir: String, name: String): DataFrame =
    Similarity.persistArtifact(name, "weights", ensureWeights(s, dir))

  // ---------------------------------------------------------------------
  // Knife-edge audit plumbing (graft.ClfKnifeEdge + tools/knife_edge.py):
  // the cross-engine argument above reduces to "exp() is the ONLY drift
  // source, and every rounding gate sits far from a boundary". These
  // frames expose exactly the quantities that argument quantifies.
  // ---------------------------------------------------------------------

  /** Exact distance from `x` to its nearest 9-dp (scale-dp) rounding
    * boundary, computed in BigDecimal (a double at ~1e6 scale cannot
    * resolve 1e-16 distances through `x*1e9` float arithmetic): the
    * boundary is half a grid step from the rounded value, so
    * dist = 0.5·10⁻ˢ − |x − round_s(x)| exactly. */
  private[graft] def boundaryDistUdf(scale: Int) =
    udf { x: java.lang.Double =>
      if (x == null || x.isNaN) null
      else {
        val bd = new java.math.BigDecimal(x.doubleValue).abs
        val r = bd.setScale(scale, java.math.RoundingMode.HALF_UP)
        new java.math.BigDecimal(java.math.BigInteger.valueOf(5), scale + 1)
          .subtract(bd.subtract(r).abs).doubleValue: java.lang.Double
      }
    }

  /** Replays training round by round and returns the three audit frames:
    *  - margins  (stage, doc_id, m, e = Math.exp(−m) as Spark computes
    *    it) for every GD round AND the final scoring pass — the inputs
    *    whose exp() DuckDB recomputes;
    *  - grads    (stage, dim, g) — every raw pre-round gradient
    *    contribution r·tf that the DECIMAL(18,9) gate rounds;
    *  - weights  (dim, w) — the raw final weights the 9-dp artifact
    *    rounding gates.
    * Same code path as [[classifierTrain]] (features/weightRow/gdRound),
    * so the audited numbers ARE the declared faces' numbers. */
  private[graft] def knifeEdgeFrames(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val feats = features(docs).localCheckpoint(eager = true)
    val init = spark.range(0, dims + 1)
      .select(col("id").cast("int").as("dim"), lit(0.0).as("weight"))
      .localCheckpoint(eager = true)
    var weights = init
    var margins = List.empty[DataFrame]
    var grads = List.empty[DataFrame]
    (1 to rounds).foreach { i =>
      val wRow = weightRow(weights)
      val staged = feats.crossJoin(broadcast(wRow))
        .select(lit(i).as("stage"), col("doc_id"), col("y"), col("feats"),
          expr(marginExpr).as("m"))
        .localCheckpoint(eager = true)
      margins :+= staged.select(col("stage"), col("doc_id"), col("m"),
        exp(-col("m")).as("e"))
      grads :+= staged
        .select(col("stage"),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"),
          explode(col("feats")).as("f"))
        .select(col("stage"), col("f.dim").as("dim"),
          (col("r") * col("f.tf")).cast("double").as("g"))
      weights = gdRound(feats, wRow, weights).localCheckpoint(eager = true)
    }
    val wfin = weights.select(col("dim"), round(col("weight"), 9).as("weight"))
    val scoringM = feats.crossJoin(broadcast(weightRow(wfin)))
      .select(lit(0).as("stage"), col("doc_id"), expr(marginExpr).as("m"))
      .select(col("stage"), col("doc_id"), col("m"), exp(-col("m")).as("e"))
    ((margins :+ scoringM).reduce(_ unionAll _),
      grads.reduce(_ unionAll _),
      weights.select(col("dim"), col("weight").as("w")))
  }
}
