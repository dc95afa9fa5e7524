package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that make these queries
  * viable at 100 TB are part of the contract, not an accident — filters
  * reach the parquet scan, dimension joins broadcast, hot paths stay
  * inside whole-stage codegen, and the vector hot-loop uses the native
  * expression. A regression here is a performance bug even while results
  * stay correct.
  */
class PlanSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import org.apache.spark.sql.execution.ExplainMode

  /** Formatted explain: full (untruncated) scan details incl. PushedFilters. */
  private def plan(name: String): String =
    SparkEntry.all(name).fn(spark, sf001).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  /** Final adaptive plan, post-execution: `*(n)` prefixes mark
    * whole-stage-codegen'd operators (AQE's pre-execution plan reports no
    * codegen subtrees, so we must run the query first). */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.all(name).fn(spark, sf001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02 filter predicates push into the parquet scan") {
    val p = plan("q02_filter_predicates")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("EqualTo(o_orderstatus,O"), s"status filter must reach the scan: $p")
  }

  test("q01 projection prunes the lineitem scan to referenced columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_partkey"), "unused columns must not be read")
    assert(!p.contains("l_suppkey"), "unused columns must not be read")
  }

  test("q04 dimension joins are broadcast, not shuffled") {
    val p = plan("q04_join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "snowflake dims must never sort-merge the fact table")
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    val p = executedPlan("q01_pricing_summary")
    assert(p.contains("*("), s"no codegen stages in final plan: $p")
    assert(p.contains("HashAggregate"), p)
  }

  test("q54/q55 use the native dot-product expression, not lambda aggregate") {
    val p54 = plan("q54_cosine_topk")
    val p55 = plan("q55_cosine_threshold_pairs")
    assert(p54.contains("graft_dot"), p54)
    assert(p55.contains("graft_dot"), p55)
  }

  test("no headline bench plan contains an unbounded BroadcastNestedLoopJoin") {
    // the headline set must stay runnable at 100 TB: a BNLJ between two
    // corpus-sized sides is O(n²) row pairs (the r2–r4 q55 cartesian this
    // test exists to keep out). The one admissible BNLJ shape is q54's
    // exact top-k: the BROADCAST side is the bounded query set, so work is
    // queries × corpus — linear in the corpus, the textbook brute-force
    // baseline. Every other headline plan must be equi-join only.
    Bench.headline.filterNot(_ == "q54_cosine_topk").foreach { name =>
      // the r13 headline includes the x52/x55b production lanes, which
      // live in Bench.productionLanes rather than the declared inventory
      val fn = SparkEntry.all.get(name).map(_.fn)
        .getOrElse(Bench.productionLanes(name))
      val p = fn(spark, sf001).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name headline plan contains a BroadcastNestedLoopJoin:\n$p")
    }
    // q54: BNLJ allowed, but only with the query side as the broadcast build
    val p54 = plan("q54_cosine_topk")
    assert(p54.contains("BroadcastNestedLoopJoin Inner BuildLeft"),
      s"q54 must broadcast the bounded query side:\n$p54")
  }

  test("q55b candidate generation is a (band, key) equi-join, scored by graft_dot") {
    val p = plan("q55b_cosine_pairs_lsh")
    assert(p.contains("graft_dot"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q22 range join broadcasts the tiny tier dimension") {
    val p = plan("q22_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q24 EXISTS compiles to a semi join with the quantity filter pushed down") {
    val p = plan("q24_exists_filtered")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,49"),
      s"filter must reach the lineitem scan: $p")
  }

  test("graft-provenance DSv2 scan reports pushed filters and a pruned read schema") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val store = new graft.pipeline.ProvenanceStore(spark, wh)
    store.appendResponses(spark.range(0, 10, 1, 2).select(
      lit("p").as("provider"), lit("GET").as("method"),
      concat(lit("https://x.test/"), col("id")).as("url"),
      lit(null).cast("string").as("params_json"), lit(200).as("status_code"),
      lit("{}").as("headers_json"), lit("b".getBytes("UTF-8")).as("body"),
      col("id").cast("int").as("item_index"), lit("metadata").as("stage")))
    val q = spark.read.format("graft-provenance")
      .option("warehouse", wh).option("table", "responses").load()
      .filter(col("id") > 3 && col("provider") === "p")
      .select("id", "url")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("graft-provenance"), p)
    assert(p.contains("GreaterThan(id,3)"), s"id filter must be pushed: $p")
    assert(p.contains("EqualTo(provider,p)"), s"provider filter must be pushed: $p")
    // the body blob must not be decoded for a 2-column projection
    val scanDesc = p.linesIterator.filter(_.contains("graft-provenance")).mkString("\n")
    assert(!scanDesc.contains("body"), s"projection must prune body: $scanDesc")
  }

  test("graft-provenance aggregate pushdown answers min/max/count from footer stats") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val store = new graft.pipeline.ProvenanceStore(spark, wh)
    // two appends → multiple part-files; params_json null on odd ids
    (0 until 2).foreach { batch =>
      store.appendResponses(spark.range(0, 40, 1, 4).select(
        lit(s"p$batch").as("provider"), lit("GET").as("method"),
        concat(lit(s"https://x.test/$batch/"), col("id")).as("url"),
        when(col("id") % 2 === 0, lit("{}")).as("params_json"),
        lit(200 + batch).as("status_code"), lit("{}").as("headers_json"),
        lit("b".getBytes("UTF-8")).as("body"),
        col("id").cast("int").as("item_index"), lit("metadata").as("stage")))
    }
    val dsv2 = spark.read.format("graft-provenance")
      .option("warehouse", wh).option("table", "responses").load()
    val plain = spark.read.schema(graft.pipeline.Model.responsesSchema)
      .parquet(s"$wh/responses")
    def aggs(df: org.apache.spark.sql.DataFrame) = df.agg(
      max("id"), min("id"), count(lit(1)), count(col("params_json")),
      min("status_code"), max("status_code"))
    val q = aggs(dsv2)
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedAggregation: [MAX(id), MIN(id), COUNT(*), " +
      "COUNT(params_json), MIN(status_code), MAX(status_code)]"),
      s"aggregates must reach the footer-stats scan: $p")
    assert(q.head() == aggs(plain).head(), "footer-stats answers must equal the data scan")
    // empty table: finalization over zero partial rows → count 0, max null
    val empty = spark.read.format("graft-provenance")
      .option("warehouse", wh).option("table", "artifacts").load()
      .agg(count(lit(1)), max("id")).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
    // a filtered aggregate must NOT use the stats path (pre-filter stats
    // would be wrong): it falls back to the row scan and stays correct
    val filtered = dsv2.filter(col("status_code") === 201).agg(count(lit(1)), max("id"))
    val pf = filtered.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!pf.contains("PushedAggregation"), pf)
    assert(filtered.head() ==
      plain.filter(col("status_code") === 201).agg(count(lit(1)), max("id")).head())
  }

  test("curation family plans: q72/q73 shuffle-free, q74 broadcast, q75-q77 one data shuffle") {
    // q72 PII and q73 repetition are pure per-row maps — any Exchange is a
    // regression (final orderBy excluded: count exchanges before the sort
    // by using the unsorted operator forms, already covered in
    // CurationSpec; here pin the declared queries minus their output sort)
    Seq("q72_pii_scan_redact", "q73_repetition_stats").foreach { name =>
      val p = plan(name)
      val nEx = "Exchange".r.findAllIn(p).size
      // the declared query ends in orderBy(doc_id) -> exactly one range
      // exchange for the presentation sort, nothing else
      assert(nEx <= 2, s"$name: expected only the output-sort exchange, plan:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"$name must not join:\n$p")
    }
    // q74's corpus side must never shuffle FOR THE BENCH JOIN: the bench
    // n-gram set joins as a broadcast
    val p74 = plan("q74_decontamination")
    assert(p74.contains("BroadcastHashJoin"), s"q74 bench join not broadcast:\n$p74")
    assert(!p74.contains("BroadcastNestedLoopJoin") && !p74.contains("CartesianProduct"),
      s"q74 join shape:\n$p74")
    // q75 session windows: exactly one hash exchange by user for the
    // session aggregate (plus the output sort's range exchange). Formatted
    // mode prints the partitioning on the Arguments line, so count those.
    val p75 = plan("q75_session_window")
    val hashEx75 = "Arguments: hashpartitioning".r.findAllIn(p75).size
    assert(hashEx75 == 1, s"q75: one session-agg shuffle expected, got $hashEx75:\n$p75")
    assert(p75.contains("MergingSessions"), s"q75 must use the native session operator:\n$p75")
    // q76/q77: one hash exchange by stratum/source driving the window
    Seq("q76_stratified_sample", "q77_token_budget_mix").foreach { name =>
      val p = plan(name)
      val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
      assert(hashEx == 1, s"$name: one window shuffle expected, got $hashEx:\n$p")
    }
  }

  test("q78 prefix-filter join is partitioned equi-join shaped, never nested-loop") {
    val p = plan("q78_jaccard_prefix_filter")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q78 must stay equi-join shaped:\n$p")
    // the exact verify joins by doc id; candidate join by shingle — all
    // hash-joinable. (At sf0.001 AQE may broadcast small sides; that's
    // fine — the shape that must NOT appear is a nested loop.)
  }

  test("round-7 curation/dedup additions stay equi-join + bounded-shuffle shaped") {
    // q79 semantic dedup: the pair graph comes from the v1<v2 theta join
    // (the deliberate exact baseline, like q55); what must NOT appear is a
    // CartesianProduct — the v1<v2 predicate rides the BNLJ. The CC rounds
    // are equi-joins on node ids.
    val p79 = plan("q79_semantic_dedup")
    assert(!p79.contains("CartesianProduct"), s"q79:\n$p79")
    // q80 vocab coverage: distributed partial top-k, never a global sort
    // of the vocabulary before the limit
    val p80 = plan("q80_vocab_coverage")
    assert(p80.contains("TakeOrderedAndProject"), s"q80 top-k not partial:\n$p80")
    // q81/q82: one hash exchange by source driving the per-source window
    // (plus the output sort's range exchange)
    Seq("q81_quality_percentile_filter", "q82_sequence_packing").foreach { name =>
      val p = plan(name)
      val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
      assert(hashEx == 1, s"$name: one window shuffle expected, got $hashEx:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name must not join:\n$p")
    }
  }

  test("q51 computes the shingle frame once: zero parquet re-scans behind the barrier") {
    // r7's committed plan rebuilt the explode+join subtree per consumer —
    // 6 documents scans, zero ReusedExchange (AQE's broadcast conversion
    // replaced the repartition-for-reuse exchanges per-consumer). The fix
    // is a localCheckpoint barrier: every consumer reads the persisted
    // blocks, so the final plan holds ExistingRDD scans of ONE RDD and no
    // parquet scan at all.
    val p = plan("q51_ngram_jaccard_pairs")
    val parquetScans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(parquetScans == 0,
      s"q51 re-scans documents $parquetScans times — barrier lost:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"q51 checkpoint barrier missing:\n$p")
  }

  test("plan-regression gate: scan/exchange budgets for the expensive queries") {
    // The five queries that dominate bench time, pinned to their current
    // plan budgets. A plan that acquires an extra parquet scan (subtree
    // recompute) or extra shuffle exchanges fails here BEFORE it shows up
    // as a bench regression — the gap q51 proved in round 7. Budgets are
    // exact-or-max on today's plans at sf0.001 with a little AQE headroom,
    // not aspirations.
    val budgets = Seq(
      // name                      max parquet scans, max shuffle exchanges
      ("q51_ngram_jaccard_pairs",  0, 5),
      ("q52_minhash_lsh_pairs",    0, 5),
      ("q53_simhash_pairs",        0, 5),
      ("q54_cosine_topk",          2, 2),
      ("q55b_cosine_pairs_lsh",    4, 8),
      ("q74_decontamination",      2, 6),
      ("q78_jaccard_prefix_filter", 5, 8),
      // q84: the persisted-index refactor DERIVES corpus stats from the
      // postings (distinct (doc_id, dl) — one index-sized exchange)
      // instead of a second corpus scan: one scan fewer, same exchanges
      ("q84_bm25_topk",            1, 6),
      ("q87_lm_bigram_score",      0, 6),
      // r9 additions (VERDICT r8 #4): the r8-new and barrier-backed
      // queries. For q79/q92 the pre-barrier subtree hides behind an
      // ExistingRDD scan, so a LOST barrier shows up as parquet scans
      // appearing — exactly the q51 rot mode this gate exists for.
      ("q79_semantic_dedup",       0, 2),
      // q86: one corpus scan fewer (q84's stats change), one index-sized
      // exchange more — the self-contained-index contract's cost
      ("q86_hybrid_retrieval_rrf", 3, 10),
      ("q90_repeated_spans",       1, 3),
      ("q91_dedup_apply",          1, 2),
      ("q92_repeated_spans_hashed", 1, 2),
      // r9-new queries: q93's corpus side reads parquet once and hashes
      // in-row; q94's shingle frame hides behind its barrier (scans=0)
      ("q93_cluster_split",        1, 2),
      ("q94_ngram_novelty",        0, 4),
      // q95: corpus scans once (broadcast-probe side), span detection is
      // the second scan; winners ride a one-row BroadcastExchange
      ("q95_boilerplate_strip",    2, 4),
      // q96: the (source, shingle) frame hides behind its barrier
      // (scans=0); pairs are one agg by shingle + one by pair
      ("q96_source_overlap",       0, 5),
      // q97: six pruned corpus scans — one per stage branch (4 stats +
      // bench shingles + stage-3 corpus side); survivor ID SETS ride
      // ExistingRDD barriers, never a re-derived subtree
      ("q97_curation_funnel",      6, 10),
      // q98 (md5 register face): the register frame hides behind its
      // barrier (scans=0); exchanges are the per-source estimate agg,
      // the broadcast pair cross join's build, the sources²×4096
      // union-register max, and the pairwise union estimate agg
      ("q98_source_overlap_sketch", 0, 4),
      // q99: one pruned scan, partial (value->count map) agg before the
      // by-source shuffle, plus the output sort's range exchange
      ("q99_source_profile",       1, 2),
      // q100: pure in-row generate — one scan, the only exchange is the
      // output sort's range partitioning
      ("q100_chunk_windows",       1, 1),
      // q101: corpus shingles AND the bench shingle set each hide behind
      // a barrier (scans=0 — a lost barrier on the bench side re-runs a
      // full corpus semi-join scan per consumer); exchanges: cnt + nb +
      // inter aggs, the jaccard join, the argmax window, the output sort
      ("q101_fuzzy_decontamination", 0, 7),
      // q103: two pruned corpus scans (distinct-vocab branch + token
      // stream); exchanges: vocab distinct, one-row merge-array agg,
      // per-doc agg, output sort. The fold itself must stay on the
      // vocab branch — a third scan or extra corpus-sized exchange
      // means per-occurrence tokenization crept back (84 s at sf0.1
      // vs ~6 s, SCALING.md)
      ("q103_bpe_tokenize",          2, 5),
      // q104: in-row soft quality gate — one scan, the only exchange is
      // the output sort
      ("q104_importance_sample",     1, 1),
      // q105: the bigram frame hides behind its barrier (scans=0 — four
      // consumers otherwise re-run tokenize+explode); exchanges: c12 +
      // c1 + v reference aggs, the (w1,w2) scoring join, per-doc agg,
      // the per-source tertile window, the output sort
      ("q105_perplexity_buckets",    0, 7),
      // q106: corpus scans once (quality in-row); the cluster membership
      // rides its own CC barriers; per-group argmax is a map-side-combined
      // agg (NO window sort) + the output sort
      ("q106_dedup_keep_best",       1, 3),
      // q107: corpus scans once; the sources-sized stats table hides
      // behind its barrier (a lost barrier = 3 corpus scans); rate table
      // broadcasts back; exchanges: count agg + output sort
      ("q107_temperature_mix",       1, 2),
      // q108: the trained piece table is pinned — the final plan is its
      // barrier read + the rank sort; the EM loop body is budgeted
      // separately in the iterative-rounds gate
      ("q108_unigram_train",         0, 1),
      // q109: two pruned corpus scans (distinct-word DP branch + token
      // stream, the q103 shape); exchanges: vocab distinct, per-doc agg,
      // join, output sort
      ("q109_unigram_tokenize",      2, 4),
      // q110: the trained weight table is pinned — final plan is its
      // barrier read + rank sort; the GD round body is budgeted in the
      // iterative-rounds gate
      ("q110_quality_classifier_train", 0, 1),
      // q111: one corpus scan (features in-row), weights broadcast,
      // dot+sigmoid in-row; exchanges: the output sort
      ("q111_quality_classifier_score", 1, 2),
      // q112: pure in-row denoising prep — one scan, only the output
      // sort's range exchange (the q100 shape)
      ("q112_span_corruption",          1, 1),
      // q113: corpus scans once; the sources-sized mass table hides
      // behind its barrier; epochs broadcast back; copy explosion is
      // in-row — exchanges: tot agg + output sort (the q107 shape)
      ("q113_epoch_mix",                1, 2),
      // q114: the tokenized base frame hides behind its barrier
      // (scans=0 — unigram AND bigram aggregates re-tokenize without
      // it); exchanges: uni + bi + total aggs and the unigram-join
      // sides; top-k is TakeOrdered, never a sort exchange
      ("q114_pmi_collocations",         0, 6),
      // q115: two pruned scans (rank branch + the source-column-only
      // distinct); exchanges: per-source rank window + distinct agg
      // (the sources-sized src_idx/n_sources window is single-partition
      // by design — dozens of rows) + output sort
      ("q115_training_order",           2, 4),
      // q116: bigram frame AND the c12 table each hide behind a barrier
      // (scans=0; a lost c12 barrier re-runs the corpus-wide pair count
      // for each of its four consumer statistics); exchanges: c12 + c1 +
      // cb aggs, the (w1,w2) scoring join, per-doc agg + output sort
      ("q116_kneser_ney_score",         0, 5),
      // q117: one corpus scan; the k×dim sign matrix assembles from two
      // `range`s (no scan) into a one-row broadcast; projection is an
      // in-row fold — exchanges: the two matrix-assembly aggs (k-row +
      // 1-row) and the output sort; the corpus never shuffles
      ("q117_jl_projection",            1, 3),
      // q118: everything behind barriers — shingle index, the common
      // pair-count frame (3 consumers), the cluster table (4 consumers);
      // cluster-round plans are budgeted by the iterative-CC gate.
      // Exchanges: pos agg + neg argmax agg + output sort
      ("q118_contrastive_pairs",        0, 4),
      // q119: the trained merge table is pinned — the final plan is its
      // barrier read + the rank sort (the q108 shape); the round body is
      // budgeted in the iterative-rounds gate
      ("q119_wordpiece_train",          0, 1),
      // q120: ONE corpus scan — the token stream; the distinct-word
      // branch hides behind its barrier AND supplies the alphabet units
      // (a standalone vocab build would re-scan); exchanges: word
      // distinct, two vocab distincts, per-doc agg, output sort
      ("q120_wordpiece_tokenize",       1, 5),
      // q121: the keyed frame (rank window + order keys) hides behind
      // its barrier with two consumers; exchanges: within-bucket window
      // shuffle, bucket-totals agg (+ its small single-partition
      // window), output sort — NEVER a global-window single-partition
      // collapse of the corpus
      ("q121_shard_manifest",           0, 4),
      // q122: the (source, word) counts AND the contribution frame each
      // hide behind a barrier (scans=0; consumers: totals/marginal/
      // scoring join, then the KL sum + the argmax); exchanges: cq agg,
      // the scoring join's, per-source window, output sort — all on
      // vocab-bounded frames
      ("q122_source_kl_divergence",     0, 4),
      // q124: three scans only because the harness derives snapshot B
      // from the same file (old + kept + added legs); the generic
      // two-directory face pays one per snapshot. Exchanges: the
      // full-outer join's two sides + the output sort — digests only,
      // never text.
      ("q124_snapshot_diff",            3, 3),
      // q125: pure per-row regexp fold — one scan, the only exchange is
      // the output sort's range partitioning
      ("q125_normalize_text",           1, 1),
      // q129: tokenize barrier (0 scans), then two count-distinct aggs
      // (2 exchanges each at worst), the source join + output sort ride
      // source-cardinality frames
      ("q129_source_diversity",         0, 5),
      // q126: kNN barrier (0 scans — the O(n²) pair subtree is pinned
      // once for its two consumers), then means/top-1 joins + sort on
      // n-row fixed-width frames
      ("q126_margin_topk",              0, 5),
      // q127: two corpus passes (MG summary+N, then the candidate
      // rescore); candidate + N frames ride broadcasts
      ("q127_heavy_hitters",            2, 3),
      // q128: one scan into the min-k ObjectHashAggregate (partial
      // buffers ≤ k rows) + the output sort
      ("q128_mink_sample",              1, 3),
      // q135: one scan into the weighted min-k aggregate (same bounded
      // buffers, E–S key computed in-row) + the output sort — never a
      // per-group sort of the corpus
      ("q135_weighted_sample",          1, 3),
      // q148: stage frames barriered; one scan (the window-end max);
      // exchanges: the entrant/conversion joins collapse into the
      // ≤ window-hours offset frame, whose single-partition cumulative
      // windows are the documented bounded exemption
      ("q148_survival_curve",           1, 5),
      // q150: two pruned scans (query derivation + the one feeding the
      // postings barrier); exchanges: q84's probe shapes (postings agg,
      // df/stats, score agg, rank window) + the hits/metric collapse
      ("q150_retrieval_self_eval",      2, 7),
      // q147: pair frame + split table behind barriers (scans=0; the
      // CC rounds run under the iterative gate); exchanges: the
      // endpoint joins collapse into the ≤4-row matrix agg + sort
      ("q147_split_leakage",            0, 3),
      // q144: the transition-count frame hides behind its barrier
      // (scans=0); exchanges: the per-user lag window shuffle collapses
      // into the types²-sized agg, + row-total agg/join + sort
      ("q144_event_transitions",        0, 3),
      // q145: stage frames barriered (the q131 shapes); exchange: the
      // one-row stats agg over the converting-users frame
      ("q145_conversion_lag",           0, 2),
      // q146: corpus scan behind a barrier (two consumers: keeper table
      // + flagged join — digests travel, never text); exchanges: keeper
      // agg, the h-join, per-source agg + sort
      ("q146_unique_accounting",        0, 4),
      // q143: the union-vocab count frame and the contribution frame
      // each hide behind a barrier (scans=0); exchanges: totals agg,
      // per-source window, the output joins + sort — all
      // sources×vocab-bounded
      ("q143_snapshot_drift",           0, 4),
      // q142: one pruned scan, quality + binning in-row; exchanges: the
      // bins-sized agg + output sort
      ("q142_quality_calibration",      1, 2),
      // q141: the pair graph, degree table, and oriented edge set each
      // hide behind a barrier (scans=0); exchanges: degree agg, the
      // orientation joins, wedge + closing joins, per-node agg + sort —
      // all on graph-sized frames
      ("q141_triangle_cohesion",        0, 8),
      // q149: the (doc_id, nt) frame hides behind its barrier with both
      // strategies as consumers (scans=0); exchanges: per-strategy
      // bucket windows + offset joins + batch/strategy aggs — ranks are
      // hierarchical, never a no-partition window over the corpus
      ("q149_padding_waste",            0, 9),
      // q140: one corpus scan folds into per-source masses behind the
      // ranked frame's barrier (scans=0 in the final plan); exchanges:
      // the mass agg + cap-stats agg — window and joins ride
      // sources-sized frames
      ("q140_unimax_allocation",        0, 3),
      // q139: all three frames (changeset, both shingle sets) hide
      // behind lazy barriers (scans=0); exchanges: size aggs, the
      // shingle-key index join, pair agg + argmax, output sort
      ("q139_snapshot_fuzzy_diff",      0, 6),
      // q138: two pruned scans (class counts + the ranked frame);
      // exchanges: labels-sized count agg + its 1-row min, the
      // per-label window shuffle, output sort
      ("q138_label_balance",            2, 4),
      // q136: everything expensive hides behind barriers/checkpoints
      // (k-means result, the multi-probe ranked frame, the CC output);
      // exchanges: keeper argmin agg + its join + output sort — the
      // within-cluster pair join rides the barriered frames; CC rounds
      // are budgeted by the iterative gate
      ("q136_semdedup_kmeans",          0, 4),
      // q123: the corpus side is ONE scan with zero shuffle (in-row
      // probe against the broadcast bit array + output sort); the other
      // two scans and all remaining exchanges build the bench-sized
      // bloom (semi-join + sparse bit_or + dense assembly)
      ("q123_bloom_decontamination",    3, 4),
      // q133: pure per-row rule expressions — one pruned scan, the only
      // exchange is the output sort's range partitioning
      ("q133_gopher_rules",             1, 1),
      // q134: the exploded token frame hides behind its barrier (two
      // consumers: bucket stats + per-doc counts; scans=0); exchanges:
      // st agg + tot agg on bucket-sized frames, db agg, per-doc agg,
      // the per-source window shuffle + output sort — the lp table and
      // totals ride broadcasts
      ("q134_dsir_weights",             0, 7),
      // q131: the three stage frames hide behind lazy barriers (each has
      // two consumers: its count + the next stage's join); exchanges:
      // per-stage min-agg + join shuffles and the three one-row count
      // aggs — NEVER a per-user event-sequence collect
      ("q131_event_funnel",             0, 9),
      // q137: one corpus scan into the hourly agg; the RANGE-frame
      // window + output sort run on the types×hours bucket frame
      ("q137_event_anomaly",            1, 3),
      // q132: everything downstream of the distinct (user, day) barrier
      // runs on the ≤ users×days frame; exchanges: first-day agg,
      // cohort-size agg, cell agg + joins + output sort over
      // cohort-cardinality frames
      ("q132_retention_cohorts",        0, 3),
      // q151: one events scan; both SCD2 windows share the user_id
      // partitioning (1 exchange) + the output range sort
      ("q151_scd2_intervals",           1, 2),
      // q152: the (basket, item) frame sits behind its barrier; the
      // self-join reuses its okey partitioning; pair agg + two item-count
      // joins + one-row broadcast + TakeOrdered
      ("q152_basket_lift",              0, 5),
      // q153: the per-user metric frame is barriered; each of the three
      // hierarchical rank passes costs a bucket window + offset agg +
      // offset window + join-back, all on the users-sized frame
      ("q153_rfm_segments",             0, 11),
      // q154: session/path windows share the user_id partitioning behind
      // the barrier; path counts + TakeOrdered on the path frame
      ("q154_session_paths",            0, 2),
      // q155/q156: centroid explode collapses to labels×dims under
      // map-side combine; scoring joins the broadcast centroid table and
      // folds in-row — the corpus never re-shuffles
      ("q155_prototype_prune",          0, 4),
      ("q156_embedding_dispersion",     0, 4),
      // q157: one corpus scan to the (source, length) histogram; the
      // windows + final aggs run on the histogram frame
      ("q157_token_gini",               1, 3),
      // q159: the banded-hash frame hides behind its barrier; band join
      // reuses its partitioning; pair distinct + output sort
      ("q159_image_dhash_pairs",        0, 2),
      // q160: final plan reads the k eagerly-checkpointed selection rows
      // + the output sort; the per-round pass is a narrow barrier read
      ("q160_kcenter_coreset",          0, 1),
      // q161: three window expansions off the distinct-(user,day) barrier
      // (distinct + count each) + joins + sort, all on day-sized frames
      ("q161_rolling_active_users",     0, 8),
      // q162: one per-user window shuffle; touch agg barriered, total via
      // one-row broadcast
      ("q162_last_touch_attribution",   0, 2),
      // q163: one corpus scan exploding to (doc, char) cells with
      // map-side combine; per-doc agg + output sort
      ("q163_char_entropy",             1, 3),
      // q164: same shape as q159 — banded-hash barrier + pair distinct
      ("q164_audio_fingerprint_pairs",  0, 2),
      // q165: two corpus scans (first-occurrence agg + doc counts — the
      // second reads only doc_id, a metadata-cheap projection); bucket
      // joins/window/sort on bucket-sized frames
      ("q165_vocab_growth",             2, 4),
      // q166: one events scan feeding both the cohort agg and revenue
      // join (the cohort frame is barriered); cohort-frame windows
      ("q166_ltv_curve",                1, 4),
      // q167: quality frame barriered; bucket window + offset agg/window
      // + join-back, all on the doc frame / bucket frames
      ("q167_quality_percentile_norm",  0, 4),
      // q168: one per-user window shuffle behind the histogram barrier;
      // ladder-sized agg + one-row broadcast
      ("q168_interevent_gaps",          0, 2),
      // q169: three window unions off the per-day sketch barrier + joins
      // + sort, all on day-sized sketch frames
      // q169 (md5 register face): per-day register agg + 3 window
      // register-max unions + 3 per-day estimate aggs + the output sort
      ("q169_rolling_actives_sketch",   0, 8),
      // q170: cluster/size aggs behind barriers; output assembly only
      ("q170_component_size_histogram", 0, 1),
      // q171: point/replica aggs off the quality barrier (the ×B explode
      // collapses under map-side combine to sources×B cells) + CI agg +
      // join + sort on sources-sized frames
      ("q171_bootstrap_quality_ci",     0, 4),
      // q172: banded batch/store sides off the hash barrier; band join +
      // pair distinct
      ("q172_media_dedup_incremental",  0, 2),
      // q173: one count agg off the barrier; stats ride a one-row
      // broadcast; the rank window runs on the topN-row limited frame
      ("q173_key_skew_audit",           0, 1),
      // q174: the q132 cell chain (distinct + aggs behind its barriers)
      // + the one-row sufficient-statistics aggregate
      ("q174_retention_halflife",       0, 3),
      // q175: the aggregator scan (k-row partial buffers — O(groups·k)
      // shuffle) + the join-back scan for exact prices + output sort
      ("q175_topk_per_group_agg",       2, 2),
      // q176: one events scan into the shared user_id window + the
      // session agg reuses the partitioning; output sort
      ("q176_bot_sessions",             1, 2),
      // q177: pair/doc-max counts off the floor-threshold pair barrier;
      // ladder joins on rung-sized frames
      ("q177_threshold_sweep",          0, 7),
      // q178: the q131 min-agg cascade (stage frames barriered) + the
      // one-row count BNLJ assembly
      ("q178_windowed_funnel",          0, 9),
      // q179: one corpus scan collapses to per-source sufficient stats
      // behind barriers; allocation runs on the sources frame
      ("q179_neyman_allocation",        0, 2),
      // q180: one events scan into the shared user window; core/days
      // frames barriered; week grid + joins on users-sized frames
      ("q180_user_features",            1, 6),
      // q181: corpus scan + the persisted-weights parquet (the q217
      // pattern — no training in the plan) + TakeOrdered
      ("q181_active_learning_batch",    2, 1),
      // q182: bins-sized interval enumeration off the calibration
      // barrier — bins³ cells at most
      ("q182_isotonic_calibration",     0, 4),
      // q183: three pair aggregates off the per-doc flag barrier
      ("q183_filter_agreement",         0, 3),
      // q184: TakeOrdered bounds the frame at k+1; the barrier hides the
      // scan; aggregates are one-row
      ("q184_tail_index_hill",          0, 0),
      // q185: session window + the barriered basket machinery
      ("q185_session_type_affinity",    0, 5),
      // q186: shared-shingle recovery off the pair + shingle barriers;
      // per-pair evidence window on shared-bounded groups
      ("q186_neardup_explanation",      0, 4),
      // q187: contingency/marginal aggs behind barriers; everything
      // after is (k × labels)-sized; k-means rounds under their own gate
      ("q187_cluster_purity",           0, 11),
      // q188: per-bucket window + bucket-max table off one events pass;
      // ladder-sized downstream; lateness frame barriered
      ("q188_watermark_lateness",       0, 3),
      // q189: est/exact pair machinery behind its own barriers; the
      // audit adds a pair-bounded join + one-row aggregate
      ("q189_minhash_error_audit",      0, 8),
      // q190: score frame barriered; the CDF window runs on the bounded
      // score-value histogram; totals ride one-row broadcasts
      ("q190_conformal_threshold",      0, 8),
      // q191: one events scan into the per-user agg, then ONE global
      // conditional aggregate (no barrier, no per-arm filters — the
      // single-row contract must hold even with an empty arm)
      ("q191_ab_conversion_test",       1, 2),
      // q192: the q51 freq-capped index join behind its barrier; pair
      // aggregates + the two count joins
      ("q192_containment_pairs",        0, 4),
      // q193–q203: index faces — "scans" here are INDEX parquet reads
      // (documents never appears; DedupIndexSpec pins that separately).
      // q194/q195/q196 add the one documents scan their output needs.
      ("q193_dedupindex_clusters",      1, 1),
      ("q194_dedupindex_apply",         2, 1),
      ("q195_dedupindex_split",         2, 1),
      ("q196_dedupindex_keep_best",     2, 2),
      ("q197_dedupindex_histogram",     0, 1),
      ("q198_dedupindex_sweep",         0, 4),
      ("q199_dedupindex_explanation",   0, 3),
      ("q200_dedupindex_leakage",       0, 2),
      // q201: the tiny clusters relation is read per consumer (4×) —
      // parquet re-reads of a membership-sized table, not recompute
      ("q201_dedupindex_contrastive",   4, 3),
      ("q203_dedupindex_pagerank",      0, 1),
      // q209: est side behind the banded barrier, exact side ONE
      // pairs-parquet scan; audit join + one-row aggregate — half of
      // q189's standalone budget
      ("q209_dedupindex_error_audit",   1, 4),
      // q204/q205: codebooks/centroids are eagerly-checkpointed k×dim
      // frames; the corpus scan feeds codes + ADC probes
      ("q204_pq_adc_topk",              2, 4), // +1 scan: the persisted vectors/codebook artifact (q219-style oracle face)
      ("q205_ivfpq_topk",               2, 7), // +1 scan: the persisted artifact relations
      // q206: sessionization window + bin-join both read the barriered
      // interval frame; exchanges = session window + output sort
      ("q206_concurrent_sessions",      0, 2),
      // q207: the audit reads the WRITTEN shard files (one scan) +
      // per-shard agg + output sort (the manifest write happens before
      // this plan exists)
      ("q207_shard_write",              1, 2),
      // q208: sources-sized KMV cross join behind the sketch barrier;
      // the one exchange is the sketch agg
      ("q208_source_overlap_kmv",       0, 1),
      // q210: window frame barriered (one explode feeds both the content
      // groupBy and the rollup); exchanges = content agg + per-doc
      // rollup + output sort
      ("q210_exact_substring_dup",      0, 3),
      // q211: pairs parquet + the two documents-side source projections;
      // AQE broadcasts the pair-bounded side, so exchanges are just the
      // matrix agg + output sort
      ("q211_cross_source_dup_matrix",  3, 2),
      // q212: window frame barriered; one docs scan for n_chars; content
      // agg + per-doc lead window/rollup + output sort
      ("q212_substring_dup_coverage",   1, 3),
      // q213: probe docs scan + the folded windows-parquet scan; fold
      // agg + per-doc rollup + output sort (the probe never re-windows
      // the ingested corpus)
      ("q213_substring_dup_incremental", 2, 3),
      // q214: window frame barriered; one docs scan for the text join;
      // exchanges = content agg + cut-position rollup + output sort
      // (AQE broadcasts the per-doc cut arrays into the text join)
      ("q214_substring_dedup_apply",    1, 3),
      // q215: probe docs scan ×2 (windows + text join) + the folded
      // windows-parquet scan; fold agg + cut rollup + output sort
      ("q215_substring_dedup_apply_incremental", 3, 3),
      // q216: pair-histogram + probability arithmetic run on the
      // barriered micro-Jaccard pair frame — documents behind the barrier
      ("q216_lsh_parameter_plan",       0, 2),
      // q217: weights parquet (one-row broadcast) + the docs scan; the
      // score itself is in-row — exchanges are the output ordering only
      ("q217_classifier_score_persisted", 2, 2),
      // q218: centroids/codebook are checkpointed k×dim barriers like
      // q205; the residual construction adds one posting join over the
      // barriered unit frame (+1 exchange vs q205's 7)
      ("q218_ivfpq_residual_topk",      2, 8), // +1 scan: the persisted artifact relations
      // q219: the planner arithmetic runs on the index's stored pair
      // graph — zero documents scans (pinned separately in DedupIndexSpec)
      ("q219_dedupindex_planner",       0, 2),
      // q220: one embeddings scan feeds corpus + probe sides (decimal
      // margins in-row); candidate dedup + re-score + top-k windows
      ("q220_ann_lsh_topk_md5",         1, 3),
      // q221: three tokenizer-sized unit tables off the training
      // machinery (each family's rounds under the iterative gate); the
      // overlap arithmetic runs on ≤ 90 rows
      ("q221_tokenizer_vocab_overlap",  0, 8),
      // q222: the q51 pair machinery (its own barriers) + the exact
      // cosine self-join + one pair-key outer join + a 3-row aggregate
      ("q222_dedup_family_agreement",   3, 8),
      // q56 (r14): margins fold once behind the barrier (scans hidden
      // by it), candidate dedup + re-score + top-k window — the q220
      // shape with persisted xxhash planes
      ("q56_ann_lsh_topk",              1, 3),
      // q223: the five stat branches re-read the PRUNED documents scan
      // by design (only id sets cross stage barriers); exchanges =
      // funnel joins + the per-source windows + output sort
      ("q223_curation_pipeline",        6, 12),
      // the r14 video/audio artifact faces: the per-frame/per-asset hash
      // tables land behind persistArtifact + localCheckpoint (q225/q226)
      // or a direct artifact scan (q227); everything after is the banded
      // join (2 agg shuffles + sort) or one window + sort
      ("q225_video_frame_dedup",        1, 5),
      ("q226_audio_codec_pairs",        1, 4),
      ("q227_scene_cuts",               1, 3),
      // the r15 GIF faces ride the same artifact + banded-join shapes:
      // q228 = the q159 still-image pair plan, q229 = the q225 video plan
      ("q228_gif_png_dedup_pairs",      1, 5),
      ("q229_animated_gif_frame_dedup", 1, 5),
      // q231/q232 (r16): identical shape to q159/q228 — the interlaced/
      // 16-bit PNG and BMP corpus hashes behind persistArtifact, then
      // the banded join
      ("q231_png_interlace_dedup_pairs", 1, 5),
      ("q232_bmp_dedup_pairs",           1, 5),
      ("q233_tiff_dedup_pairs",          1, 5),
      // q235/q236 (r16): TGA and ICO corpora ride the same artifact +
      // banded-join shape as every still-image pair face
      ("q235_tga_dedup_pairs",           1, 5),
      ("q236_ico_dedup_pairs",           1, 5),
      // q237/q238 (r16): the AIFF/AIFC/AU and PCM-depth audio corpora
      // ride the q164/q226 audio-pair shape
      ("q237_aiff_au_pairs",             1, 4),
      ("q238_pcm_depth_pairs",           1, 4),
      // q230: the video funnel — frame hashes behind persistArtifact +
      // barriers (1 artifact scan), gate pairs + scene window + the
      // q121-style bucket windows + shard repartition + output sort;
      // the shard read-back is its own parquet scan
      ("q230_video_curation_pipeline",  2, 12),
      // q234 (r16): the stills funnel — hash/stat table behind
      // persistArtifact (1 artifact scan), banded dedup gate + quality
      // filter + bucket windows + shard repartition + output sort; the
      // shard read-back is its own parquet scan
      ("q234_image_curation_pipeline",  2, 12),
      // q239 (r16): the audio funnel — identical machinery
      // (curationFunnelFrom) over the audio ingest table
      ("q239_audio_curation_pipeline",  2, 12))
    budgets.foreach { case (name, maxScans, maxExchanges) =>
      val p = plan(name)
      // count the formatted-explain detail headers — the tree prints each
      // node a second time, so a bare "Scan parquet" regex double-counts
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
      assert(scans <= maxScans,
        s"$name: $scans parquet scans (budget $maxScans) — subtree recompute?\n$p")
      assert(exchanges <= maxExchanges,
        s"$name: $exchanges shuffle exchanges (budget $maxExchanges)\n$p")
    }
  }

  test("plan-regression gate: per-round budgets for the iterative CC operators (q62/q67)") {
    // The iterative operators' cost is rounds × the round plan, so a
    // regression in the loop body multiplies by the round count and the
    // final (checkpointed) plan never shows it. Pin each round builder
    // directly: zero parquet scans (rounds read the barriered edge set,
    // never the corpus) and a bounded exchange count.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.ExplainMode
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      .localCheckpoint(true)
    val labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint(true)
    val vocab = Seq((Seq("l", "o", "w"), 5L), (Seq("n", "e", "w"), 2L))
      .toDF("syms", "wc").localCheckpoint(true)
    val rounds = Seq(
      ("labelPropRound (q62)",
        graft.operators.Dedup.labelPropRound(edges, labels), 4),
      ("starRound (q67)",
        graft.operators.Dedup.starRound(edges), 9),
      // q102: one map-side-combined shuffle of pair counts per round —
      // a regression here multiplies by nMerges
      ("bpeRoundPairs (q102)",
        graft.operators.Curation.bpeRoundPairs(vocab), 1),
      // q108: one EM round's E step — the one-row logp map broadcasts
      // into the in-row DP; the word vocab reads its barrier, zero
      // shuffles (the M-step re-count is the round's only exchange and
      // is piece-vocab-sized)
      ("unigram segmented (q108)",
        graft.operators.Unigram.segmented(
          Seq(("low", 5L), ("new", 2L)).toDF("w", "wc").localCheckpoint(true),
          graft.operators.Unigram.pieceLogProbs(
            Seq(("l", 3L), ("o", 3L), ("w", 3L), ("n", 2L), ("e", 2L), ("lo", 2L))
              .toDF("piece", "cnt").localCheckpoint(true))), 1),
      // q119: one WordPiece round — pair counts + symbol counts (both
      // map-side combined over the barriered vocab) joined and scored;
      // the joins are symbol-vocab-sized
      ("wordpieceRoundScores (q119)",
        graft.operators.Wordpiece.wordpieceRoundScores(vocab), 6),
      // q110: one GD round — margin in-row under the one-row broadcast
      // weights, per-dim gradient agg (map-side combined, dims-sized
      // output), left join back onto the dims-sized weight table
      ("classifier gdRound (q110)", {
        val feats = graft.operators.Classifier.features(
          Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"))
            .toDF("doc_id", "text")).localCheckpoint(true)
        val w0 = spark.range(0, graft.operators.Classifier.dims + 1)
          .select(col("id").cast("int").as("dim"),
            org.apache.spark.sql.functions.lit(0.0).as("weight"))
          .localCheckpoint(true)
        graft.operators.Classifier.gdRound(feats,
          spark.range(1).select(org.apache.spark.sql.functions.expr(
            s"transform(sequence(0, ${graft.operators.Classifier.dims}), d -> CAST(0.0 AS DOUBLE))").as("w")),
          w0)
      }, 4),
      // q130: one PageRank round — edge×rank join (by u), contribution
      // agg (by v), node left-join + the one-row N broadcast; all frames
      // are edge/node-sized barriers, never the corpus
      ("pageRankRound (q130)", {
        val prEdges = Seq((1L, 2L, 0.5), (2L, 1L, 0.5))
          .toDF("u", "v", "share").localCheckpoint(true)
        val prNodes = Seq(1L, 2L, 3L).toDF("doc_id").localCheckpoint(true)
        val prRanks = prNodes.withColumn("rank",
          org.apache.spark.sql.functions.lit(1.0 / 3)).localCheckpoint(true)
        val prN = Seq(3L).toDF("n_total").localCheckpoint(true)
        graft.operators.Dedup.pageRankRound(prEdges, prRanks, prNodes, prN, 0.85)
      }, 5))
    rounds.foreach { case (name, df, maxExchanges) =>
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
      assert(scans == 0,
        s"$name: a CC round must never re-scan parquet ($scans):\n$p")
      assert(exchanges <= maxExchanges,
        s"$name: $exchanges shuffle exchanges (budget $maxExchanges)\n$p")
    }
  }

  test("lsh bucket caps are broadcast anti-joins, never a second shuffle of the banded frame") {
    // the r7 cap equi-joined every banded row against the under-cap key
    // list (a full extra shuffle — most of q52's r7 bench regression);
    // the guard must stay an anti-join against the tiny over-cap set
    Seq("q52_minhash_lsh_pairs", "q53_simhash_pairs").foreach { name =>
      val p = plan(name)
      assert(p.contains("LeftAnti"), s"$name cap anti-join missing:\n$p")
      assert("BroadcastHashJoin LeftAnti".r.findAllIn(p).nonEmpty ||
        "LeftAnti, BuildRight".r.findAllIn(p).nonEmpty,
        s"$name cap must broadcast the over-cap set:\n$p")
    }
  }

  test("q84 bm25 probes a broadcast query side against the postings index, never a cross join") {
    val p = plan("q84_bm25_topk")
    // the only nested-loop allowed is the bounded one-row stats join
    // (q80's admissibility argument); the scoring join must be hash
    val crosses = "BroadcastNestedLoopJoin Cross".r.findAllIn(p).size
    assert(crosses <= 1, s"q84 has $crosses cross joins (1-row stats only):\n$p")
    assert(!p.contains("CartesianProduct"), s"q84 cartesian:\n$p")
    assert(p.contains("WindowGroupLimit"), s"q84 top-k must group-limit:\n$p")
    // postings barrier: the inverted index builds once (q51 discipline) —
    // the probe side reads the checkpointed index, not a parquet re-scan
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"q84: $scans parquet scans — index subtree recompute?\n$p")
  }

  test("partial aggregation happens before the shuffle (map-side combine)") {
    val p = executedPlan("q01_pricing_summary")
    assert(p.contains("partial_sum"), s"map-side combine missing: $p")
    assert(p.contains("functions=[sum("), s"final aggregate missing: $p")
  }

  test("q128 min-k face aggregates with bounded buffers — no per-group sort/window") {
    // the whole point of the Aggregator face: the window form sorts every
    // group; this form must show a partial ObjectHashAggregate and no
    // Window or corpus Sort before the aggregation
    val p = plan("q128_mink_sample")
    assert(p.contains("ObjectHashAggregate"), s"typed Aggregator path missing: $p")
    assert(p.contains("partial_minkagg") || p.toLowerCase.contains("partial"),
      s"map-side combine missing: $p")
    assert(!p.contains("Window"), s"window crept into the min-k face: $p")
  }
}
