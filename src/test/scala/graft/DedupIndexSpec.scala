package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted dedup index (build → parquet → probe): every apply face
  * must be BYTE-EQUAL to its standalone counterpart, the incremental
  * update must be indistinguishable from a full rebuild, and the
  * index-only faces must never touch the documents table. */
class DedupIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // planted corpus (the DedupSpec population): 0/1 exact dups, 2/3 and
  // 5/6 near dups, 4 unrelated, 7 short; + sources for the doc-level faces
  private val base2 = "spark runs distributed queries over very large datasets " +
    "with columnar storage and adaptive execution planning across many worker " +
    "nodes while caching hot partitions in memory"
  private val base5 = "data pipelines ingest clean filter join aggregate and " +
    "write results downstream every day with checkpoint recovery watermark " +
    "tracking and exactly once delivery into warehouse tables"
  private lazy val docs = Seq(
    (0L, "a", "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "a", "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a", base2),
    (3L, "b", base2.replaceAll("memory$", "ram")),
    (4L, "b", "completely different content about cooking pasta with tomato sauce and fresh basil herbs"),
    (5L, "b", base5),
    (6L, "c", base5.replaceAll("tables$", "marts")),
    (7L, "c", "tiny doc")
  ).toDF("doc_id", "source", "text")

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-idx-spec").toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertFacesEqual(d: DataFrame, idx: DedupIndex.Index): Unit = {
    val clusters = Dedup.duplicateClusters(Dedup.exactJaccardPairs(d, 0.6))
    val faces: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("clusters", DedupIndex.clustersAgainst(idx), clusters),
      ("apply", DedupIndex.applyAgainst(d, idx), Dedup.dedupApply(d, clusters)),
      ("split", DedupIndex.splitAgainst(d, idx), Dedup.clusterSplit(d, clusters)),
      ("keepBest", DedupIndex.keepBestAgainst(d, idx), Dedup.dedupKeepBest(d, clusters)),
      ("histogram", DedupIndex.histogramAgainst(idx), Dedup.componentSizeHistogram(d, clusters)),
      ("sweep", DedupIndex.sweepAgainst(idx), Dedup.thresholdSweep(d)),
      ("explanation", DedupIndex.explanationAgainst(idx), Dedup.nearDupExplanation(d)),
      ("leakage", DedupIndex.leakageAgainst(idx), Dedup.splitLeakageAudit(d)),
      ("contrastive", DedupIndex.contrastiveAgainst(idx), Dedup.contrastivePairs(d, 0.6)),
      ("pairs@0.6", DedupIndex.pairsAt(idx, 0.6), Dedup.exactJaccardPairs(d, 0.6)),
      ("triangles", DedupIndex.trianglesAgainst(idx, 0.3), Dedup.triangleCohesion(d, 0.3)),
      // the index face runs the md5 lane family (its oracle is q189's
      // SQL verbatim), so its standalone twin is the md5 audit
      ("errorAudit", DedupIndex.errorAuditAgainst(idx), Dedup.minhashErrorAuditMd5(d)),
      ("planner", DedupIndex.plannerAgainst(idx), Dedup.lshParameterPlan(d)))
    faces.foreach { case (name, against, standalone) =>
      assert(rows(against) === rows(standalone), s"face '$name' diverges")
    }
  }

  test("every index face is byte-equal to its standalone form (planted corpus)") {
    val dir = tempDir()
    DedupIndex.build(docs, dir)
    assertFacesEqual(docs, DedupIndex.load(spark, dir))
  }

  test("every index face is byte-equal to its standalone form (sf0.001)") {
    val d = Tables.documents(spark, sf001)
    val dir = tempDir()
    DedupIndex.build(d, dir)
    assertFacesEqual(d, DedupIndex.load(spark, dir))
  }

  test("incremental update equals a full rebuild, relation for relation") {
    // extend the corpus so the update sees BOTH pair kinds: 8/9 are
    // near-dups of each other (new×new) and 3/6 pair with old docs
    // (new×old)
    val extra = Seq(
      (8L, "d", base2.replaceAll("datasets", "corpora")),
      (9L, "d", base2.replaceAll("datasets", "corpora").replaceAll("memory$", "ram")))
      .toDF("doc_id", "source", "text")
    val all = docs.unionByName(extra)
    val oldDocs = all.filter(col("doc_id").isin(0L, 2L, 4L, 5L, 7L))
    val newDocs = all.filter(!col("doc_id").isin(0L, 2L, 4L, 5L, 7L))
    val full = tempDir(); val incr = tempDir()
    DedupIndex.build(all, full)
    DedupIndex.build(oldDocs, incr)
    DedupIndex.update(newDocs, incr)
    val fi = DedupIndex.load(spark, full)
    val ii = DedupIndex.load(spark, incr)
    assert(rows(ii.shingles) === rows(fi.shingles), "shingles diverge")
    assert(rows(ii.counts) === rows(fi.counts), "counts diverge")
    assert(rows(ii.pairs) === rows(fi.pairs), "pairs diverge")
    assert(rows(ii.clusters) === rows(fi.clusters), "clusters diverge")
    assert(rows(ii.meta) === rows(fi.meta), "meta diverges")
    // sanity: the update actually contributed pairs of both kinds
    val p = ii.pairs.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((8L, 9L)), "new×new pair missing")
    assert(p.contains((2L, 3L)), "new×old pair missing")
    assertFacesEqual(all, ii)
  }

  test("q211 source matrix: planted cross-source pairs land in the right cells") {
    val dir = tempDir()
    DedupIndex.build(docs, dir)
    val got = DedupIndex.sourceMatrixAgainst(docs, DedupIndex.load(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // pairs at 0.6: (0,1) a/a, (2,3) a/b, (5,6) b/c
    assert(got === Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "c", 1L)))
  }

  test("index-only faces read zero document scans (the build-once contract)") {
    import org.apache.spark.sql.execution.ExplainMode
    val idx = DedupIndex.ensure(spark, sf001)
    val indexOnly: Seq[(String, DataFrame)] = Seq(
      ("clusters", DedupIndex.clustersAgainst(idx)),
      ("histogram", DedupIndex.histogramAgainst(idx)),
      ("sweep", DedupIndex.sweepAgainst(idx)),
      ("explanation", DedupIndex.explanationAgainst(idx)),
      ("leakage", DedupIndex.leakageAgainst(idx)),
      ("contrastive", DedupIndex.contrastiveAgainst(idx)),
      ("triangles", DedupIndex.trianglesAgainst(idx)),
      ("errorAudit", DedupIndex.errorAuditAgainst(idx)),
      ("planner", DedupIndex.plannerAgainst(idx)))
    indexOnly.foreach { case (name, df) =>
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("documents.parquet"),
        s"face '$name' scans the documents table — the index must answer it alone:\n$p")
    }
  }

  test("compact: fewer files, byte-identical relations, faces still answer") {
    val extra = Seq(
      (8L, "d", base2.replaceAll("datasets", "corpora")),
      (9L, "d", base2.replaceAll("datasets", "corpora").replaceAll("memory$", "ram")))
      .toDF("doc_id", "source", "text")
    val all = docs.unionByName(extra)
    val dir = tempDir()
    DedupIndex.build(docs.filter(col("doc_id") <= 3), dir)
    // three updates → three append waves per growing relation
    DedupIndex.update(docs.filter(col("doc_id").isin(4L, 5L)), dir)
    DedupIndex.update(docs.filter(col("doc_id").isin(6L, 7L)), dir)
    DedupIndex.update(extra, dir, waveId = Some("w-extra"))
    val before = DedupIndex.load(spark, dir)
    val pairsBefore = rows(before.pairs)
    val shinglesBefore = rows(before.shingles)
    val countsBefore = rows(before.counts)
    val stats = DedupIndex.compact(spark, dir)
    stats.foreach { case (rel, (b, a)) =>
      assert(a <= b, s"$rel: $b -> $a files")
    }
    assert(stats("pairs")._1 > stats("pairs")._2,
      s"three updates must leave compactable pair files: $stats")
    val after = DedupIndex.load(spark, dir)
    assert(rows(after.pairs) === pairsBefore, "pairs must be byte-identical")
    assert(rows(after.shingles) === shinglesBefore)
    assert(rows(after.counts) === countsBefore)
    // faces still answer, equal to the standalone forms on the full corpus
    assertFacesEqual(all, after)
    // and a post-compaction update still works
    val more = Seq((10L, "e", "brand new content that matches nothing else " +
      "in this tiny corpus at all today")).toDF("doc_id", "source", "text")
    DedupIndex.update(more, dir)
    assert(DedupIndex.load(spark, dir).counts.filter(col("doc_id") === 10L).count() == 1)
    // replaying a wave the compaction ABSORBED (its per-wave files are
    // folded away, its marker replaced by the .absorbed manifest) must
    // still be a no-op — update()'s at-least-once recovery contract
    // survives compaction
    val snapCounts = rows(DedupIndex.load(spark, dir).counts)
    val snapPairs = rows(DedupIndex.load(spark, dir).pairs)
    DedupIndex.update(extra, dir, waveId = Some("w-extra"))
    assert(rows(DedupIndex.load(spark, dir).counts) === snapCounts,
      "replaying an absorbed wave re-appended counts")
    assert(rows(DedupIndex.load(spark, dir).pairs) === snapPairs,
      "replaying an absorbed wave re-appended pairs")
    // and a SECOND compaction folds the first compaction's wave + the
    // post-compaction updates, keeping every absorbed id committed
    DedupIndex.compact(spark, dir)
    DedupIndex.update(extra, dir, waveId = Some("w-extra"))
    assert(rows(DedupIndex.load(spark, dir).counts) === snapCounts,
      "absorbed ids must survive repeated compactions")
  }

  test("stranded compact swap of a wave relation restores at load/update entry") {
    val dir = tempDir()
    DedupIndex.build(docs, dir)
    val expected = rows(DedupIndex.load(spark, dir).pairs)
    // simulate a compact() crash between swapCompacted's two renames:
    // the relation sits intact at <rel>.compact-old, the live dir is gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/pairs"),
      new org.apache.hadoop.fs.Path(s"$dir/pairs.compact-old")))
    // load() restores before reading — faces keep working
    assert(rows(DedupIndex.load(spark, dir).pairs) === expected,
      "stranded pairs relation must restore at read entry")
    // same for update(): strand again, update must restore then append
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/counts"),
      new org.apache.hadoop.fs.Path(s"$dir/counts.compact-old")))
    val more = Seq((20L, "e", "entirely fresh words appearing nowhere else " +
      "around this corpus right now")).toDF("doc_id", "source", "text")
    DedupIndex.update(more, dir)
    assert(DedupIndex.load(spark, dir).counts.filter(col("doc_id") === 20L).count() == 1)
  }

  test("df-cap crossing: detected, surfaced, and gone after the rebuild it demands") {
    // dfCap = 2: "alpha beta gamma" lives in docs 1+2 at build (df = 2,
    // under cap — its pair enters the index), then doc 3 pushes it to 3
    val d12 = Seq(
      (1L, "a", "alpha beta gamma delta epsilon zeta"),
      (2L, "a", "alpha beta gamma eta theta iota")).toDF("doc_id", "source", "text")
    val d3 = Seq((3L, "b", "alpha beta gamma kappa lambda mu"))
      .toDF("doc_id", "source", "text")
    val dir = tempDir()
    DedupIndex.build(d12, dir, dfCap = 2)
    assert(DedupIndex.needsRebuild(spark, dir).count() == 0,
      "fresh build must report no crossings")
    val crossings = DedupIndex.update(d3, dir)
    val c = crossings.collect().map(r =>
      (r.getAs[Long]("old_df"), r.getAs[Long]("new_df")))
    assert(c.toSeq == Seq((2L, 1L)),
      s"the planted crossing (old df 2, +1 past cap 2) must surface: ${c.toSeq}")
    // the persisted relation accumulates the same rows
    assert(rows(DedupIndex.needsRebuild(spark, dir)) === rows(crossings))
    // the crossing is REAL drift: the incremental pair graph still holds
    // the (1,2) pair a rebuild would drop (df 3 > cap 2)
    assert(DedupIndex.load(spark, dir).pairs.count() >
      { val fresh = tempDir(); DedupIndex.build(d12.unionByName(d3), fresh, dfCap = 2)
        DedupIndex.load(spark, fresh).pairs.count() })
    // the demanded rebuild restores exactness AND clears the flag
    val fresh2 = tempDir()
    DedupIndex.build(d12.unionByName(d3), fresh2, dfCap = 2)
    DedupIndex.build(d12.unionByName(d3), dir, dfCap = 2)
    assert(DedupIndex.needsRebuild(spark, dir).count() == 0)
    assert(rows(DedupIndex.load(spark, dir).pairs)
      === rows(DedupIndex.load(spark, fresh2).pairs))
    // and a cap-respecting update reports NO crossing (the q202 shape)
    val quiet = tempDir()
    DedupIndex.build(docs.filter(col("doc_id") <= 4), quiet)
    assert(DedupIndex.update(docs.filter(col("doc_id") > 4), quiet).count() == 0)
  }

  test("crash between relation appends: stranded wave invisible, replay converges") {
    val extra = Seq(
      (8L, "d", base2.replaceAll("datasets", "corpora")),
      (9L, "d", base2.replaceAll("datasets", "corpora").replaceAll("memory$", "ram")))
      .toDF("doc_id", "source", "text")
    val all = docs.unionByName(extra)
    val oldDocs = all.filter(col("doc_id").isin(0L, 2L, 4L, 5L, 7L))
    val newDocs = all.filter(!col("doc_id").isin(0L, 2L, 4L, 5L, 7L))
    val dir = tempDir(); val full = tempDir()
    DedupIndex.build(oldDocs, dir)
    val baseline = DedupIndex.load(spark, dir)
    val (basePairs, baseCounts, baseMeta, baseClusters) =
      (rows(baseline.pairs), rows(baseline.counts), rows(baseline.meta),
        rows(baseline.clusters))
    // simulate a crash BETWEEN relation appends: run the wave, then strip
    // its commit marker and one relation's data — shingles/pairs are
    // "written", counts is "unwritten", the marker never landed
    DedupIndex.update(newDocs, dir, waveId = Some("w1"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_waves/w1"), false))
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/counts/wave=w1"), true))
    // readers drop the incomplete wave: every growing relation reads as
    // the pre-update index — AND the derived clusters/meta too. The
    // swapped-in clusters carry the new wave's fingerprint while the
    // wave itself never committed, so load() detects the ahead-state
    // and serves clusters/meta recomputed from the committed pair
    // graph / roster (the r12 torn window, closed this round).
    val stranded = DedupIndex.load(spark, dir)
    assert(rows(stranded.pairs) === basePairs, "uncommitted pairs leaked")
    assert(rows(stranded.counts) === baseCounts, "uncommitted counts leaked")
    assert(rows(stranded.clusters) === baseClusters,
      "clusters served AHEAD of the visible pair graph")
    assert(rows(stranded.meta) === baseMeta,
      "meta served AHEAD of the visible roster")
    // replaying the SAME wave id drops the stranded files and redoes the
    // wave; the result equals a full rebuild, relation for relation
    DedupIndex.update(newDocs, dir, waveId = Some("w1"))
    DedupIndex.build(all, full)
    val (ii, fi) = (DedupIndex.load(spark, dir), DedupIndex.load(spark, full))
    assert(rows(ii.shingles) === rows(fi.shingles))
    assert(rows(ii.counts) === rows(fi.counts))
    assert(rows(ii.pairs) === rows(fi.pairs))
    assert(rows(ii.clusters) === rows(fi.clusters))
    assert(rows(ii.meta) === rows(fi.meta))
    // a replay of the COMMITTED wave is a no-op (meta n_docs stable)
    DedupIndex.update(newDocs, dir, waveId = Some("w1"))
    assert(rows(DedupIndex.load(spark, dir).meta) === rows(fi.meta),
      "replaying a committed wave must not drift meta")
    assert(rows(DedupIndex.load(spark, dir).pairs) === rows(fi.pairs))
    // the roster commits with the wave: all ten ids, exactly once
    assert(DedupIndex.roster(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      === (0L to 9L), "roster must hold each ingested id exactly once")
  }

  test("replay arriving right after a crashed compact restores before the fast path") {
    // ADVICE r12: the replayed-wave fast path used to read needs_rebuild
    // BEFORE restoreStranded, so a replay landing while the relation sat
    // at needs_rebuild.compact-old threw instead of healing
    val dir = tempDir()
    DedupIndex.build(docs, dir)
    DedupIndex.update(
      Seq((30L, "e", "wholly novel words unseen elsewhere in this corpus"))
        .toDF("doc_id", "source", "text"),
      dir, waveId = Some("w-r"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/needs_rebuild"),
      new org.apache.hadoop.fs.Path(s"$dir/needs_rebuild.compact-old")))
    // the replay must restore the stranded relation, then no-op
    val replay = DedupIndex.update(
      Seq((30L, "e", "wholly novel words unseen elsewhere in this corpus"))
        .toDF("doc_id", "source", "text"),
      dir, waveId = Some("w-r"))
    assert(replay.count() == 0, "accumulated crossings view must be empty here")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/needs_rebuild")),
      "stranded relation must be restored by the replay")
  }

  test("update on a corpus whose ids exceed 2^31 stays exact (hash keys, no id assumptions)") {
    val big = docs.withColumn("doc_id", col("doc_id") + lit(5000000000L))
    val full = tempDir(); val incr = tempDir()
    DedupIndex.build(big, full)
    DedupIndex.build(big.filter(col("doc_id") % 2 === 0), incr)
    DedupIndex.update(big.filter(col("doc_id") % 2 === 1), incr)
    assert(rows(DedupIndex.load(spark, incr).pairs)
      === rows(DedupIndex.load(spark, full).pairs))
    assert(rows(DedupIndex.load(spark, incr).clusters)
      === rows(DedupIndex.load(spark, full).clusters))
  }
}
