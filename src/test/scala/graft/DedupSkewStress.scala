package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool for the banded-join skew stress (VERDICT r10 #5): a
  * Zipf-hot corpus — 30% of sf0.1 docs become near-copies of ONE
  * template (the template's words dominate each doc's shingle set, so
  * their MinHash/SimHash sketches collide into one giant (band, key)
  * bucket and the template shingles become corpus-hot keys) — driven
  * through q51/q78/q52/q53 with recorded bucket-size distributions,
  * spill, wall time, and the bucket cap's recall effect (pairs found
  * with the cap engaged vs disengaged).
  * `sbt "Test/runMain graft.DedupSkewStress /root/testdata/sf0.1"` */
object DedupSkewStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // spill accounting across the whole run (expect ZERO)
    val spill = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) spill.addAndGet(m.diskBytesSpilled)
      }
    })

    val template = "breaking news update from the wire service all markets " +
      "regions desks reporting live coverage continues after these messages " +
      "subscribe today for full access to premium content and analysis"
    val docs = Tables.documents(spark, sfDir).withColumn("text",
      when(col("doc_id") % 10 < 3,
        concat(lit(template), lit(" "), substring(col("text"), 1, 60)))
        .otherwise(col("text")))
    docs.count() // warm-up

    // skew shape first: hot-shingle df head, max banded buckets
    val dfTop = Dedup.shingleDfTop(docs, 5).collect()
      .map(r => r.getLong(1)).toSeq
    println(s"SKEW shingle_df_top5=${dfTop.mkString(",")}")
    val mhMax = Dedup.minhashBucketSizes(docs, 16, 4)
      .agg(max("n"), count(lit(1))).collect().head
    println(s"SKEW minhash_max_bucket=${mhMax.getLong(0)} n_buckets=${mhMax.getLong(1)}")
    val shMax = Dedup.simhashBucketSizes(docs, 6)
      .agg(max("n"), count(lit(1))).collect().head
    println(s"SKEW simhash_max_bucket=${shMax.getLong(0)} n_buckets=${shMax.getLong(1)}")

    def run(label: String)(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = Barriers.withBarrierScope(spark) { df.count() }
      println(f"RUN $label ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n")
      n
    }
    run("q51_exact")(Dedup.exactJaccardPairs(docs, 0.6))
    run("q78_prefix_df")(Dedup.prefixJaccardPairs(docs, 0.6, "df"))
    val mhCapped = run("q52_minhash_cap_default")(Dedup.minhashLshPairs(docs, 16, 4))
    val mhTight = run("q52_minhash_cap_500")(
      Dedup.minhashLshPairs(docs, 16, 4, maxBucketSize = 500))
    val mhOff = run("q52_minhash_cap_off")(
      Dedup.minhashLshPairs(docs, 16, 4, maxBucketSize = Int.MaxValue))
    val shCapped = run("q53_simhash_cap_default")(Dedup.simhashPairs(docs, 6))
    val shTight = run("q53_simhash_cap_500")(
      Dedup.simhashPairs(docs, 6, maxBucketSize = 500))
    val shOff = run("q53_simhash_cap_off")(
      Dedup.simhashPairs(docs, 6, maxBucketSize = Int.MaxValue))
    println(s"RECALL minhash capped=$mhCapped tight=$mhTight uncapped=$mhOff")
    println(s"RECALL simhash capped=$shCapped tight=$shTight uncapped=$shOff")
    println(s"SPILL total_disk_bytes=${spill.get()}")
    spark.stop()
  }
}
