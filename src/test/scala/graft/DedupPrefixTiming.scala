package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool for the q51-vs-q78 crossover measurement (VERDICT r10 #4):
  * A/B the full inverted index (q51) against the PPJoin prefix filter in
  * both orders (q78 "hash" / "df") on (a) the natural sf0.1 corpus and
  * (b) a BOILERPLATE-HEAVY variant — the same corpus with a fixed
  * ~35-word footer appended to 60% of docs, the regime the prefix
  * filter's ~1/(1+t) claim targets (hot shingles co-occur everywhere
  * while pair similarity stays low).
  * `sbt "Test/runMain graft.DedupPrefixTiming /root/testdata/sf0.1"` */
object DedupPrefixTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val boilerplate = "this page is part of our archive please see the terms " +
      "of service and the privacy policy for details about cookies tracking " +
      "and advertising choices all rights reserved contact the webmaster for " +
      "reprint permission thank you for visiting"
    val natural = Tables.documents(spark, sfDir)
    val boilered = natural.withColumn("text",
      when(col("doc_id") % 10 < 6, concat(col("text"), lit(" " + boilerplate)))
        .otherwise(col("text")))

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def time(label: String)(df: => DataFrame): Unit = {
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Barriers.withBarrierScope(spark) {
          df.write.mode("overwrite").format("noop").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $label ${median(samples)}%.3f s  (runs ${samples.map(v => f"$v%.2f").mkString(",")})")
    }
    // session warm-up
    natural.count(); boilered.count()

    Seq(("natural", natural), ("boilerplate60", boilered)).foreach { case (tag, d) =>
      // exactness first: all three faces must agree on this corpus
      val counts = Seq(
        Dedup.exactJaccardPairs(d, 0.6).count(),
        Dedup.prefixJaccardPairs(d, 0.6, "hash").count(),
        Dedup.prefixJaccardPairs(d, 0.6, "df").count())
      require(counts.distinct.size == 1, s"$tag faces disagree: $counts")
      println(s"CHECK $tag pairs=${counts.head}")
      println(s"INDEX $tag full=${Dedup.fullIndexSize(d)} " +
        s"prefix_hash=${Dedup.prefixIndexSize(d, 0.6, "hash")} " +
        s"prefix_df=${Dedup.prefixIndexSize(d, 0.6, "df")}")
      time(s"$tag q51_full_index")(Dedup.exactJaccardPairs(d, 0.6))
      time(s"$tag q78_prefix_hash")(Dedup.prefixJaccardPairs(d, 0.6, "hash"))
      time(s"$tag q78_prefix_df")(Dedup.prefixJaccardPairs(d, 0.6, "df"))
    }
    spark.stop()
  }
}
