package graft

import org.apache.spark.sql.SparkSession
import graft.operators.DedupIndex

/** Dev tool for the SCALING.md composability A/B: time one index BUILD
  * plus every index face at a scale factor, on the bench configuration.
  * `sbt "Test/runMain graft.DedupIndexTiming /root/testdata/sf0.1"` */
object DedupIndexTiming {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // JVM/session warm-up so the build isn't charged for codegen warmup
    Tables.documents(spark, sfDir).count()
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-timing").toString
    time("build")(DedupIndex.build(Tables.documents(spark, sfDir), dir))
    val idx = DedupIndex.load(spark, dir)
    time("clusters")(DedupIndex.clustersAgainst(idx).write.format("noop").mode("overwrite").save())
    time("histogram")(DedupIndex.histogramAgainst(idx).write.format("noop").mode("overwrite").save())
    time("sweep")(DedupIndex.sweepAgainst(idx).write.format("noop").mode("overwrite").save())
    time("explanation")(DedupIndex.explanationAgainst(idx).write.format("noop").mode("overwrite").save())
    time("leakage")(DedupIndex.leakageAgainst(idx).write.format("noop").mode("overwrite").save())
    time("contrastive")(DedupIndex.contrastiveAgainst(idx).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
