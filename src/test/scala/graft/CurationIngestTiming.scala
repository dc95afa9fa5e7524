package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Dev tool for the SCALING.md q223 streaming-twin decade (r13 NEXT gap
  * 3): drive `curationIngestSinkQuery` — the REAL sink, not a replica —
  * over K micro-batches of a documents corpus and print each batch's
  * wall seconds, so the per-batch cost curve vs accumulated store size
  * is a measured series. The scale dial is the signature store: every
  * batch's incremental pair join probes the ENTIRE accumulated store
  * (banded equi-join, linear in store size), so per-batch cost should
  * grow ~linearly in ingested volume and the TOTAL quadratically in
  * batch count at fixed batch size — the measurement names the point
  * where store bucketing/compaction becomes mandatory at crawl scale.
  *
  * `sbt "Test/runMain graft.CurationIngestTiming <docsDir> <batches>"`
  */
object CurationIngestTiming {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = Tables.documents(spark, docsDir)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    println(s"TIMING corpus ${corpus.length} docs, $nBatches batches")
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-timing").toString
    val (docsStore, sigDir, pairsDir) =
      (s"$root/docs", s"$root/sigs", s"$root/pairs")
    val input = MemoryStream[(Long, String, String)](spark)
    val q = Streams.curationIngestSinkQuery(
      input.toDF().toDF("doc_id", "text", "source"),
      docsStore, sigDir, pairsDir).start()
    try {
      // JVM/codegen warm-up outside the measured series
      corpus.take(1).foreach(_ => Tables.documents(spark, docsDir).count())
      var k = 0
      while (k < nBatches) {
        val slice = corpus.filter(_._1 % nBatches == k).toSeq
        val t0 = System.nanoTime()
        input.addData(slice)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val stored = spark.read.parquet(sigDir).count()
        println(f"TIMING batch $k%2d docs=${slice.size}%6d " +
          f"store_after=$stored%8d wall=$dt%.3f s")
        k += 1
      }
      val pairs = spark.read.parquet(pairsDir).count()
      println(s"TIMING pair_log $pairs rows")
    } finally q.stop()
    spark.stop()
  }
}
