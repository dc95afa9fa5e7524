package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN tuning sweep: top-1/top-k recall of the multi-probe LSH and IVF
  * paths against the exact cosine top-k, across their knobs — the
  * committed recall/cost table in SCALING.md comes from this.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnSweep"
  *
  * Prints one JSON line per configuration: recall@1, recall@k, and the
  * candidate volume (the cost proxy — candidates ≈ scan+rescore work).
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir)
    val (nQueries, k) = (50, 5)
    val exact = operators.Similarity.cosineTopK(emb, col("vec_id") < nQueries, k)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
    val exactTop1 = exact.filter(_._3 == 1L).map(r => r._1 -> r._2).toMap
    val exactTopK = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def report(tag: String, got: Seq[(Long, Long, Long)]): Unit = {
      val gotTop1 = got.filter(_._3 == 1L).map(r => r._1 -> r._2).toMap
      val r1 = exactTop1.count { case (q, n) => gotTop1.get(q).contains(n) }.toDouble / exactTop1.size
      val rk = exactTopK.map { case (q, ns) =>
        got.filter(_._1 == q).map(_._2).count(ns.contains).toDouble / ns.size
      }.sum / exactTopK.size
      println(f"""{"config":"$tag","recall_at_1":$r1%.3f,"recall_at_k":$rk%.3f,"rows":${got.size}}""")
    }

    for (probes <- Seq(0, 1, 2, 3); bands <- Seq(8, 16)) {
      val got = operators.Similarity.annLshTopK(emb, nQueries, k,
          planesPerBand = 6, bands = bands, probes = probes)
        .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
      report(s"lsh planes=6 bands=$bands probes=$probes", got.toSeq)
    }
    for (nProbe <- Seq(1, 2, 3, 4)) {
      val got = operators.Similarity.ivfTopK(emb, nQueries, k,
          nClusters = 8, nProbe = nProbe, kmeansIters = 3)
        .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
      report(s"ivf k=8 nProbe=$nProbe", got.toSeq)
    }
    spark.stop()
  }
}
