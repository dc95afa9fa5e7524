package graft

import org.apache.spark.sql.SparkSession

/** TEMP: x205 at 100x with the nClusters ~ sqrt(n) production dial vs
  * the declared fixed grid — isolates whether the 3 GB spill is config
  * (candidate volume = n * nProbe/nClusters * m) or engine. */
object DiagX205 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/tmp/scale100")
    def run(label: String, nClusters: Int, nProbe: Int): Unit = {
      val cost = new java.util.concurrent.atomic.AtomicLong(0)
      val peak = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            cost.addAndGet(m.diskBytesSpilled)
            peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          }
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      graft.operators.Similarity.ivfPqTopK(emb, nQueries = 50, k = 5,
          nClusters = nClusters, nProbe = nProbe, m = 8, ks = 32, refine = 16)
        .orderBy("qid", "rank")
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      println(f"[diag] $label: $secs%.1f s spill=${cost.get / 1e6}%.0f MB peak=${peak.get / 1e6}%.0f MB")
    }
    run("warm (declared grid 32/16)", 32, 16)
    run("declared grid nClusters=32 nProbe=16", 32, 16)
    // sqrt(200k) ~ 448: the FAISS nlist rule; keep the same probe RATIO
    run("production dial nClusters=448 nProbe=16", 448, 16)
    spark.stop()
  }
}
