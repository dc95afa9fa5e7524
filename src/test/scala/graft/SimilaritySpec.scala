package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // Planted vectors: 0 and 1 nearly parallel, 2 orthogonal to both,
  // 3 anti-parallel to 0, 4 a noisy copy of 2.
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.05f, 0.98f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks the parallel vector first") {
    val topk = Similarity.cosineTopK(vecs, col("vec_id") === 0, k = 4)
      .select("nid", "rank", "cos_sim").as[(Long, Long, Double)].collect()
      .sortBy(_._2)
    assert(topk.head._1 == 1L, "nearest neighbor of v0 is v1")
    assert(topk.head._3 > 0.99)
    assert(topk.last._1 == 3L, "anti-parallel ranks last")
    assert(topk.last._3 == -1.0)
  }

  test("cosine of orthogonal vectors is 0") {
    val cos = Similarity.cosineTopK(vecs, col("vec_id") === 2, k = 4)
      .filter(col("nid") === 0).select("cos_sim").as[Double].head()
    assert(cos == 0.0)
  }

  test("ANN LSH results are a subset of true cosine ranking with exact scores") {
    val ann = Similarity.annLshTopK(Tables.embeddings(spark, sf001),
        nQueries = 50, k = 5, planesPerBand = 4, bands = 4)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect()
    // every ANN similarity must equal the exactly-computed similarity
    val full = Similarity.cosineTopK(Tables.embeddings(spark, sf001),
        col("vec_id") < 50, k = Int.MaxValue)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ann.foreach { case (q, n, c) =>
      assert(full.get((q, n)).contains(c), s"ANN pair ($q,$n) score mismatch")
    }
    // recall of the exact top-1 should beat random bucketing by a wide margin
    val exactTop1 = Similarity.cosineTopK(Tables.embeddings(spark, sf001),
        col("vec_id") < 50, k = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val annPairs = ann.map(r => (r._1, r._2)).toSet
    val recall = exactTop1.count { case (q, n) => annPairs.contains((q, n)) }.toDouble /
      exactTop1.size
    assert(recall >= 0.25, s"ANN top-1 recall $recall below 0.25")
  }
}
