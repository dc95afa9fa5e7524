package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: exact brute-force cosine top-k — query set broadcast against
  * the corpus scan, similarity via the native codegen'd
  * [[graft.functions.DotProduct]] expression (no UDF, no lambda
  * allocation). At 100 TB the corpus side streams partition-local
  * with zero shuffle (the only shuffle is the final per-query top-k, which
  * is bounded by queries × k after a partial top-k inside each partition).
  *
  * Scale path: random-hyperplane LSH — each vector reduces to a small
  * bucket signature; candidates come from an equi-join on (band, key), so
  * pair volume is O(corpus × bands) instead of O(queries × corpus).
  */
object Similarity {

  /** embedding as array<double> plus its L2 norm. Uses the native
    * codegen'd [[graft.functions.DotProduct]] expression — the
    * aggregate/zip_with lambda form was 30× slower on the all-pairs query
    * (intermediate array per row, per-element lambda dispatch). */
  private def withNorm(df: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("norm", sqrt(expr("graft_dot(emb, emb)")))
  }

  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  def defs: Map[String, QueryDef] = Map(

    // ---- exact brute-force cosine top-k (rank on the rounded similarity
    //      with vec_id tie-break so both engines rank identically) ----
    "q54_cosine_topk" -> QueryDef.sql(
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
        |p AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS nid,
        |    round(sum(CAST(q.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE))
        |      / (sqrt(sum(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)))
        |         * sqrt(sum(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM q, embeddings e, (SELECT unnest(range(1, 4097)) AS i) i
        |  WHERE e.vec_id != q.vec_id AND i.i <= len(e.embedding)
        |  GROUP BY q.vec_id, e.vec_id),
        |r AS (SELECT qid, nid, cos_sim,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
        |      FROM p)
        |SELECT qid, nid, cos_sim, rank FROM r WHERE rank <= 5
        |ORDER BY qid, rank""") { (s, dir) =>
      cosineTopK(Tables.embeddings(s, dir), col("vec_id") < 50, k = 5)
        .orderBy("qid", "rank")
    },

    // ---- exact cosine threshold pairs (embedding near-dup detection) ----
    "q55_cosine_threshold_pairs" -> QueryDef.sql(
      """WITH p AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2,
        |    round(sum(CAST(a.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE))
        |      / (sqrt(sum(CAST(a.embedding[i.i] AS DOUBLE) * CAST(a.embedding[i.i] AS DOUBLE)))
        |         * sqrt(sum(CAST(b.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM embeddings a, embeddings b, (SELECT unnest(range(1, 4097)) AS i) i
        |  WHERE a.vec_id < b.vec_id AND i.i <= len(a.embedding)
        |  GROUP BY a.vec_id, b.vec_id)
        |SELECT v1, v2, cos_sim FROM p WHERE cos_sim >= 0.4
        |ORDER BY v1, v2""") { (s, dir) =>
      val e = withNorm(Tables.embeddings(s, dir))
      val a = e.select(col("vec_id").as("v1"), col("emb").as("emb1"), col("norm").as("norm1"))
      val b = e.select(col("vec_id").as("v2"), col("emb").as("emb2"), col("norm").as("norm2"))
      a.join(b, col("v1") < col("v2"))
        .select(col("v1"), col("v2"),
          round(dot("emb1", "emb2") / (col("norm1") * col("norm2")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.4)
        .orderBy("v1", "v2")
    },

    // ---- LSH-bucketed approximate top-k (the 100 TB path; no SQL oracle —
    //      SimilaritySpec measures recall against q54's exact result) ----
    "q56_ann_lsh_topk" -> QueryDef.rowsOnly { (s, dir) =>
      annLshTopK(Tables.embeddings(s, dir), nQueries = 50, k = 5,
        planesPerBand = 4, bands = 4)
        .orderBy("qid", "rank")
    },

    // ---- per-label centroids (the IVF coarse-quantizer building block):
    //      element-wise vector mean via posexplode + decimal-exact sums ----
    "q57_label_centroids" -> QueryDef.sql(
      """SELECT label, i - 1 AS dim,
        |  round(CAST(sum(CAST(embedding[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS centroid
        |FROM embeddings, (SELECT unnest(range(1, 4097)) AS i) t
        |WHERE i <= len(embedding)
        |GROUP BY label, i
        |ORDER BY label, dim""") { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("dim", col("dim").cast("long"))
        .groupBy("label", "dim")
        .agg(round((sum(col("v").cast("decimal(28,12)")).cast("double") / count(lit(1))), 6)
          .as("centroid"))
        .orderBy("label", "dim")
    }
  )

  /** Exact brute-force cosine top-k: rows of `embeddings` matching
    * `isQuery` are ranked against the whole corpus. The query side is
    * broadcast; the corpus side streams through its scan partitions and the
    * per-query top-k is the only shuffle. */
  def cosineTopK(embeddings: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("norm").as("qnorm"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    broadcast(q).join(e, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot("qemb", "emb") / (col("qnorm") * col("norm")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH: plane (band, p) component i has a deterministic
    * pseudo-random ±1 sign from xxhash64. A vector's key in a band is the
    * planesPerBand-bit sign pattern; candidates for a query are corpus
    * vectors sharing (band, key); exact cosine then ranks candidates.
    */
  def annLshTopK(embeddings: DataFrame, nQueries: Int, k: Int,
                 planesPerBand: Int, bands: Int): DataFrame = {
    val e = withNorm(embeddings)
    // band keys: for each band, an integer of planesPerBand sign bits
    val bandKeys = (0 until bands).map { band =>
      val bits = (0 until planesPerBand).map { p =>
        val planeId = band * planesPerBand + p
        val signDot = expr(
          s"""aggregate(
             |  transform(sequence(0, size(emb) - 1),
             |    i -> emb[i] * CAST((CAST(xxhash64($planeId, i) & 1 AS INT) * 2 - 1) AS DOUBLE)),
             |  0D, (acc, x) -> acc + x)""".stripMargin)
        when(signDot > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(band).as("band"), bits.as("key"))
    }
    val keyed = e.withColumn("bk", explode(array(bandKeys: _*)))
      .select(col("vec_id"), col("emb"), col("norm"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // candidates: same (band, key), deduped across bands
    val cand = broadcast(
      keyed.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"),
          col("norm").as("qnorm"), col("band"), col("key")))
      .join(keyed, Seq("band", "key"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("qemb"), col("qnorm"),
        col("vec_id").as("nid"), col("emb"), col("norm"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    cand
      .select(col("qid"), col("nid"),
        round(dot("qemb", "emb") / (col("qnorm") * col("norm")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
