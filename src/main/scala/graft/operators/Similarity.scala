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

    // ---- IVF top-k with a k-means coarse quantizer (rows-only — the
    //      quantizer is engine-specific; SimilaritySpec measures recall
    //      and candidate reduction vs brute force) ----
    "q65_ivf_topk" -> QueryDef.rowsOnly { (s, dir) =>
      ivfTopK(Tables.embeddings(s, dir), nQueries = 50, k = 5,
        nClusters = 8, nProbe = 3)
        .orderBy("qid", "rank")
    },

    // ---- int8-quantized brute-force top-k (rows-only — quantization
    //      noise is engine/format-specific; SimilaritySpec measures top-k
    //      overlap against the exact float path) ----
    "q66_quantized_topk" -> QueryDef.rowsOnly { (s, dir) =>
      cosineTopK(
        dequantizeInt8(quantizeInt8(Tables.embeddings(s, dir))),
        col("vec_id") < 50, k = 5)
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

  /** Int8 scalar quantization of the embedding column: per-vector
    * symmetric scale (max|x| / 127), elements stored as TINYINT. At 100 TB
    * this cuts the similarity scan's bytes ~4× (float32 → int8 + one
    * float scale per vector); dequantized cosine stays within ~1% of exact
    * for unit-scale embeddings (SimilaritySpec measures the top-k overlap).
    * Output: (vec_id, qemb array<tinyint>, scale double). */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("scale",
        expr("aggregate(emb, 0D, (acc, x) -> greatest(acc, abs(x))) / 127.0"))
      .select(col("vec_id"),
        expr("transform(emb, x -> CAST(round(x / scale) AS TINYINT))").as("qemb"),
        col("scale"))

  /** Reverse of [[quantizeInt8]]: (vec_id, embedding array<double>). */
  def dequantizeInt8(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      expr("transform(qemb, q -> CAST(q AS DOUBLE) * scale)").as("embedding"))

  /** K-means centroids over the (normalized) embedding column, computed
    * DataFrame-iteratively: deterministic seeds (lowest vec_ids), then
    * `iters` rounds of assign-to-nearest (broadcast centroids) and
    * element-wise mean recompute (posexplode → avg → re-assemble).
    *
    * Scale notes: each iteration is one narrow pass over the corpus plus a
    * groupBy(cluster, dim) shuffle of k×dim cells — independent of corpus
    * size after the partial aggregation. Seeds/means are deterministic, so
    * re-runs converge identically. */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = withNorm(embeddings)
      .select(col("vec_id"),
        expr("transform(emb, x -> x / norm)").as("emb")) // unit vectors
      .cache()
    var centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cluster_id"), col("emb").as("cemb"))
      .cache()
    (1 to iters).foreach { _ =>
      val assigned = assignClusters(e, centroids)
      val next = assigned
        .select(col("cluster_id"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy("cluster_id", "dim")
        .agg(avg(col("v")).as("v"))
        .groupBy("cluster_id")
        .agg(expr("transform(array_sort(collect_list(struct(dim, v))), s -> s.v)")
          .as("cemb"))
        .cache()
      centroids.unpersist()
      centroids = next
    }
    centroids
  }

  /** Nearest-centroid assignment: (vec_id, emb, cluster_id, cos_to_centroid). */
  private def assignClusters(unitVecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cluster_id"))
    unitVecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("emb"), col("cluster_id"),
        dot("emb", "cemb").as("c_cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** IVF approximate top-k: corpus vectors index into their nearest
    * centroid's posting list; a query probes only its `nProbe` nearest
    * centroids' lists and exact-ranks those candidates. Pair volume drops
    * from queries × corpus to queries × (corpus × nProbe / k) on balanced
    * clusters — the standard recall/cost dial. */
  def ivfTopK(embeddings: DataFrame, nQueries: Int, k: Int,
              nClusters: Int, nProbe: Int, kmeansIters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(embeddings, nClusters, kmeansIters)
    val e = withNorm(embeddings).cache()
    val unit = e.select(col("vec_id"), expr("transform(emb, x -> x / norm)").as("emb"))
    val posting = assignClusters(unit, centroids)
      .select(col("vec_id").as("nid"), col("cluster_id"))
    val probes = unit.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(centroids))
      .select(col("vec_id").as("qid"), col("cluster_id"),
        dot("emb", "cemb").as("c_cos"))
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("c_cos").desc, col("cluster_id"))))
      .filter(col("rn") <= nProbe)
      .select("qid", "cluster_id")
    val qSide = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("norm").as("qnorm"))
    val cand = probes.join(posting, "cluster_id")
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
      .join(broadcast(qSide), "qid")
      .join(e.select(col("vec_id").as("nid"), col("emb"), col("norm")), "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    cand
      .select(col("qid"), col("nid"),
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
