package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the corpus, scored by the codegen'd [[graft.functions.CosineSimilarity]]
  * expression, then a per-query top-k window. The corpus side never shuffles
  * until the final (tiny) top-k aggregation, so this scans 100 TB at parquet
  * speed.
  *
  * Scale path: IVF — corpus vectors are assigned once to their nearest
  * centroid (coarse quantizer); a query probes only the `nProbe` nearest
  * centroid buckets, cutting the scanned fraction to nProbe/nCentroids.
  * Centroid selection here is deterministic (first `nCentroids` corpus
  * vectors) so results are reproducible; on a real cluster you'd train
  * k-means centroids offline and broadcast them identically.
  */
object Similarity {

  /** Brute-force top-k: for each query vector, the k nearest corpus vectors
    * by cosine similarity. Ties broken by corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .crossJoin(q)
      .withColumn("cosine", VectorFunctions.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF assignment: nearest (deterministic) centroid per corpus vector.
    * Returns the corpus augmented with a `centroid_id` bucket column — at
    * scale you'd write the corpus back partitioned/bucketed by it. */
  def ivfAssign(corpus: DataFrame, nCentroids: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val centroids = broadcast(
      corpus.orderBy(col(idCol)).limit(nCentroids)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec")))
    val w = Window.partitionBy(col(idCol)).orderBy(
      VectorFunctions.cosine(col(vecCol), col("centroid_vec")).desc,
      col("centroid_id").asc)
    corpus.crossJoin(centroids)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .drop("__r", "centroid_vec")
  }

  /** IVF top-k: probe the `nProbe` nearest centroid buckets per query, then
    * brute-force inside the probed buckets only. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int, nProbe: Int,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val assigned = ivfAssign(corpus, nCentroids, corpusId, corpusVec)
    val centroids = broadcast(
      corpus.orderBy(col(corpusId)).limit(nCentroids)
        .select(col(corpusId).as("centroid_id"), col(corpusVec).as("centroid_vec")))

    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(
      VectorFunctions.cosine(col("qv"), col("centroid_vec")).desc,
      col("centroid_id").asc)
    val probes = q.crossJoin(centroids)
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))

    val scored = broadcast(probes)
      .join(assigned, "centroid_id")
      .withColumn("cosine", VectorFunctions.cosine(col(corpusVec), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(corpusId).as("neighbor_id"), col("cosine"), col("rank"))
  }
}
