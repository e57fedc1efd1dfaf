package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFunctions}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the corpus, scored by the codegen'd [[graft.functions.CosineSimilarity]]
  * expression, then a bounded [[graft.functions.TopKAgg]] per query. The
  * corpus never shuffles: map-side partial aggregation reduces each input
  * partition to at most k rows per query before the (tiny) per-query merge.
  *
  * Scale path: IVF — corpus vectors are assigned once to their nearest
  * centroid (coarse quantizer); a query probes only the `nProbe` nearest
  * centroid buckets, cutting the scanned fraction to nProbe/nCentroids.
  * Centroid selection here is deterministic (first `nCentroids` corpus
  * vectors) so results are reproducible; on a real cluster you'd train
  * k-means centroids offline and broadcast them identically. Assignment is a
  * single argmin PROJECTION over a literal centroid array — zero joins, zero
  * shuffles over the corpus x centroid product.
  */
object Similarity {

  /** Literal `array<struct<cid,cv>>` of the deterministic centroids (first
    * `nCentroids` corpus vectors by id), collected once on the driver — a
    * bounded control-plane collect (nCentroids rows), the same contract as
    * the DPP partition lists. */
  private def centroidArray(corpus: DataFrame, nCentroids: Int,
                            idCol: String, vecCol: String): Column = {
    val rows = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol), col(vecCol)).collect()
    array(rows.map { r =>
      struct(lit(r.get(0)).as("cid"), typedLit(r.getSeq[Float](1)).as("cv"))
    }: _*)
  }

  /** `struct(-cosine, cid)` scored view of the centroid array: ascending
    * natural (lexicographic) struct order == cosine DESC, centroid id ASC. */
  private def scoredCentroids(cents: Column, vec: Column): Column =
    transform(cents, c => struct(
      negate(VectorFunctions.cosine(vec, c("cv"))).as("negcos"),
      c("cid").as("cid")))

  /** (query_id, struct(-cosine, neighbor_id)) rows -> the final
    * (query_id, neighbor_id, cosine, rank) top-k via the bounded aggregate. */
  private def topKMerge(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id").agg(TopKAgg.topK(col("s"), k).as("arr"))
      .select(col("query_id"), posexplode(col("arr")))
      .select(col("query_id"), col("col.nid").as("neighbor_id"),
        negate(col("col.negcos")).as("cosine"), (col("pos") + 1).as("rank"))

  /** Brute-force top-k: for each query vector, the k nearest corpus vectors
    * by cosine similarity. Ties broken by corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    TopKAgg.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .crossJoin(q)
      .select(col("query_id"), struct(
        negate(VectorFunctions.cosine(col("cv"), col("qv"))).as("negcos"),
        col("neighbor_id").as("nid")).as("s"))
    topKMerge(scored, k)
  }

  /** IVF assignment: nearest (deterministic) centroid per corpus vector.
    * Returns the corpus augmented with a `centroid_id` bucket column — at
    * scale you'd write the corpus back partitioned/bucketed by it. A pure
    * per-row argmin projection over the broadcast literal centroid array. */
  def ivfAssign(corpus: DataFrame, nCentroids: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cents = centroidArray(corpus, nCentroids, idCol, vecCol)
    corpus.withColumn("centroid_id",
      array_min(scoredCentroids(cents, col(vecCol))).getField("cid"))
  }

  /** IVF top-k: probe the `nProbe` nearest centroid buckets per query, then
    * brute-force inside the probed buckets only. Probe selection is a
    * sort+slice over the same literal centroid array (no query x centroid
    * join); the probed scan ends in the bounded top-k aggregate. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int, nProbe: Int,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    TopKAgg.register(corpus.sparkSession)
    val cents = centroidArray(corpus, nCentroids, corpusId, corpusVec)
    val assigned = corpus.withColumn("centroid_id",
      array_min(scoredCentroids(cents, col(corpusVec))).getField("cid"))

    val probes = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("centroid_id", explode(transform(
        slice(array_sort(scoredCentroids(cents, col("qv"))), 1, nProbe),
        p => p("cid"))))

    val scored = broadcast(probes).join(assigned, "centroid_id")
      .select(col("query_id"), struct(
        negate(VectorFunctions.cosine(col(corpusVec), col("qv"))).as("negcos"),
        col(corpusId).as("nid")).as("s"))
    topKMerge(scored, k)
  }
}
