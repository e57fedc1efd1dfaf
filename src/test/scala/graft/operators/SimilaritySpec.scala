package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(0.1f, 0.0f, 0.9f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK returns k nearest by cosine, rank 1 = self") {
    graft.functions.VectorFunctions.register(spark)
    val queries = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding")
    val out = Similarity.bruteForceTopK(corpus, queries, 3)
      .collect().map(r => (r.getInt(3), r.getLong(1))).toMap
    assert(out(1) == 0L) // self is nearest
    assert(out(2) == 1L) // then the 0.9/0.1 vector
  }

  test("ivfTopK with full probe matches brute force") {
    graft.functions.VectorFunctions.register(spark)
    val queries = corpus.filter($"vec_id" < 2L)
      .select($"vec_id".as("query_id"), $"embedding")
    val bf = Similarity.bruteForceTopK(corpus, queries, 2)
      .select("query_id", "neighbor_id", "rank")
    val ivf = Similarity.ivfTopK(corpus, queries, 2, nCentroids = 6, nProbe = 6)
      .select("query_id", "neighbor_id", "rank")
    assert(rowsOf(bf) == rowsOf(ivf))
  }

  test("ivfAssign buckets every corpus vector to exactly one centroid") {
    graft.functions.VectorFunctions.register(spark)
    val assigned = Similarity.ivfAssign(corpus, nCentroids = 2)
    assert(assigned.count() == 6)
    assert(assigned.select("centroid_id").distinct().count() <= 2)
  }
}
