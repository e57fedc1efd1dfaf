package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal
    (2L, Array(1.0f, 2.0f), Array(2.0f, 4.0f)),   // parallel
    (3L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)),   // zero norm
    (4L, Array(1.0f, 1.0f), Array(1.0f, -1.0f))
  ).toDF("id", "a", "b")

  test("cosine similarity: orthogonal=0, parallel=1, zero-norm=0") {
    VectorFunctions.register(spark)
    val m = pairs.select($"id", VectorFunctions.cosine($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) == 0.0)
    assert(math.abs(m(2L) - 1.0) < 1e-12)
    assert(m(3L) == 0.0)
    assert(m(4L) == 0.0)
  }

  test("dot product matches manual computation; callable from SQL") {
    VectorFunctions.register(spark)
    val m = pairs.select($"id", VectorFunctions.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) == 0.0 && m(2L) == 10.0 && m(4L) == 0.0)
    pairs.createOrReplaceTempView("vec_pairs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) FROM vec_pairs WHERE id = 2")
      .as[Double].collect().head
    assert(math.abs(viaSql - 1.0) < 1e-12)
  }

  test("interpreted eval agrees with codegen") {
    // force interpreted path by evaluating the expression directly
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    VectorFunctions.register(spark)
    val codegen = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).as[Double].collect().head
    assert(interpreted == codegen)
  }
}
