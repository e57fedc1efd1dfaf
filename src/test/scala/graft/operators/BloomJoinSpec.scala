package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin returns exactly the plain semi join's rows") {
    val large = (1L to 10000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 9999L, 12345L).toDF("sk") // 12345 matches nothing
    val out = BloomJoin.bloomSemiJoin(large, small, "k", "sk",
      expectedItems = 1000L)
    val plain = large.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
    assert(rowsOf(out) == rowsOf(plain))
    assert(out.count() == 3)
  }

  test("bloomSemiJoin plan carries the codegen'd might_contain prefilter") {
    // parquet-backed large side: over a LocalRelation the optimizer folds
    // the filter away at plan time (ConvertToLocalRelation), which hides
    // the thing this test pins — the prefilter sitting ON the scan
    val large = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val small = Seq(1L, 2L, 3L).toDF("sk")
    val out = BloomJoin.bloomSemiJoin(large, small, "l_orderkey", "sk",
      expectedItems = 100L)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("bloomSemiJoin has no false negatives at a coarse fpp") {
    // tiny filter, high fpp: false POSITIVES may pass the prefilter, but the
    // exact semi join must still return precisely the matching keys
    val large = (1L to 50000L).toDF("k")
    val keys = (1L to 200L).map(_ * 250L)
    val small = keys.toDF("sk")
    val out = BloomJoin.bloomSemiJoin(large, small, "k", "sk",
      expectedItems = 50L, fpp = 0.2)
    assert(out.as[Long].collect().toSet == keys.toSet)
  }
}
