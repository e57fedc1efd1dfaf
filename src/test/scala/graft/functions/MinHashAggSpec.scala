package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate signature equals elementwise min of per-row mixes") {
    MinHashAgg.register(spark)
    val hashes = Seq(5L, 1000L, 99999L, 42L)
    val df = hashes.toDF("h").withColumn("g", lit("a"))
    val sig = df.groupBy("g").agg(MinHashAgg.minhashAgg(col("h"), 4).as("sig"))
      .select("sig").as[Seq[Long]].collect().head
    val expected = Hashes.mixConstants(4).map { case (a, b) =>
      hashes.map(h => (a * h + b) % Hashes.MixP).min
    }
    assert(sig == expected)
  }

  test("empty/null inputs yield the MixP sentinel; SQL surface works") {
    MinHashAgg.register(spark)
    val df = Seq((Some(7L), "a"), (None, "a"), (None, "b")).toDF("h", "g")
    df.createOrReplaceTempView("mh_in")
    val out = spark.sql(
      "SELECT g, graft_minhash_agg(h, 2) AS sig FROM mh_in GROUP BY g ORDER BY g")
      .as[(String, Seq[Long])].collect().toMap
    assert(out("b") == Seq(Hashes.MixP, Hashes.MixP)) // all-null group
    val (a0, b0) = Hashes.mixConstants(2).head
    assert(out("a").head == (a0 * 7L + b0) % Hashes.MixP)
  }

  test("partial aggregation: signature is invariant to partitioning") {
    MinHashAgg.register(spark)
    val df = (1L to 1000L).toDF("h").withColumn("g", (col("h") % 3).cast("string"))
    val one = df.coalesce(1).groupBy("g").agg(MinHashAgg.minhashAgg(col("h"), 8).as("s"))
    val many = df.repartition(13).groupBy("g").agg(MinHashAgg.minhashAgg(col("h"), 8).as("s"))
    assert(rowsOf(one) == rowsOf(many))
  }

  test("the plan uses HashAggregate with partial aggregation") {
    MinHashAgg.register(spark)
    val df = (1L to 100L).toDF("h").withColumn("g", (col("h") % 3).cast("string"))
    val plan = df.groupBy("g").agg(MinHashAgg.minhashAgg(col("h"), 4).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_minhash_agg") || plan.contains("partial_"), plan)
  }
}
