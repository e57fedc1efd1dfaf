package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the k smallest elements, sorted, across partitions") {
    TopKAgg.register(spark)
    val df = spark.range(0, 1000).repartition(7)
      .select(lit("g").as("g"), col("id"))
    val out = df.groupBy("g").agg(TopKAgg.topK(col("id"), 5).as("arr"))
      .select(col("arr")).as[Seq[Long]].head()
    assert(out == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("topK with fewer rows than k returns them all; nulls are skipped") {
    TopKAgg.register(spark)
    val df = Seq(Some(3L), None, Some(1L)).toDF("v").withColumn("g", lit(1))
    val out = df.groupBy("g").agg(TopKAgg.topK(col("v"), 10).as("arr"))
      .select("arr").as[Seq[Long]].head()
    assert(out == Seq(1L, 3L))
  }

  test("topK matches sorted-take under fuzz across random partitionings") {
    // random multisets (duplicates deliberate), random k, random
    // partition counts: the partial/merge/final paths of the custom
    // aggregate must always reproduce sorted.take(k) — the exact
    // contract every heavy-hitter/topN consumer leans on
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    TopKAgg.register(spark)
    val genCase = for {
      n <- Gen.choose(0, 200)
      vals <- Gen.listOfN(n, Gen.choose(-50L, 50L))
      k <- Gen.choose(1, 12)
      parts <- Gen.choose(1, 9)
    } yield (vals, k, parts)
    val prop = Prop.forAll(genCase) { case (vals, k, parts) =>
      val df = (vals.map(Option(_)) :+ None) // a null rides along, skipped
        .toDF("v").withColumn("g", lit(1)).repartition(parts)
      val got = df.groupBy("g").agg(TopKAgg.topK(col("v"), k).as("arr"))
        .select("arr").as[Seq[Long]].head()
      val want = vals.sorted.take(k)
      if (got != want) println(s"vals=$vals k=$k parts=$parts got=$got")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("topK over structs orders lexicographically (negcos desc-cosine trick)") {
    TopKAgg.register(spark)
    val df = Seq((0.9, "b"), (0.9, "a"), (0.1, "c"), (0.5, "d"))
      .toDF("cos", "id").withColumn("g", lit(1)).repartition(3)
    val out = df.groupBy("g")
      .agg(TopKAgg.topK(struct(negate(col("cos")).as("negcos"), col("id")), 3).as("arr"))
      .select(explode(col("arr")).as("s"))
      .select(negate(col("s.negcos")).as("cos"), col("s.id"))
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    // cosine DESC, id ASC on ties
    assert(out == Seq((0.9, "a"), (0.9, "b"), (0.5, "d")))
  }
}
