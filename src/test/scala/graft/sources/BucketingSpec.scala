package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("zOrderValue interleaves bits (a even, b odd) and clusters both dims") {
    import spark.implicits._
    // hand-checked: a=0b101 (5), b=0b011 (3) ->
    // even bits from a: 1,0,1 at positions 0,2,4 = 1 + 0 + 16 = 17
    // odd bits from b:  1,1,0 at positions 1,3,5 = 2 + 8 + 0  = 10 -> z=27
    val one = Seq((5, 3)).toDF("a", "b")
      .select(graft.sources.Bucketing.zOrderValue(col("a"), col("b"), 3).as("z"))
    assert(one.head().getLong(0) == 27L)
    // locality: over the full 8x8 grid, any contiguous z-range of 16 cells
    // spans at most half of each dimension (a straight row-major sort would
    // leave the minor dimension spanning the FULL range in every chunk)
    val grid = (for { a <- 0 until 8; b <- 0 until 8 } yield (a, b)).toDF("a", "b")
      .withColumn("z", graft.sources.Bucketing.zOrderValue(col("a"), col("b"), 3))
    val spans = grid.withColumn("chunk", (col("z") / 16).cast("long"))
      .groupBy("chunk")
      .agg((max(col("a")) - min(col("a"))).as("spanA"),
        (max(col("b")) - min(col("b"))).as("spanB"))
      .collect()
    assert(spans.length == 4)
    assert(spans.forall(r => r.getInt(1) <= 3 && r.getInt(2) <= 3),
      spans.mkString(";"))
  }

  import spark.implicits._

  test("co-bucketed join is shuffle-free and matches the plain join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val left = (1L to 5000L).map(i => (i, s"l$i")).toDF("k", "lv")
      val right = (2500L to 7500L).map(i => (i, s"r$i")).toDF("k", "rv")
      Bucketing.writeBucketed(left, "bkt_left", Seq("k"), 8)
      Bucketing.writeBucketed(right, "bkt_right", Seq("k"), 8)

      val joined = Bucketing.cobucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      val expected = left.join(right, Seq("k")).count()
      assert(joined.count() == expected && expected == 2501L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
