package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
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
