package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    // heavy skew: 1000 rows of key 1, a handful elsewhere
    val big = ((1 to 1000).map(i => (1L, i)) ++ Seq((2L, 1), (3L, 2)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .groupBy("k", "label")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(rowsOf(salted) == rowsOf(plain))
  }

  test("salt spreads a hot key over multiple partitions") {
    val big = (1 to 1000).map(i => (1L, i.toString)).toDF("k", "v")
    val saltCol = graft.functions.Hashes.portableHash32(
      concat_ws("", col("k").cast("string"), col("v"))) % 8
    val distinctSalts = big.select(pmod(saltCol, lit(8)).as("s")).distinct().count()
    assert(distinctSalts >= 6) // hot key now hits ~8 reducers, not 1
  }

  test("AQE skew-join splits the hot partition at runtime (no manual salt)") {
    // the native alternative to saltedJoin: AQE detects the oversized
    // shuffle partition and splits it. Thresholds tuned way down so the
    // tiny fixture trips the detector; assert on the FINAL adaptive plan.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val big = ((1 to 20000).map(i => (1L, s"payload_$i")) ++
        (2 to 40).map(i => (i.toLong, "x"))).toDF("k", "v").repartition(8)
      val small = (1 to 40).map(i => (i.toLong, s"label_$i")).toDF("k", "label")
      val joined = big.join(small, Seq("k"))
      // materialize THIS queryExecution (count() would run a separate one
      // and leave this plan un-adapted)
      assert(joined.collect().length == 20000 + 39) // correctness unaffected
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
