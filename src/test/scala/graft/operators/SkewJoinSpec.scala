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
}
