package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("point-in-interval matches the naive BETWEEN join exactly") {
    val points = Seq(
      (1L, "u1", ts(10, 0)), (2L, "u1", ts(10, 30)), (3L, "u1", ts(12, 0)),
      (4L, "u2", ts(10, 15)), (5L, "u2", ts(23, 59))
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      (100L, "u1", ts(9, 45), ts(10, 30)),   // catches 1 and 2 (inclusive end)
      (101L, "u1", ts(11, 0), ts(11, 30)),   // catches none
      (102L, "u2", ts(10, 0), ts(13, 0))     // catches 4
    ).toDF("iid", "k", "s", "e")

    val fast = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e",
        chunkSeconds = 900)
      .select("pid", "iid")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid")
    assert(rowsOf(fast) == rowsOf(naive))
    assert(rowsOf(fast) == Set(Seq(1L, 100L), Seq(2L, 100L), Seq(4L, 102L)))
  }

  test("join stays equi on (key, chunk) — no nested-loop plan") {
    val points = (1L to 100L).map(i => (i, "k", ts(10, (i % 60).toInt))).toDF("pid", "k", "t")
    val intervals = Seq((1L, "k", ts(10, 0), ts(10, 59))).toDF("iid", "k", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
