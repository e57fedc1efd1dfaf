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

  test("intervalOverlap matches the naive overlap join; multi-chunk pairs count once") {
    val a = Seq(
      (1L, ts(9, 0), ts(12, 0)),   // spans many 15-min chunks
      (2L, ts(13, 0), ts(13, 30)),
      (3L, ts(20, 0), ts(21, 0))
    ).toDF("aid", "as", "ae")
    val b = Seq(
      (10L, ts(8, 0), ts(23, 0)),  // overlaps ALL of a's intervals, across chunks
      (11L, ts(11, 50), ts(13, 10)), // overlaps 1 and 2
      (12L, ts(14, 0), ts(15, 0))  // overlaps none
    ).toDF("bid", "bs", "be")
    val fast = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
        chunkSeconds = 900)
      .select("aid", "bid")
    val naive = a.crossJoin(b)
      .filter(col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid")
    // exact pair set AND exact multiset size: a pair overlapping in many
    // chunks must survive exactly once (owner-chunk rule, no distinct)
    assert(rowsOf(fast) == rowsOf(naive))
    assert(fast.count() == naive.count())
    assert(rowsOf(fast) == Set(Seq(1L, 10L), Seq(2L, 10L), Seq(3L, 10L),
      Seq(1L, 11L), Seq(2L, 11L)))
  }

  test("intervalOverlap stays equi on the chunk id — no nested-loop plan") {
    val a = (1L to 50L).map(i => (i, ts(9, 0), ts(10, 0))).toDF("aid", "as", "ae")
    val b = (1L to 50L).map(i => (i, ts(9, 30), ts(11, 0))).toDF("bid", "bs", "be")
    val plan = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be", 900)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
