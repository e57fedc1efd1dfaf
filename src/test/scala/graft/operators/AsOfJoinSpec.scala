package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOf attaches the latest right row at-or-before each left ts, per key") {
    val trades = Seq(
      (1L, "A", ts(5)), (2L, "A", ts(10)), (3L, "A", ts(20)),
      (4L, "B", ts(10)), (5L, "C", ts(10))
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(4), 100.0), ("A", ts(10), 101.0), ("A", ts(15), 102.0),
      ("B", ts(11), 50.0) // only AFTER B's trade
    ).toDF("sym", "ts", "px")

    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) == Some(100.0))  // latest quote at-or-before 10:05 is 10:04
    assert(out(2L) == Some(101.0))  // equal timestamp matches (inclusive)
    assert(out(3L) == Some(102.0))  // 10:15 quote, not 10:10
    assert(out(4L) == None)         // B's only quote is later
    assert(out(5L) == None)         // C has no quotes at all
  }

  test("a genuinely NULL right payload is attributed, not skipped") {
    val left = Seq((1L, "k", ts(45))).toDF("id", "k", "ts")
    val right = Seq(
      ("k", ts(10), Some(5.0)), ("k", ts(30), None)
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v")).collect().head
    assert(out.isNullAt(3)) // the 11:00 row's NULL wins, not the 10:00 value
  }

  test("asOf carries multiple right payload columns") {
    val left = Seq((1L, "k", ts(10))).toDF("id", "k", "ts")
    val right = Seq(("k", ts(9), 7.0, "v9")).toDF("k", "ts", "x", "tag")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("x", "tag"))
      .collect().head
    assert(out.getDouble(3) == 7.0 && out.getString(4) == "v9")
  }
}
