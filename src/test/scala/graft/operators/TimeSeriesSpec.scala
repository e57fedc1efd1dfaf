package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleInterpolate draws straight lines through interior gaps") {
    val events = Seq(
      // user 1: 10:xx=5.0 .. 13:xx=11.0 -> 11:00 and 12:00 interpolate
      (1L, ts("2024-01-01 10:15:00"), 5.0, 1L),
      (1L, ts("2024-01-01 13:40:00"), 11.0, 2L),
      // user 2: adjacent observed buckets -> nothing to interpolate
      (2L, ts("2024-01-02 07:01:00"), 3.0, 3L),
      (2L, ts("2024-01-02 08:30:00"), 4.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleInterpolate(events, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", 5.0, true),
      (1L, "2024-01-01 11:00:00.0", 7.0, false), // 5 + 6*(1/3)
      (1L, "2024-01-01 12:00:00.0", 9.0, false), // 5 + 6*(2/3)
      (1L, "2024-01-01 13:00:00.0", 11.0, true),
      (2L, "2024-01-02 07:00:00.0", 3.0, true),
      (2L, "2024-01-02 08:00:00.0", 4.0, true)))
  }

  test("resampleFill fills gaps forward on each key's own span") {
    val events = Seq(
      // user 1: events at 10:xx and 13:xx -> spine 10,11,12,13
      (1L, ts("2024-01-01 10:15:00"), 5.0, 1L),
      (1L, ts("2024-01-01 13:40:00"), 9.0, 2L),
      // user 2: single event -> one-bucket spine
      (2L, ts("2024-01-02 07:01:00"), 3.0, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFill(events, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", 5.0, true),
      (1L, "2024-01-01 11:00:00.0", 5.0, false), // carried forward
      (1L, "2024-01-01 12:00:00.0", 5.0, false),
      (1L, "2024-01-01 13:00:00.0", 9.0, true),
      (2L, "2024-01-02 07:00:00.0", 3.0, true)))
  }

  test("resampleFill picks the LAST observation in a bucket, ties by tie column") {
    val events = Seq(
      (1L, ts("2024-01-01 10:10:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:50:00"), 2.0, 2L), // latest ts wins
      (2L, ts("2024-01-01 10:20:00"), 7.0, 5L),
      (2L, ts("2024-01-01 10:20:00"), 8.0, 6L)  // equal ts: higher tie wins
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFill(events, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 2.0)
    assert(out(2L) == 8.0)
  }
}
