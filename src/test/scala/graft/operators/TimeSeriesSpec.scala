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

  test("cusumChangepoint locates a planted level shift at the shift day") {
    // key "up": 2 events/day for days 1-6, then 8/day for days 7-10.
    // S_t = cumsum - t*mu peaks in magnitude at the last pre-shift day
    // (day 6): mu = (12+32)/10 = 4.4, S_6 = 12 - 6*4.4 = -14.4.
    // key "flat": constant 3/day -> S_t = 0 for all t, sigma = 0 ->
    // cusum_stat divides by zero -> null; argmax ties break earliest day.
    def ts(d: Int, i: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 0$i:00:00")
    val rows =
      (1 to 6).flatMap(d => (1 to 2).map(i => ("up", ts(d, i)))) ++
      (7 to 10).flatMap(d => (1 to 8).map(i => ("up", ts(d, i)))) ++
      (1 to 5).flatMap(d => (1 to 3).map(i => ("flat", ts(d, i))))
    val out = TimeSeries.cusumChangepoint(rows.toDF("k", "ts"), "k", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    val up = out("up")
    assert(up.getLong(1) == 10L)
    assert(up.getTimestamp(2).toString.startsWith("2024-03-06"))
    assert(up.getDouble(3) == -14.4)
    assert(up.getDouble(4) == 4.4)
    val flat = out("flat")
    assert(flat.getTimestamp(2).toString.startsWith("2024-03-01"))
    assert(flat.getDouble(3) == 0.0)
    assert(flat.isNullAt(5), "sigma = 0 must yield null stat, not NaN/Inf")
  }

  test("leadLagCorrelation: a planted 2-day lead shows r = 1 at lag 2") {
    // A fires on days 1,3,5 (2,4,6,... events), B repeats the exact
    // pattern two days later — and day 4 has NO rows for either series
    // (the zero-fill must supply it, or lag alignment breaks)
    def ts(d: Int, i: Int) = java.sql.Timestamp.valueOf(f"2024-07-$d%02d 0$i:00:00")
    val a = Seq(1 -> 2, 3 -> 5, 5 -> 3).flatMap { case (d, n) =>
      (1 to n).map(i => ("a", ts(d, i))) }
    val b = Seq(3 -> 2, 5 -> 5, 7 -> 3).flatMap { case (d, n) =>
      (1 to n).map(i => ("b", ts(d, i))) }
    val noise = Seq(("z", ts(2, 1))) // other key: must be ignored entirely
    val out = TimeSeries.leadLagCorrelation(
        (a ++ b ++ noise).toDF("k", "ts"), "k", "ts", "a", "b", maxLag = 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(out.keySet == (-3 to 3).toSet)
    // spine = days 1..7 (7 days); lag 2 overlaps 5 days, perfectly aligned
    assert(out(2) == ((5L, 1.0)))
    assert(out(0)._1 == 7L)
    assert(out(0)._2 < 1.0)
  }

  test("leadLagCorrelation: constant overlap yields null r, not NaN") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-07-$d%02d 01:00:00")
    // one event of each type per day: both series constant -> zero variance
    val rows = (1 to 5).flatMap(d => Seq(("a", ts(d)), ("b", ts(d))))
    val out = TimeSeries.leadLagCorrelation(
        rows.toDF("k", "ts"), "k", "ts", "a", "b", maxLag = 1)
      .collect()
    assert(out.forall(_.isNullAt(2)))
  }

  test("seasonalResiduals: weekday baseline averages same-dow history") {
    // Mondays 2024-03-04/11/18 with 2,4,6 events (mean 4); one Tuesday
    // with 5 (mean 5, residual 0)
    def ts(d: Int, i: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 0$i:00:00")
    val rows = Seq(4 -> 2, 11 -> 4, 18 -> 6).flatMap { case (d, n) =>
      (1 to n).map(i => ("m", ts(d, i))) } ++
      (1 to 5).map(i => ("m", ts(5, i)))
    val out = TimeSeries.seasonalResiduals(rows.toDF("k", "ts"), "k", "ts")
      .collect().map(r => r.getDate(1).toString ->
        ((r.getInt(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("2024-03-04") == ((2, 2L, 4.0, -2.0))) // Monday, dow=2
    assert(out("2024-03-11") == ((2, 4L, 4.0, 0.0)))
    assert(out("2024-03-18") == ((2, 6L, 4.0, 2.0)))
    assert(out("2024-03-05") == ((3, 5L, 5.0, 0.0))) // lone Tuesday
  }

  test("burstiness: metronome -> Fano 0 / index -1; one-day burst counts absent days as zero") {
    import spark.implicits._
    // corpus span Mar 1-5 (5 days).
    // steady: exactly one event each day -> var 0
    // burst: 10 events on Mar 3 only -> counts (0,0,10,0,0)
    val rows =
      (1 to 5).map(d => ("steady", ts(f"2024-03-0$d 10:00:00"))) ++
        (1 to 10).map(_ => ("burst", ts("2024-03-03 10:00:00")))
    val out = TimeSeries.burstiness(rows.toDF("k", "ts"), "k", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(out("steady") == ((5L, 5L, 1L, 1.0, 0.0, -1.0)))
    val (nd, ne, peak, mean, fano, b) = out("burst")
    assert(nd == 5L && ne == 10L && peak == 10L && mean == 2.0)
    // counts (0,0,10,0,0): pop var = (100 - 100/5)/5 = 16 -> fano 8
    assert(fano == 8.0, s"fano $fano")
    assert(b == math.rint(1e4 * (4.0 - 2.0) / (4.0 + 2.0)) / 1e4)
    assert(b > 0, "bursty index positive, metronome at the -1 floor")
  }

  test("theilSen ignores the outlier day OLS would chase") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    // days 1..4 climb by exactly 1/day; day 5 spikes to 100 — 6 of the 10
    // pairwise slopes are 1.0, so the discrete median is 1.0 exactly
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex
      .map { case (v, i) => ("m", ts(i + 1), v) }.toDF("k", "ts", "v")
    val out = TimeSeries.theilSen(rows, "k", "ts", "v").collect().head
    assert(out.getLong(1) == 10L && out.getDouble(2) == 1.0)
    // even-count selection: slopes [1, 1.5, 2] -> position ceil(1.5)=2
    val even = Seq(("e", ts(1), 1.0), ("e", ts(2), 2.0), ("e", ts(3), 4.0))
      .toDF("k", "ts", "v")
    assert(TimeSeries.theilSen(even, "k", "ts", "v")
      .collect().head.getDouble(2) == 1.5)
  }

  test("mannKendall: monotone series scores the exact S/var/z; flat is null-safe") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    val up = (1 to 5).map(d => ("up", ts(d), d * 10.0))
    val flat = (1 to 5).map(d => ("flat", ts(d), 7.0))
    val out = TimeSeries.mannKendall((up ++ flat).toDF("k", "ts", "v"),
        "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // strictly increasing: S = C(5,2) = 10, var = 5*4*15/18, z = 9/sqrt(var)
    val varS = 300.0 / 18.0
    assert(out("up") == ((5L, 10L, math.rint(varS * 1e4) / 1e4,
      math.rint(9.0 / math.sqrt(varS) * 1e4) / 1e4)))
    // all-tied series: S = 0 and the tie correction zeroes the variance —
    // z must be the 0 branch, not a 0/0 NaN
    assert(out("flat") == ((5L, 0L, 0.0, 0.0)))
  }

  test("ewma: exact recursion y1=x1, day collapse first, singletons pass through") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("a", ts("2024-03-01 10:00:00"), 10.0),
      ("a", ts("2024-03-02 09:00:00"), 15.0), // same day, two rows -> mean 20
      ("a", ts("2024-03-02 11:00:00"), 25.0),
      ("a", ts("2024-03-03 10:00:00"), 40.0),
      ("b", ts("2024-03-05 10:00:00"), 7.0)   // single-day series
    ).toDF("k", "ts", "v")
    val out = TimeSeries.ewma(rows, "k", "ts", "v", alpha = 0.2)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("a", "2024-03-01")) == ((1L, 10.0, 10.0)))
    // y2 = 0.8*10 + 0.2*20 = 12; y3 = 0.8*12 + 0.2*40 = 17.6
    assert(out(("a", "2024-03-02")) == ((2L, 20.0, 12.0)))
    assert(out(("a", "2024-03-03")) == ((1L, 40.0, 17.6)))
    assert(out(("b", "2024-03-05")) == ((1L, 7.0, 7.0)),
      "a one-day series folds nothing: ewma = the day mean")
  }

  test("seasonalForecastEval: t-7 errors, pinball asymmetry charges under-forecast 9x") {
    import spark.implicits._
    def ev(k: String, day: Int, n: Int) = (1 to n).map(_ =>
      (k, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")))
    // a: day1=2, day8=5, day15=5 -> errors (+3, 0); b: day1=5, day8=2 -> (-3)
    val rows = (ev("a", 1, 2) ++ ev("a", 8, 5) ++ ev("a", 15, 5) ++
      ev("b", 1, 5) ++ ev("b", 8, 2)).toDF("event_type", "ts")
    val out = TimeSeries.seasonalForecastEval(rows, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // a: over-forecast day8 by -?? e=+3 (actual above forecast): pinball90
    // = max(9*3, -3)/10 /2days = 27/20
    assert(out("a") == ((2L, 1.5, 0.75, 1.35)))
    // b: e=-3 (actual below forecast): pinball90 = max(-27, 3)/10 = 0.3
    assert(out("b") == ((1L, 3.0, 1.5, 0.3)))
    // days without a t-7 partner (day1) never score
  }

  test("autocorrelation: exact integer moments, calendar gaps drop pairs") {
    import spark.implicits._
    def ev(k: String, day: Int, n: Int) = (1 to n).map(_ =>
      (k, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")))
    // a: counts [1,2,3,4] on d1..d4; b: [1,2,4] on d1,d2,d4 (d3 gap)
    val rows = (ev("a", 1, 1) ++ ev("a", 2, 2) ++ ev("a", 3, 3) ++
      ev("a", 4, 4) ++ ev("b", 1, 1) ++ ev("b", 2, 2) ++ ev("b", 4, 4))
      .toDF("event_type", "ts")
    val out = TimeSeries.autocorrelation(rows, "event_type", "ts", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // a, n=4 T=10 Sxx=30: lag1 num*16 = 16*20-40*15+3*100 = 20, den*16 = 80
    assert(out(("a", 1L)) == ((3L, 0.25)))
    assert(out(("a", 2L)) == ((2L, -0.3)))
    assert(out(("a", 3L)) == ((1L, -0.45)))
    // b: lag1 only pairs (1,2) — the d2->d3 and d4->d5 lags find no day
    assert(out(("b", 1L)) == ((1L, math.rint(4.0 / 42.0 * 1e4) / 1e4)))
    assert(out(("b", 2L)) == ((1L, math.rint(-5.0 / 42.0 * 1e4) / 1e4)),
      "lag 2 bridges the gap day: pair (d2, d4)")
    assert(out(("b", 3L)) == ((1L, math.rint(-20.0 / 42.0 * 1e4) / 1e4)),
      "lag 3 pairs d1 with d4 across the gap")
  }

  test("holtForecastEval: dyadic recursion is exact; singleton keys drop") {
    import spark.implicits._
    def ev(k: String, day: Int, n: Int) = (1 to n).map(_ =>
      (k, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")))
    // a: counts 1,2,4 -> holt errors |2-1|=1, |4-1.625|=2.375; naive 1,2
    val rows = (ev("a", 1, 1) ++ ev("a", 2, 2) ++ ev("a", 3, 4) ++
      ev("solo", 1, 3)).toDF("event_type", "ts")
    val out = TimeSeries.holtForecastEval(rows, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("a") == ((3L, 1.6875, 1.5, -0.125)),
      "l2=1.5 b2=0.125 f3=1.625: sae 3.375/2, nae 3/2, skill 1-3.375/3")
    assert(!out.contains("solo"), "one observation scores nothing")
    intercept[IllegalArgumentException] {
      TimeSeries.holtForecastEval(rows, "event_type", "ts", alpha = 0.3)
    }
  }

  test("seasonalDecompose: n = trend + seasonal + residual, full frames only") {
    import spark.implicits._
    def ev(day: Int, n: Int) = (1 to n).map(_ =>
      ("a", java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")))
    // counts 1,2,3,4,12,6,7,8,9 — a spike on day 5
    val counts = Seq(1, 2, 3, 4, 12, 6, 7, 8, 9)
    val rows = counts.zipWithIndex.flatMap { case (n, i) => ev(i + 1, n) }
      .toDF("event_type", "ts")
    val out = TimeSeries.seasonalDecompose(rows, "event_type", "ts")
      .collect().map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set("2024-03-04", "2024-03-05", "2024-03-06"),
      "only days with a full +-3 frame emit")
    assert(out("2024-03-04") == ((4L, 5.0, -1.0, 0.0)))
    assert(out("2024-03-05") == ((12L, 6.0, 6.0, 0.0)),
      "the spike shows as seasonal here: each dow has one obs, resid 0")
    assert(out("2024-03-06") == ((6L, 7.0, -1.0, 0.0)))
    assert(out.values.forall(v => v._1.toDouble == v._2 + v._3 + v._4),
      "the decomposition reconstructs the count exactly")
  }
}
