package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("conversionFunnel: later stages only count AFTER the earlier stage") {
    val events = Seq(
      // u1 converts in order: view@1, click@2, purchase@3
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2 clicks BEFORE its first view: click must not count
      (2L, "click", ts(1)), (2L, "view", ts(2)),
      // u3 views only
      (3L, "view", ts(5)),
      // u4 purchases with no view at all: no stage counts
      (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = EventOps.conversionFunnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out("view") == ((1L, 3L, 1.0)))      // u1, u2, u3
    assert(out("click") == ((2L, 1L, 0.3333)))  // only u1 (u2's click too early)
    assert(out("purchase") == ((3L, 1L, 1.0)))  // u1 completes
  }

  test("conversionFunnel: same-timestamp stage events satisfy the order (>=)") {
    val events = Seq((1L, "view", ts(1)), (1L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.conversionFunnel(events, "user_id", "event_type", "ts",
        Seq("view", "click")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("click") == 1L)
  }

  test("sessionWindowAgg splits at gap >= 10 minutes and keeps < gap together") {
    val events = Seq(
      // u1: 10:00, 10:09 (9 min apart -> one session), 10:30 (new session)
      (1L, ts(0), 1.0, 1L), (1L, ts(9), 2.0, 2L), (1L, ts(30), 4.0, 3L),
      // u2: single event
      (2L, ts(5), 8.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = EventOps.sessionWindowAgg(events, "user_id", "ts", "value",
        "10 minutes").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, "2026-01-01 10:00:00")) == ((2L, 9L * 60 * 1000000L, 3.0)))
    assert(out((1L, "2026-01-01 10:30:00")) == ((1L, 0L, 4.0)))
    assert(out((2L, "2026-01-01 10:05:00")) == ((1L, 0L, 8.0)))
    // exactly-at-gap boundary: Spark MERGES an event landing exactly gap
    // after the previous one (the oracle's strict > mirrors this)
    val boundary = Seq((1L, ts(0), 1.0, 1L), (1L, ts(10), 2.0, 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val b = EventOps.sessionWindowAgg(boundary, "user_id", "ts", "value",
      "10 minutes").collect()
    assert(b.length == 1 && b.head.getLong(2) == 2L, b.mkString(";"))
  }

  test("sessionWindowAgg matches the gap-merge model on random event sets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random (user, second-offset, value) triples at a 10 s gap: the
    // driver model merges while next − last <= gap (Spark's
    // exactly-at-gap MERGE, pinned by the boundary test above) and must
    // reproduce every (user, session_start) row exactly — count, min-max
    // duration in µs, and value sum
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def fmtStart(off: Int): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(base + off * 1000L))
    val genEvents = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.choose(1L, 4L), Gen.choose(0, 120), Gen.choose(1, 9)))
    } yield rows
    val prop = Prop.forAll(genEvents) { rows =>
      val df = rows.zipWithIndex.map { case ((u, s, v), i) =>
        (u, new java.sql.Timestamp(base + s * 1000L), v.toDouble, i.toLong)
      }.toDF("user_id", "ts", "value", "event_id")
      val got = EventOps.sessionWindowAgg(df, "user_id", "ts", "value",
          "10 seconds").collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.map(e => (e._2, e._3)).sortBy(_._1)
        val sessions = sorted.foldLeft(List.empty[List[(Int, Int)]]) {
          case (cur :: rest, e) if e._1 - cur.last._1 <= 10 =>
            (cur :+ e) :: rest
          case (acc, e) => List(e) :: acc
        }.reverse
        sessions.map { s =>
          (u, fmtStart(s.head._1)) -> ((s.length.toLong,
            (s.last._1 - s.head._1) * 1000000L,
            s.map(_._2).sum.toDouble))
        }
      }
      if (got != want)
        println(s"rows=$rows\ngot=$got\nwant=$want")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("lastTouchAttribution credits the latest in-window touch; ties by event id") {
    val events = Seq(
      // u1: click then view then purchase -> view (most recent) wins
      (1L, 1L, "click", ts(1), 0.0), (2L, 1L, "view", ts(2), 0.0),
      (3L, 1L, "purchase", ts(3), 10.0),
      // u2: touch exists but outside the 5-minute window -> (none)
      (4L, 2L, "click", ts(1), 0.0), (5L, 2L, "purchase", ts(30), 20.0),
      // u3: no touch at all -> (none)
      (6L, 3L, "purchase", ts(4), 30.0),
      // u4: click and view at the SAME timestamp -> higher event id (view) wins
      (7L, 4L, "click", ts(5), 0.0), (8L, 4L, "view", ts(5), 0.0),
      (9L, 4L, "purchase", ts(6), 40.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.lastTouchAttribution(events, "user_id", "ts",
        "event_type", "value", Seq("click", "view"), "purchase",
        windowSeconds = 300L, idCol = "event_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("view") == ((2L, 50.0)))   // u1 and u4
    assert(out("(none)") == ((2L, 50.0))) // u2 (stale) and u3 (never)
    assert(!out.contains("click"))
  }

  test("transitionMatrix: consecutive pairs per user, ties broken by event id") {
    val events = Seq(
      // u1: view -> click -> purchase (two transitions)
      (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)),
      (3L, 1L, "purchase", ts(3)),
      // u2: view -> view (same ts: id 4 then id 5) -> click
      (4L, 2L, "view", ts(1)), (5L, 2L, "view", ts(1)),
      (6L, 2L, "click", ts(2)),
      // u3: single event, no transition
      (7L, 3L, "error", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.transitionMatrix(events, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("view", "click")) == ((2L, 0.5)))
    assert(out(("click", "purchase")) == ((1L, 0.25)))
    assert(out(("view", "view")) == ((1L, 0.25)))
    assert(out.values.map(_._1).sum == 4L)
    assert(!out.keys.exists(_._1 == "error"))
  }

  test("eventCooccurrence: counts users with both types, each pair once") {
    val events = Seq(
      (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)),
      (3L, 1L, "view", ts(3)),                        // duplicate type: once
      (4L, 2L, "view", ts(1)), (5L, 2L, "click", ts(2)),
      (6L, 3L, "view", ts(1))                         // single type: no pair
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.eventCooccurrence(events, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("click", "view") -> 2L))
  }

  test("retentionCohorts: cohort = first active day; cells count returns") {
    def day(d: Int) = Timestamp.valueOf(f"2026-02-$d%02d 09:00:00")
    val events = Seq(
      // cohort day 1: u1, u2. u1 returns day 2; u2 returns day 3 (twice)
      (1L, 1L, day(1)), (2L, 2L, day(1)),
      (3L, 1L, day(2)), (4L, 2L, day(3)), (5L, 2L, day(3)),
      // cohort day 2: u3, never returns
      (6L, 3L, day(2)),
      // u1 again on day 12: beyond the 7-day horizon -> no cell
      (7L, 1L, day(12))
    ).toDF("event_id", "user_id", "ts")
    val out = EventOps.retentionCohorts(events, "ts", "user_id",
        horizonDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("2026-02-01", 0L)) == ((2L, 2L, 1.0)))
    assert(out(("2026-02-01", 1L)) == ((1L, 2L, 0.5)))   // u1 on day 2
    assert(out(("2026-02-01", 2L)) == ((1L, 2L, 0.5)))   // u2 once, despite 2 events
    assert(out(("2026-02-02", 0L)) == ((1L, 1L, 1.0)))   // u3's own cohort
    // u3 does NOT join cohort day 1; day-12 activity is beyond horizon
    assert(out.keys.map(_._1).toSet == Set("2026-02-01", "2026-02-02"))
    assert(!out.contains(("2026-02-01", 11L)))
  }

  test("topEventTrigrams: contiguous in-user paths only, ties break on pattern") {
    val events = Seq(
      // u1: view>click>purchase and click>purchase>view (overlapping)
      (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)),
      (3L, 1L, "purchase", ts(3)), (4L, 1L, "view", ts(4)),
      // u2: view>click>purchase again -> that path counts 2
      (5L, 2L, "view", ts(1)), (6L, 2L, "click", ts(2)),
      (7L, 2L, "purchase", ts(3)),
      // u3: only two events -> no trigram
      (8L, 3L, "view", ts(1)), (9L, 3L, "click", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.topEventTrigrams(events, "user_id", "ts",
        "event_type", "event_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.head == ((1L, "view>click>purchase", 2L)))
    assert(out.map(_._2).toSet ==
      Set("view>click>purchase", "click>purchase>view"))
    // never a cross-user trigram (u3's pair + u1's view would be one)
    assert(out.map(_._3).sum == 3L)
  }

  test("funnelLatency: first-A-to-first-B delays, non-converters excluded") {
    val events = Seq(
      // u1: view@1, purchase@4 -> 180 s
      (1L, 1L, "view", ts(1)), (2L, 1L, "purchase", ts(4)),
      // u2: purchase BEFORE any view -> excluded (ta > tb)
      (3L, 2L, "purchase", ts(1)), (4L, 2L, "view", ts(2)),
      // u3: view only -> excluded
      (5L, 3L, "view", ts(1)),
      // u4: view@2, purchase@2 (same minute) -> 0 s; second purchase ignored
      (6L, 4L, "view", ts(2)), (7L, 4L, "purchase", ts(2)),
      (8L, 4L, "purchase", ts(30))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.funnelLatency(events, "user_id", "ts", "event_type",
        "view", "purchase").collect()
    assert(out.length == 1)
    val r = out.head
    // n=2 (u1, u4); delays {0, 180}: p50 = v[ceil(.5*2)=1] = 0, p90 = v[2] = 180
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.getLong(2) == 180L)
  }

  test("rollingActiveUsers: trailing window counts each user once") {
    def day(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 09:00:00")
    val events = Seq(
      // u1 active day 1 twice and day 3; u2 active day 3 only
      (1L, 1L, day(1)), (2L, 1L, day(1)), (3L, 1L, day(3)),
      (4L, 2L, day(3)),
      // day 10 is outside day 3's trailing-7 window
      (5L, 1L, day(10))
    ).toDF("event_id", "user_id", "ts")
    val out = EventOps.rollingActiveUsers(events, "ts", "user_id",
        windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("2026-01-01") == ((1L, 1L)))
    // day 3: both users today; trailing window [day-3..day3] still 2 users
    // (u1 counted once despite day-1 AND day-3 activity)
    assert(out("2026-01-03") == ((2L, 2L)))
    // day 10: only u1, and days 1/3 are outside the trailing window
    assert(out("2026-01-10") == ((1L, 1L)))
  }

  test("hourOfDayUniformity: uniform profile scores 0, point-mass profile scores (n-1)^2/e + 23e") {
    // "flat": one event in every hour -> chi2 exactly 0
    val flat = (0 until 24).map(h =>
      ("flat", Timestamp.valueOf(f"2026-01-01 $h%02d:15:00")))
    // "spike": 24 events all in hour 3 -> e = 1; chi2 = 23^2 + 23*1 = 552
    val spike = (1 to 24).map(_ =>
      ("spike", Timestamp.valueOf("2026-01-01 03:30:00")))
    val df = (flat ++ spike).toDF("event_type", "ts")
    val out = EventOps.hourOfDayUniformity(df, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("flat") == ((24L, 0.0, 0L, 0.041667)))
    assert(out("spike") == ((24L, 552.0, 3L, 1.0)))
  }

  test("markovAttribution: removal effects on a hand-computable chain") {
    // u1: a -> conv; u2: a -> conv; u3: b -> null; u4: b -> a -> conv
    // T: start->{a:.5, b:.5}; a->conv 1; b->{null:.5, a:.5}
    // base = .5*1 + .5*(.5*0 + .5*1) = 0.75
    // remove a: start->a dies, b->a dies -> base' = 0; effect 1
    // remove b: only u3/u4's first hop dies -> base' = .5; effect 1/3
    val events = Seq(
      (1L, 1L, "a", ts(1)), (2L, 1L, "purchase", ts(2)),
      (3L, 2L, "a", ts(1)), (4L, 2L, "purchase", ts(2)),
      (5L, 3L, "b", ts(1)),
      (6L, 4L, "b", ts(1)), (7L, 4L, "a", ts(2)), (8L, 4L, "purchase", ts(3))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.markovAttribution(events, "user_id", "ts",
        "event_type", "event_id", convType = "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a") == ((0.75, 0.0, 1.0)))
    assert(out("b")._1 == 0.75 && out("b")._2 == 0.5)
    assert(math.abs(out("b")._3 - 1.0 / 3.0) < 1e-6)
  }

  test("markovAttribution: post-conversion events are dropped; no-conv chain reports base 0") {
    // u1 converts then clicks again — the tail click must not create
    // transitions (the journey ends at the first conversion)
    val events = Seq(
      (1L, 1L, "a", ts(1)), (2L, 1L, "purchase", ts(2)), (3L, 1L, "a", ts(3)),
      (4L, 2L, "a", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.markovAttribution(events, "user_id", "ts",
      "event_type", "event_id", convType = "purchase").collect()
    assert(out.length == 1 && out.head.getString(0) == "a")
    // start->a 1.0; a->{conv .5, null .5} -> base 0.5, removing a kills it
    assert(out.head.getDouble(1) == 0.5 && out.head.getDouble(3) == 1.0)
    // a corpus with NO conversions: base 0 -> effect null, not NaN
    val none = EventOps.markovAttribution(
      Seq((1L, 1L, "a", ts(1))).toDF("event_id", "user_id", "event_type", "ts"),
      "user_id", "ts", "event_type", "event_id", convType = "purchase")
      .collect()
    assert(none.length == 1 && none.head.getDouble(1) == 0.0 &&
      none.head.isNullAt(3))
  }

  test("userRegularity: metronomic single-action bot scores below a varied bursty human") {
    def ts(s: String) = Timestamp.valueOf(s)
    // bot 1: one event type, exact 60s cadence -> entropy 0, cv 0
    val bot = (0 until 6).map(i =>
      (1L, ts(f"2024-03-01 10:${i}%02d:00"), "ping"))
    // human 2: three types, irregular gaps
    val human = Seq(
      (2L, ts("2024-03-01 10:00:00"), "view"),
      (2L, ts("2024-03-01 10:00:05"), "click"),
      (2L, ts("2024-03-01 10:07:00"), "view"),
      (2L, ts("2024-03-01 11:30:00"), "purchase"),
      (2L, ts("2024-03-01 11:30:30"), "view"),
      (2L, ts("2024-03-02 09:00:00"), "click"))
    // user 3: too few events — excluded
    val sparse = Seq((3L, ts("2024-03-01 10:00:00"), "view"),
      (3L, ts("2024-03-01 10:05:00"), "view"))
    val df = (bot ++ human ++ sparse).toDF("user_id", "ts", "event_type")
    val out = EventOps.userRegularity(df, "user_id", "ts", "event_type",
        minEvents = 5, topN = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out.keySet == Set(1L, 2L), "sparse user excluded")
    val (bn, bt, bh, bcv, bscore) = out(1L)
    assert(bn == 6L && bt == 1L && bh == 0.0 && bcv == 0.0 && bscore == 0.0,
      "perfect metronome: zero entropy, zero CV")
    val (_, ht, hh, hcv, hscore) = out(2L)
    assert(ht == 3L && hh > 0.5 && hcv > 1.0 && hscore > 1.5)
    assert(bscore < hscore, "bot must rank more suspicious than human")
  }

  test("kaplanMeierRetention: hand-computed product-limit curve with censoring") {
    def ts(s: String) = Timestamp.valueOf(s)
    // corpus end = Jan 20. censorDays = 3 (last event after Jan 17 => censored)
    // u1: Jan 1 -> Jan 1  (t=0, death)
    // u2: Jan 1 -> Jan 3  (t=2, death)
    // u3: Jan 1 -> Jan 3  (t=2, death)
    // u4: Jan 10 -> Jan 12 (t=2, death)
    // u5: Jan 16 -> Jan 19 (t=3, censored)
    // u6: Jan 18 -> Jan 20 (t=2, censored)
    val ev = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (2L, "2024-01-03"),
      (3L, "2024-01-01"), (3L, "2024-01-03"), (4L, "2024-01-10"),
      (4L, "2024-01-12"), (5L, "2024-01-16"), (5L, "2024-01-19"),
      (6L, "2024-01-18"), (6L, "2024-01-20"))
      .map { case (u, d) => (u, ts(s"$d 12:00:00")) }
      .toDF("user_id", "ts")
    val out = EventOps.kaplanMeierRetention(ev, "user_id", "ts", censorDays = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // day 0: at risk 6, 1 death           -> S = 5/6
    // day 2: at risk 5, 3 deaths, 1 cens  -> S = 5/6 * 2/5 = 1/3
    // day 3: at risk 1, 0 deaths, 1 cens  -> S unchanged
    assert(out(0L) == ((6L, 1L, 0L, math.rint(1e6 * 5.0 / 6.0) / 1e6)))
    assert(out(2L)._1 == 5L && out(2L)._2 == 3L && out(2L)._3 == 1L)
    assert(math.abs(out(2L)._4 - 1.0 / 3.0) < 1e-5)
    assert(out(3L) == ((1L, 0L, 1L, out(2L)._4)),
      "a censored-only day must not move the curve")
    // terminal all-death day pins survival at exactly 0 (the longest-lived
    // user dies while a shorter-lived one holds the corpus edge)
    val dead = Seq((1L, "2024-01-01"), (1L, "2024-01-05"),
      (2L, "2024-01-08"), (2L, "2024-01-10"))
      .map { case (u, d) => (u, ts(s"$d 12:00:00")) }.toDF("user_id", "ts")
    val dOut = EventOps.kaplanMeierRetention(dead, "user_id", "ts",
        censorDays = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(dOut(4L) == 0.0, "everyone at risk dying must zero the curve")
  }

  test("growthAccounting: DAU decomposes into new/retained/resurrected; edge censors churn") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // A: d1, d2 (retained), d12 (gap 10 > 7: resurrected); B: d1 only
    val rows = Seq(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 11:00:00"), // same day
      (1L, "2024-03-02 10:00:00"), (1L, "2024-03-12 10:00:00"),
      (2L, "2024-03-01 10:00:00")
    ).map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val out = EventOps.growthAccounting(rows, "user_id", "ts", gapDays = 7)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("2024-03-01") == ((2L, 2L, 0L, 0L, 1L)),
      "both new; B churns (never returns)")
    assert(out("2024-03-02") == ((1L, 0L, 1L, 0L, 1L)),
      "A retained; next gap 10 > 7 flags churning")
    assert(out("2024-03-12") == ((1L, 0L, 0L, 1L, 1L)),
      "A resurrected; data edge right-censors as churning")
    assert(out.values.forall(v => v._1 == v._2 + v._3 + v._4),
      "dau = new + retained + resurrected")
  }

  test("latenessProfile: drops thin out as the watermark widens; zero cells survive") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // arrival order 1..5; event times 100,200,150,90,310:
    // late_by = 0, 0, 50, 110, 0
    val rows = Seq((1L, 100L), (2L, 200L), (3L, 150L), (4L, 90L),
      (5L, 310L)).map { case (a, t) => ("a", a, ts(t)) }
      .toDF("event_type", "event_id", "ts")
    val out = EventOps.latenessProfile(rows, "event_type", "event_id", "ts")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((2L, 5L, 0.4)), "watermark 0 drops both late events")
    assert(out(60L) == ((1L, 5L, 0.2)), "60 s keeps the 50 s-late event")
    assert(out(300L) == ((0L, 5L, 0.0)), "zero-drop cells report 0, not absent")
    assert(out(900L) == ((0L, 5L, 0.0)) && out(3600L) == ((0L, 5L, 0.0)))
    assert(out.size == 5)
  }
}
