package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import EventTimeOps.{Event, EwmaAlert, SessionUpdate}

class EventTimeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("windowedAgg groups by tumbling window on static data") {
    val events = Seq(
      (1L, ts(5), "click", 1.0), (2L, ts(25), "click", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 11:10:00"), "click", 5.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventTimeOps.windowedAgg(events, "ts", "event_type", "value")
    val m = out.collect().map(r => r.getTimestamp(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m(Timestamp.valueOf("2024-01-01 10:00:00")) == ((2L, 3.0)))
    assert(m(Timestamp.valueOf("2024-01-01 11:00:00")) == ((1L, 5.0)))
  }

  test("windowedAgg runs as a real watermarked stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventTimeOps.windowedAgg(stream, "ts", "event_type", "value")
      .writeStream.outputMode("update").format("memory")
      .queryName("win_agg").start()
    mem.addData((ts(5), "click", 1.0), (ts(40), "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_agg").collect()
    assert(rows.map(_.getLong(2)).sum == 2)
    q.stop()
  }

  test("intervalJoin matches same-key events inside the window, both streams live") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val out = EventTimeOps.intervalJoin(
        purchases.toDF().toDF("user_id", "pts", "amount"),
        clicks.toDF().toDF("user_id", "cts", "page"),
        key = "user_id", leftTs = "pts", rightTs = "cts", within = "1 hour")
      .select(col("l.user_id"), col("amount"), col("page"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()
    purchases.addData((1L, ts(0), 10.0), (2L, ts(0), 20.0))
    clicks.addData(
      (1L, ts(30), "a"),                                      // inside window
      (1L, Timestamp.valueOf("2024-01-01 12:30:00"), "b"),    // past window
      (2L, Timestamp.valueOf("2024-01-01 09:30:00"), "c"),    // before purchase
      (3L, ts(10), "d"))                                      // key never purchases
    q.processAllAvailable()
    // a second trigger can still match earlier left rows within watermark
    clicks.addData((2L, ts(45), "e"))
    q.processAllAvailable()
    val rows = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(rows == Set((1L, 10.0, "a"), (2L, 20.0, "e")))
    q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replays inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = mem.toDF().toDF("event_id", "ts", "payload")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ddww_out").start()
    mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"))
    q.processAllAvailable()
    // replay of event 1 in a later batch, still inside the watermark window
    mem.addData((1L, ts(5), "a-dup"), (3L, ts(6), "c"))
    q.processAllAvailable()
    val ids = spark.table("ddww_out").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // the replayed 1 was dropped
    q.stop()
  }

  test("intervalJoin on static frames equals the explicit range condition") {
    val l = Seq((1L, ts(0), 10.0), (2L, ts(5), 20.0)).toDF("user_id", "pts", "amount")
    val r = Seq((1L, ts(30), "a"), (1L, ts(59), "b"), (2L, ts(4), "c"))
      .toDF("user_id", "cts", "page")
    val out = EventTimeOps.intervalJoin(l, r, "user_id", "pts", "cts",
      within = "30 minutes")
    val got = out.select(col("l.user_id"), col("page")).collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got == Set((1L, "a"))) // b beyond 30min, c before the purchase
  }

  test("flatMapGroupsWithState emits only CLOSED sessions (append mode)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventTimeOps.sessionizeFlat(mem.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("closed_sessions").start()
    mem.addData(Event(7L, ts(0), 1.0), Event(7L, ts(5), 2.0))
    q.processAllAvailable()
    assert(spark.table("closed_sessions").count() == 0) // still open
    mem.addData(Event(7L, ts(30), 9.0)) // beyond gap -> closes session 0
    q.processAllAvailable()
    val rows = spark.table("closed_sessions").as[SessionUpdate].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head == SessionUpdate(7L, 0L, 2L, 3.0, closed = true))
  }

  test("sessionWindowAgg runs as a real watermarked stream with state-merged sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour")
    val q = graft.operators.EventOps.sessionWindowAgg(
        stream, "user_id", "ts", "value", "10 minutes")
      .writeStream.outputMode("complete").format("memory")
      .queryName("sw_stream").start()
    // two events 5 min apart arrive in DIFFERENT micro-batches: the
    // state store must MERGE them into one session
    mem.addData((7L, ts(0), 1.0))
    q.processAllAvailable()
    mem.addData((7L, ts(5), 2.0))
    q.processAllAvailable()
    mem.addData((7L, ts(30), 4.0)) // past the gap -> second session
    q.processAllAvailable()
    val rows = spark.table("sw_stream").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(4))).toMap
    q.stop()
    assert(rows("2024-01-01 10:00:00") == ((2L, 3.0))) // merged across batches
    assert(rows("2024-01-01 10:30:00") == ((1L, 4.0)))
  }

  test("ewmaAlerts: spikes alert after warmup, state survives micro-batch boundaries") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventTimeOps.ewmaAlerts(mem.toDS(), alpha = 0.2, k = 4.0,
        warmup = 5L)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_alerts").start()
    // warmup + steady state: values oscillate 9..11 — no alerts, even
    // though the FIRST events would be "anomalous" vs an empty chart
    mem.addData((0 until 8).map(i =>
      Event(1L, ts(i), if (i % 2 == 0) 9.0 else 11.0)): _*)
    q.processAllAvailable()
    assert(spark.table("ewma_alerts").count() == 0)
    // the spike arrives in a LATER micro-batch: the chart state (mean ~10,
    // sigma ~1) must have survived the batch boundary to catch it
    mem.addData(Event(1L, ts(10), 100.0))
    q.processAllAvailable()
    val alerts = spark.table("ewma_alerts").as[EwmaAlert].collect()
    assert(alerts.length == 1)
    val a = alerts.head
    assert(a.user_id == 1L && a.value == 100.0 && a.z > 4.0)
    assert(math.abs(a.ewma - 10.0) < 1.5)
    // post-spike normal value: the chart absorbed the spike into the mean
    // but a normal reading must not alert
    mem.addData(Event(1L, ts(12), 11.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ewma_alerts").count() == 1)
  }

  test("ewmaAlerts: constant streams never alert (zero variance guard)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventTimeOps.ewmaAlerts(mem.toDS(), warmup = 3L)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_const").start()
    mem.addData((0 until 10).map(i => Event(2L, ts(i), 5.0)): _*)
    q.processAllAvailable()
    q.stop()
    // sigma stays 0: the guard refuses to divide, no alert storm
    assert(spark.table("ewma_const").count() == 0)
  }

  test("debounce: bursts collapse to the first event, cooldown anchors on EMITTED events") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventTimeOps.debounce(mem.toDS(), cooldownMs = 60 * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("debounced").start()
    // three events 40 min apart under a 60-min cooldown: #1 emits,
    // #2 suppressed (40 < 60 from #1), #3 emits (80 >= 60 from #1) —
    // the chain anchors on EMITTED events, so a buffer-equality dedup
    // could not reproduce it
    mem.addData(Event(1L, ts(0), 1.0), Event(1L, ts(40), 2.0))
    q.processAllAvailable()
    // the second batch: state (last emit = :00) must survive the boundary
    mem.addData(Event(1L, Timestamp.valueOf("2024-01-01 11:20:00"), 3.0))
    // an independent key is never suppressed by key 1's state
    mem.addData(Event(2L, ts(5), 9.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("debounced").as[Event].collect()
      .map(e => (e.user_id, e.value)).toSet
    assert(got == Set((1L, 1.0), (1L, 3.0), (2L, 9.0)))
  }

  test("debounce: kill at the state-store boundary replays to exactly-once emissions") {
    // The replay-safety gate the SCD sinks already have (StreamingSpec
    // injected mid-merge crash), for the flatMapGroupsWithState debounce:
    // crash INSIDE the sink's commit window (data files written, commit-log
    // record not), restart from the same checkpoint, and require the final
    // table to hold the exact single-run emission set — a state store
    // restored to the wrong version would either re-emit the suppressed
    // burst event (state loss) or swallow the post-crash emission (state
    // ahead of the offset log); a non-idempotent sink would double the
    // replayed batch's rows.
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("debounce_ckpt")
    val table = new graft.merge.ParquetTable(spark, tmpDir("debounce_table"))
    val mem = MemoryStream[Event]
    def runOnce(): Unit = {
      val q = EventTimeOps.debounce(mem.toDS(), cooldownMs = 60 * 60 * 1000)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], id: Long) =>
          table.append(batch.toDF(), txn = Some(("debounce_gate", id)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: burst — first event emits, the 40-min follower is suppressed
    mem.addData(Event(1L, ts(0), 1.0), Event(1L, ts(40), 2.0))
    runOnce()
    assert(table.read.count() == 1)
    // batch 2 (80 min after the last EMISSION: must emit) crashes in the
    // commit window
    mem.addData(Event(1L, Timestamp.valueOf("2024-01-01 11:20:00"), 3.0))
    table.onPreCommit = () => throw new RuntimeException("injected crash")
    intercept[Exception] { runOnce() }
    table.onPreCommit = () => ()
    // nothing visible (snapshot layout is atomic), then the restart replays
    // batch 2 against the restored pre-batch state and commits exactly once
    assert(table.read.count() == 1)
    runOnce()
    val got = table.read.as[Event].collect().map(e => (e.user_id, e.value)).toSeq.sorted
    assert(got == Seq((1L, 1.0), (1L, 3.0)), s"emissions after replay: $got")
    // a further restart with no new data changes nothing
    val v = table.latestVersion
    runOnce()
    assert(table.latestVersion == v && table.read.count() == 2)
  }

  test("ewmaAlerts: kill at the state-store boundary never duplicates an alert") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ewma_ckpt")
    val table = new graft.merge.ParquetTable(spark, tmpDir("ewma_table"))
    val mem = MemoryStream[Event]
    def runOnce(): Unit = {
      val q = EventTimeOps.ewmaAlerts(mem.toDS(), alpha = 0.2, k = 4.0, warmup = 5L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[EwmaAlert], id: Long) =>
          table.append(batch.toDF(), txn = Some(("ewma_gate", id)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1 trains the chart (no alerts — nothing appended, but the
    // batch still commits its state + offsets)
    mem.addData((0 until 8).map(i =>
      Event(1L, ts(i), if (i % 2 == 0) 9.0 else 11.0)): _*)
    runOnce()
    assert(!table.exists || table.read.count() == 0)
    // the spike batch crashes in the sink's commit window
    mem.addData(Event(1L, ts(10), 100.0))
    table.onPreCommit = () => throw new RuntimeException("injected crash")
    intercept[Exception] { runOnce() }
    table.onPreCommit = () => ()
    // restart: the batch replays against the restored chart state — the
    // alert lands EXACTLY once (a state store that advanced past the failed
    // batch would absorb the spike into the mean and emit nothing; a
    // non-idempotent sink would emit it twice)
    runOnce()
    val alerts = table.read.as[EwmaAlert].collect()
    assert(alerts.length == 1 && alerts.head.value == 100.0 && alerts.head.z > 4.0)
    // replay again: still exactly one
    runOnce()
    assert(table.read.count() == 1)
  }

  test("streamingFunnel: ordered completion within the window, first-touch, expiry resets") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import EventTimeOps.{TypedEvent, FunnelHit}
    val mem = MemoryStream[TypedEvent]
    val q = EventTimeOps.streamingFunnel(mem.toDS(),
        steps = Seq("view", "cart", "buy"), windowMs = 30 * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_hits").start()
    mem.addData(
      // user 1 completes in order within 20 min; the repeated "view" at
      // t=10 must NOT restart the clock (first-touch)
      TypedEvent(1L, ts(0), "view"), TypedEvent(1L, ts(5), "cart"),
      TypedEvent(1L, ts(10), "view"), TypedEvent(1L, ts(20), "buy"),
      // user 2: out of order (buy before cart) -> no hit
      TypedEvent(2L, ts(0), "view"), TypedEvent(2L, ts(5), "buy"),
      // user 3: completes but outside the 30-min window -> expired
      TypedEvent(3L, ts(0), "view"), TypedEvent(3L, ts(5), "cart"))
    q.processAllAvailable()
    mem.addData(TypedEvent(3L, Timestamp.valueOf("2024-01-01 10:45:00"), "buy"))
    q.processAllAvailable()
    val hits = spark.table("funnel_hits").as[FunnelHit].collect()
    assert(hits.length == 1, s"hits: ${hits.toSeq}")
    assert(hits(0).user_id == 1L && hits(0).latency_ms == 20 * 60 * 1000)
    // user 3's expired funnel reset: a fresh full chain converts
    mem.addData(
      TypedEvent(3L, Timestamp.valueOf("2024-01-01 11:00:00"), "view"),
      TypedEvent(3L, Timestamp.valueOf("2024-01-01 11:05:00"), "cart"),
      TypedEvent(3L, Timestamp.valueOf("2024-01-01 11:10:00"), "buy"))
    q.processAllAvailable()
    val after = spark.table("funnel_hits").as[FunnelHit].collect()
    q.stop()
    assert(after.length == 2)
    assert(after.map(_.user_id).sorted.toSeq == Seq(1L, 3L))
  }

  test("streamingFunnel: a cross-batch straggler older than the chain never advances it") {
    // Batch 1 applies view+cart (stage 2, lastTs=10:05). Batch 2 delivers a
    // LATE buy stamped 10:03 — before the cart it would claim to follow.
    // An ordered funnel must not emit (the old bug: a hit with end_ts
    // before the cart step, or even negative latency for ts < start).
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import EventTimeOps.{TypedEvent, FunnelHit}
    val mem = MemoryStream[TypedEvent]
    val q = EventTimeOps.streamingFunnel(mem.toDS(),
        steps = Seq("view", "cart", "buy"), windowMs = 60 * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_late").start()
    mem.addData(TypedEvent(1L, ts(0), "view"), TypedEvent(1L, ts(5), "cart"))
    q.processAllAvailable()
    mem.addData(TypedEvent(1L, ts(3), "buy")) // straggler: before the cart
    q.processAllAvailable()
    assert(spark.table("funnel_late").count() == 0,
      "an out-of-order buy must not complete an ordered funnel")
    // an in-order buy afterwards still completes the surviving chain
    mem.addData(TypedEvent(1L, ts(20), "buy"))
    q.processAllAvailable()
    val hits = spark.table("funnel_late").as[FunnelHit].collect()
    q.stop()
    assert(hits.length == 1 && hits(0).latency_ms == 20 * 60 * 1000)
  }

  test("streamingFunnel: kill at the state-store boundary — in-flight funnel survives, exactly-once hits") {
    // Same replay gate as debounce/ewmaAlerts: user 1's funnel is mid-flight
    // (view+cart applied) when the sink crashes inside the commit window of
    // the batch carrying "buy". A state store restored to the wrong version
    // would either lose the in-flight stages (no hit ever) or re-emit the
    // hit on replay (duplicate); the restart must deliver exactly one.
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import EventTimeOps.{TypedEvent, FunnelHit}
    val ckpt = tmpDir("funnel_ckpt")
    val table = new graft.merge.ParquetTable(spark, tmpDir("funnel_table"))
    val mem = MemoryStream[TypedEvent]
    def runOnce(): Unit = {
      val q = EventTimeOps.streamingFunnel(mem.toDS(),
          steps = Seq("view", "cart", "buy"), windowMs = 60 * 60 * 1000)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelHit], id: Long) =>
          table.append(batch.toDF(), txn = Some(("funnel_gate", id)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    mem.addData(TypedEvent(1L, ts(0), "view"), TypedEvent(1L, ts(5), "cart"))
    runOnce()
    assert(table.read.count() == 0) // in flight, nothing emitted yet
    mem.addData(TypedEvent(1L, ts(10), "buy"))
    table.onPreCommit = () => throw new RuntimeException("injected crash")
    intercept[Exception] { runOnce() }
    table.onPreCommit = () => ()
    assert(table.read.count() == 0) // atomic snapshot: crash left nothing
    runOnce() // replay batch against the restored pre-batch state
    val got = table.read.as[FunnelHit].collect()
    assert(got.length == 1 && got(0).user_id == 1L &&
      got(0).latency_ms == 10 * 60 * 1000, s"after replay: ${got.toSeq}")
    // restart with no new data: no further emissions, no version churn
    val v = table.latestVersion
    runOnce()
    assert(table.latestVersion == v && table.read.count() == 1)
  }

  test("windowedTopEvents: chained stateful aggs emit a closed window's top-k once") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = EventTimeOps.windowedTopEvents(
        mem.toDF().toDF("ts", "event_type"),
        "ts", "event_type", windowDur = "10 minutes",
        watermarkDelay = "0 seconds", k = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("win_topk").start()
    // window [10:00,10:10): a x3, b x2, c x1 -> top-2 = a, b
    mem.addData(
      (ts(1), "a"), (ts(2), "a"), (ts(3), "a"),
      (ts(4), "b"), (ts(5), "b"), (ts(6), "c"))
    q.processAllAvailable()
    // nothing emits while the window is open
    assert(spark.table("win_topk").count() == 0)
    // an event past the window end advances the watermark and closes it
    mem.addData((Timestamp.valueOf("2024-01-01 10:25:00"), "z"))
    q.processAllAvailable()
    val rows = spark.table("win_topk").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).sortBy(_._1)
    q.stop()
    assert(rows.toSeq == Seq((1L, "a", 3L), (2L, "b", 2L)),
      s"expected a=3 then b=2, got ${rows.toSeq}")
  }

  test("mapGroupsWithState sessionizer rolls sessions across the gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventTimeOps.sessionizeToMemory(mem.toDS(), "sessions", gapMs = 10 * 60 * 1000)
    // user 1: two events 5 min apart (same session)
    mem.addData(Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0))
    q.processAllAvailable()
    val s1 = spark.table("sessions").as[SessionUpdate].collect().last
    assert(s1.sessionId == 0L && s1.n_events == 2 && s1.session_value == 3.0)

    // 25 min later -> beyond the 10-min gap -> new session (same query,
    // state carried across micro-batches)
    mem.addData(Event(1L, ts(30), 7.0))
    q.processAllAvailable()
    val s2 = spark.table("sessions").as[SessionUpdate]
      .collect().filter(_.user_id == 1L).last
    q.stop()
    assert(s2.sessionId == 1L && s2.n_events == 1 && s2.session_value == 7.0)
  }
}
