package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators (beyond the reference, which has no
  * watermarks or stateful ops — SURVEY §2.12): watermarked tumbling/sliding
  * window aggregation and a mapGroupsWithState sessionizer. These are the
  * streaming twins of the batch q29/q30 shapes, so the same business logic
  * runs in either mode.
  *
  * Scale: windowed aggregation state is partitioned by (window, keys) and
  * bounded by the watermark horizon; the sessionizer keeps one small state
  * row per active key with a processing-time timeout.
  */
object EventTimeOps {

  /** Watermarked tumbling-window count/sum over an event stream. Works on
    * both static and streaming frames (watermark is a no-op on static). */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
                  valueCol: String, windowLength: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Watermarked stream-stream interval join: each left event matched to
    * right events of the same key with `rightTs` in [leftTs, leftTs +
    * within]. Both sides carry watermarks and the join condition bounds the
    * time range in BOTH directions, so the state store holds only the
    * watermark horizon of each side — the requirement for a stream-stream
    * join to run unbounded (Spark refuses ap append-mode stream-stream join
    * without it). Works identically on static frames (watermarks no-op),
    * which is how the oracle-gated batch twin (q47 range join) pins the
    * semantics.
    *
    * Returns the aliased join ("l", "r"); callers project qualified columns
    * (`col("l.user_id")`). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   within: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  // -- mapGroupsWithState sessionizer -----------------------------------

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(sessionId: Long, lastTs: Long, n: Long, sum: Double)
  final case class SessionUpdate(user_id: Long, sessionId: Long, n_events: Long,
                                 session_value: Double, closed: Boolean)

  /** Gap-based sessionization with explicit state: events more than `gapMs`
    * apart start a new session (the streaming analogue of the batch lag +
    * running-sum sessionizer, q30). Emits the CURRENT session per key per
    * trigger.
    *
    * API limit: mapGroupsWithState returns ONE value per key per batch, so
    * when a batch itself spans a gap, only the newest session is emitted —
    * a session that both opened and closed inside one batch is not reported.
    * Use [[sessionizeFlat]] when every closed session must be emitted.
    *
    * `idleTimeout=true` arms a processing-time timeout that closes idle
    * sessions — use it only with a real periodic trigger: re-arming a
    * timeout every batch under the default as-fast-as-possible trigger makes
    * the engine schedule timeout-check batches in a busy loop. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
                 idleTimeout: Boolean = false)
                (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0L) {
              // tombstone expired: free the state (the counter is lost, but
              // two consecutive idle periods passed — document as the bound)
              state.remove()
              SessionUpdate(userId, s.sessionId, 0L, 0.0, closed = true)
            } else {
              // close the session but KEEP a tombstone carrying the counter,
              // so the user's next session doesn't restart at id 0 and
              // collide with long-closed sessions downstream
              state.update(SessionState(s.sessionId + 1, Long.MinValue, 0L, 0.0))
              state.setTimeoutDuration(gapMs * 8)
              SessionUpdate(userId, s.sessionId, s.n, s.sum, closed = true)
            }
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
            sorted.foreach { e =>
              val t = e.ts.getTime
              s = if (s.n == 0L || t - s.lastTs <= gapMs)
                s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1, sum = s.sum + e.value)
              else // gap exceeded: roll to a new session
                SessionState(s.sessionId + 1, t, 1L, e.value)
            }
            state.update(s)
            if (idleTimeout) state.setTimeoutDuration(gapMs)
            SessionUpdate(userId, s.sessionId, s.n, s.sum, closed = false)
          }
      }
  }

  /** Append-mode sessionizer: emits a session ONLY when it closes (the next
    * event arrives beyond the gap), keeping the open session in state —
    * `flatMapGroupsWithState`, the shape downstream append-only sinks need
    * (each closed session is final, no updates to retract). */
  def sessionizeFlat(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000)
                    (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
          val closed = Seq.newBuilder[SessionUpdate]
          sorted.foreach { e =>
            val t = e.ts.getTime
            s = if (s.n == 0L || t - s.lastTs <= gapMs)
              s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1, sum = s.sum + e.value)
            else {
              closed += SessionUpdate(userId, s.sessionId, s.n, s.sum, closed = true)
              SessionState(s.sessionId + 1, t, 1L, e.value)
            }
          }
          state.update(s)
          closed.result().iterator
      }
  }

  final case class EwmaState(mean: Double, varr: Double, n: Long, lastTs: Long)
  final case class EwmaAlert(user_id: Long, ts: Timestamp, value: Double,
                             ewma: Double, sigma: Double, z: Double)

  /** Streaming per-key anomaly detector: each key maintains an
    * exponentially-weighted moving mean and variance of its value stream
    * (EWMA / EWMV, the standard streaming control chart), and an alert row
    * is EMITTED (append mode) whenever an arriving value deviates from the
    * prediction by more than `k`·σ — the live data-quality tripwire a
    * 100 TB ingest runs beside its pipelines (volume collapse, metric
    * spikes, stuck-sensor repeats).
    *
    * Why `flatMapGroupsWithState` and not a windowed aggregate: the alert
    * decision needs the PRE-update state at each single event (value vs the
    * mean of everything before it), which no associative window aggregate
    * exposes. State is three doubles and two longs per key — bounded,
    * checkpoint-friendly, skew-free (one key's state never exceeds a few
    * words no matter how hot the key). Within a batch, events apply in
    * (ts, value) order, so replay determinism matches the sorted-batch
    * contract of [[sessionize]]. The first `warmup` events per key train
    * the chart silently (cold-start means everything is "anomalous"). */
  def ewmaAlerts(events: Dataset[Event], alpha: Double = 0.2,
                 k: Double = 4.0, warmup: Long = 5L)
                (implicit spark: SparkSession): Dataset[EwmaAlert] = {
    import spark.implicits._
    require(alpha > 0 && alpha <= 1, "alpha in (0,1]")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[EwmaState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var s = state.getOption.getOrElse(
            EwmaState(0.0, 0.0, 0L, Long.MinValue))
          val alerts = Seq.newBuilder[EwmaAlert]
          sorted.foreach { e =>
            val sigma = math.sqrt(s.varr)
            if (s.n >= warmup && sigma > 0 &&
                math.abs(e.value - s.mean) > k * sigma)
              alerts += EwmaAlert(userId, e.ts, e.value, s.mean, sigma,
                (e.value - s.mean) / sigma)
            // EWMA/EWMV update (West 1979 incremental form); the first
            // event seeds the mean so variance starts at 0, not mean^2
            val d = e.value - s.mean
            val m = if (s.n == 0L) e.value else s.mean + alpha * d
            val v = if (s.n == 0L) 0.0
                    else (1 - alpha) * (s.varr + alpha * d * d)
            s = EwmaState(m, v, s.n + 1, e.ts.getTime)
          }
          state.update(s)
          alerts.result().iterator
      }
  }

  final case class DebounceState(lastEmitTs: Long)

  /** Streaming per-key debounce: emit the FIRST event of each key, then
    * suppress everything inside `cooldownMs` of the last emission — the
    * alert-fatigue / burst-collapse stage placed after a detector like
    * [[ewmaAlerts]] (one incident, one page) or in front of a per-event
    * webhook. Append mode: an emitted event is final, suppression is
    * silent.
    *
    * State is ONE long per key (the last emission time) — smaller than
    * any windowed-dedup buffer and immune to hot keys; a windowed
    * `dropDuplicates` can't express this because suppression depends on
    * the last EMITTED event, not on equality with any buffered one
    * (three bursts 40 s apart under a 60 s cooldown emit #1 and #3:
    * the decision chain is inherently sequential). In-batch events apply
    * in (ts, value) order — the sorted-batch replay contract shared by
    * the sessionizers. */
  def debounce(events: Dataset[Event], cooldownMs: Long)
              (implicit spark: SparkSession): Dataset[Event] = {
    import spark.implicits._
    require(cooldownMs > 0, "cooldownMs > 0")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[DebounceState, Event](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Event], state: GroupState[DebounceState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var s = state.getOption.getOrElse(DebounceState(Long.MinValue))
          val out = Seq.newBuilder[Event]
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (s.lastEmitTs == Long.MinValue || t - s.lastEmitTs >= cooldownMs) {
              out += e
              s = DebounceState(t)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelState(stage: Int, startTs: Long, lastTs: Long)
  final case class FunnelHit(user_id: Long, start_ts: Timestamp,
                             end_ts: Timestamp, latency_ms: Long)

  /** Streaming ordered-funnel detector: emit one row per key each time the
    * full `steps` sequence completes within `windowMs` of the FIRST step —
    * the live twin of the batch [[graft.operators.EventOps.conversionFunnel]]
    * (which reports aggregate stage counts after the fact; this fires the
    * moment a user converts, e.g. to trigger a fulfillment action or an
    * online metric).
    *
    * Per key the state is (current stage, funnel start time) — two words,
    * bounded and hot-key-immune like [[debounce]]'s. Advancement rules:
    * first-touch (a repeated earlier step never restarts a funnel in
    * progress — the earliest qualifying chain wins, matching the batch
    * operator's first-event minimums); an expired funnel (now − start >
    * window) resets BEFORE the current event applies, so a late step-0
    * event starts a fresh attempt; completion emits and resets, so
    * back-to-back conversions each count. Why flatMapGroupsWithState: the
    * decision at each event depends on the key's unbounded-in-time
    * prior chain (stream-stream interval joins would need |steps|−1
    * cascaded joins, each buffering a window of BOTH sides). In-batch
    * events apply in (ts, event_type) order — the sorted-batch replay
    * contract shared by every stateful operator here. */
  def streamingFunnel(events: Dataset[TypedEvent], steps: Seq[String],
                      windowMs: Long)
                     (implicit spark: SparkSession): Dataset[FunnelHit] = {
    import spark.implicits._
    require(steps.length >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.length == steps.length, "steps must be distinct")
    require(windowMs > 0, "windowMs > 0")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          var s = state.getOption.getOrElse(
            FunnelState(0, Long.MinValue, Long.MinValue))
          val hits = Seq.newBuilder[FunnelHit]
          sorted.foreach { e =>
            val t = e.ts.getTime
            // an event older than the chain's last accepted step is a
            // cross-batch straggler: an "ordered" funnel must never advance
            // on it (it would emit end_ts < the prior step's time — or even
            // < start_ts, a negative-latency hit)
            if (s.stage == 0 || t >= s.lastTs) {
              if (s.stage > 0 && t - s.startTs > windowMs)
                s = FunnelState(0, Long.MinValue, Long.MinValue) // expired
              if (s.stage == 0) {
                if (e.event_type == steps.head) s = FunnelState(1, t, t)
              } else if (e.event_type == steps(s.stage)) {
                if (s.stage + 1 == steps.length) {
                  hits += FunnelHit(userId, new Timestamp(s.startTs), e.ts,
                    t - s.startTs)
                  s = FunnelState(0, Long.MinValue, Long.MinValue)
                } else s = FunnelState(s.stage + 1, s.startTs, t)
              }
            }
          }
          state.update(s)
          hits.result().iterator
      }
  }

  /** Streaming per-window top-k event types: two chained stateful
    * aggregations in append mode — watermarked tumbling-window counts per
    * type, then the bounded [[graft.functions.TopKAgg]] reduces each
    * window's count table to its k heaviest types the moment the watermark
    * closes the window. The live "what dominated the last hour" board.
    *
    * Why this shape at scale: the first aggregation's state is
    * |windows|×|types| counters (bounded by the watermark horizon), and the
    * second carries k entries per open window — never a full sort of the
    * type space, exactly the q90 heavy-hitter contract made incremental.
    * Chained stateful aggregations require append mode + the watermark
    * (Spark's multi-stateful-operator support); results emit once per
    * CLOSED window, which is the semantics a downstream alert wants. */
  def windowedTopEvents(events: DataFrame, tsCol: String, typeCol: String,
                        windowDur: String, watermarkDelay: String, k: Int)
                       (implicit spark: SparkSession): DataFrame = {
    require(k > 0, "k > 0")
    graft.functions.TopKAgg.register(spark)
    val counts = events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(typeCol).as("t"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy(col("w"))
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("cnt")).as("nc"), col("t").as("t")), k).as("arr"))
      .select(col("w.start").as("window_start"), posexplode(col("arr")))
      .select(col("window_start"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.t").as(typeCol),
        negate(col("col.nc")).cast("long").as("cnt"))
  }

  // -- streaming HLL distinct -------------------------------------------

  final case class HllState(regs: Array[Byte], nEvents: Long)
  final case class HllUpdate(event_type: String, n_events: Long,
                             hll_distinct: Double)

  /** First 60 bits of md5 (== the batch pipeline's
    * `conv(substring(md5(s),1,15),16,10)`): big-endian first 8 digest
    * bytes, low nibble dropped. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Streaming distinct-user estimate per event type: the
    * [[graft.operators.Sketches.hllDistinct]] register pipeline as
    * mapGroupsWithState state — `m` bytes per key FOREVER, versus the
    * exact streaming `dropDuplicates` whose state grows with every new
    * user until the watermark evicts it (and unbounded without one).
    * Emits the running (n_events, estimate) per key per trigger.
    *
    * Replay safety is STRUCTURAL here: register max-merge is monotone and
    * idempotent, so a replayed batch restored against pre-batch state
    * reconverges to the identical registers — the estimate can never
    * double-count a crash window (HllStreamSpec injects the same
    * mid-commit crash as the debounce/EWMA gates). The estimate is
    * bit-identical to the batch operator's on the same values
    * (same md5-60-bit hash, same scaled-integer harmonic sum — the
    * parity spec pins stream == batch). */
  def streamingHllDistinct(events: Dataset[TypedEvent], m: Int = 256)
                          (implicit spark: SparkSession): Dataset[HllUpdate] = {
    import spark.implicits._
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val regBits = graft.operators.Sketches.hllRegBits(m)
    val maxRho = graft.operators.Sketches.hllMaxRho(m)
    val scaleC = graft.operators.Sketches.hllScaleC(m)
    events.groupByKey(_.event_type)
      .mapGroupsWithState[HllState, HllUpdate](GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[TypedEvent], state: GroupState[HllState]) =>
          val prev = state.getOption.getOrElse(HllState(new Array[Byte](m), 0L))
          val regs = prev.regs.clone() // never mutate the store's array
          var n = prev.nEvents
          batch.foreach { e =>
            val h = hash60(e.user_id.toString)
            val reg = (h & (m - 1)).toInt
            val rest = h >>> regBits
            val rho = if (rest == 0L) maxRho
              else maxRho - (64 - java.lang.Long.numberOfLeadingZeros(rest))
            if (rho > regs(reg)) regs(reg) = rho.toByte
            n += 1
          }
          state.update(HllState(regs, n))
          // scaled-integer harmonic estimate, identical to the batch op
          var np = 0L
          var scaled = 0L
          var i = 0
          while (i < m) {
            if (regs(i) > 0) { np += 1; scaled += 1L << (maxRho - regs(i)) }
            i += 1
          }
          val total = (scaled + (m - np) * (1L << maxRho)).toDouble
          val eRaw = scaleC / total
          val zeros = m - np
          val est = if (eRaw <= 2.5 * m && zeros > 0)
            m.toDouble * math.log(m.toDouble / zeros) else eRaw
          // java BigDecimal.valueOf = shortest-repr HALF_UP, exactly
          // Spark's round(x, 2) (scala's BigDecimal(double) would round
          // the full binary expansion and diverge on ties)
          HllUpdate(key, n, java.math.BigDecimal.valueOf(est)
            .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())
      }
  }

  /** Convenience: run the sessionizer over a memory/file stream and collect
    * into an in-memory sink table (update mode — state emits per trigger;
    * drive with processAllAvailable in tests). */
  def sessionizeToMemory(events: Dataset[Event], queryName: String,
                         gapMs: Long = 30L * 60 * 1000)
                        (implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    sessionize(events, gapMs)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
}
