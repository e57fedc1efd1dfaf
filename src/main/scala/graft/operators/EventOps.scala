package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over a (user, event_type, timestamp) log: ordered
  * conversion funnels and native session-window aggregation. Complements the
  * lag/running-sum sessionizer (SparkEntry q30) and the stateful streaming
  * sessionizers in [[graft.streaming.EventTimeOps]].
  */
object EventOps {

  /** Ordered conversion funnel: stage i counts users whose first
    * `stages(i)` event occurs AT OR AFTER their first qualifying
    * `stages(i-1)` event — the classic "view -> click -> purchase" funnel
    * where later stages must follow earlier ones in event time, not merely
    * co-occur.
    *
    * All per-user stage times are window minimums over ONE user partition:
    * a single shuffle on the user key, then each stage's column is a
    * conditional min referencing the previous stage's (same-partition)
    * result — no self-joins, no per-stage scans. The per-user frame then
    * collapses to one row per user and a single global aggregate emits one
    * row per stage with the step-conversion rate (stage_n / stage_{n-1},
    * 4dp, 0.0 when the previous stage is empty).
    */
  def conversionFunnel(df: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val w = Window.partitionBy(col(userCol))
    val staged = stages.zipWithIndex.foldLeft(df) { case (acc, (stage, i)) =>
      val cond =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(tsCol) >= col(s"__t${i - 1}")
      acc.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    val perUser = staged
      .select(col(userCol) +: stages.indices.map(i => col(s"__t$i")): _*)
      .distinct()
    // coalesce to 0: an EMPTY event log must yield n_users = 0 rows per
    // stage, not null-poisoned aggregates
    val totals = perUser.agg(
      coalesce(sum(when(col("__t0").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as("__n0"),
      stages.indices.tail.map(i =>
        coalesce(sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__n$i")): _*)
    val stageRows = stages.zipWithIndex.map { case (stage, i) =>
      val n = col(s"__n$i").cast("long")
      val prev = if (i == 0) n else col(s"__n${i - 1}").cast("long")
      struct(lit(i + 1).cast("long").as("stage_idx"), lit(stage).as("stage"),
        n.as("n_users"),
        when(prev === 0, lit(0.0))
          .otherwise(round(n.cast("double") / prev, 4)).as("step_rate"))
    }
    totals.select(explode(array(stageRows: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_users"),
        col("s.step_rate"))
  }

  /** Per-user gap-based sessions through Spark's NATIVE `session_window`
    * aggregation (the operator that also runs under Structured Streaming
    * with state-store-backed session merging — unlike the lag/running-sum
    * formulation, which is batch-only). One shuffle on (user, session);
    * session identity is the window start = the session's first event time.
    * Returns (user, session_start formatted, n_events, duration_us exact,
    * sum of `valueCol` 2dp). */
  /** Last-touch attribution: every conversion event credits the most recent
    * PRECEDING touch event (one of `touchTypes`) by the same user within
    * `windowSeconds`; conversions with no in-window touch report as
    * `(none)`. The carried "last touch" is a running `last(ignoreNulls)`
    * over a rows-frame ENDING AT THE PREVIOUS ROW — an O(n)-per-row frame
    * (unbounded-FOLLOWING frames are the O(n²) trap, PLANS.md r6), one
    * shuffle on the user key, ties at identical timestamps broken by event
    * id so the pick is deterministic. Returns one row per credited type:
    * (attributed_type, n_conversions, total_value 2dp). */
  def lastTouchAttribution(df: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, valueCol: String,
                           touchTypes: Seq[String], convType: String,
                           windowSeconds: Long, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).as("t"), col(typeCol).as("ty")))
    val attributed = df
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .withColumn("attributed_type",
        when(col("__lt").isNotNull &&
            unix_micros(col(tsCol)) - unix_micros(col("__lt.t"))
              <= windowSeconds * 1000000L,
          col("__lt.ty")).otherwise(lit("(none)")))
    attributed.groupBy("attributed_type")
      .agg(count(lit(1)).cast("long").as("n_conversions"),
        round(sum(col(valueCol)), 2).as("total_value"))
  }

  /** Markov removal-effect attribution — the data-driven alternative to
    * [[lastTouchAttribution]]'s positional rule: model each user's journey
    * as a first-order Markov chain over channels with absorbing (conv) and
    * (null) states, compute the chain's conversion probability from
    * (start), then re-compute it with each channel REMOVED (every
    * transition into it redirected to (null)); a channel's credit is the
    * relative conversion drop its removal causes (Anderl et al.'s removal
    * effect).
    *
    * Journeys: per user, events ordered by (ts, tie) up to and including
    * the FIRST `convType` event (later events are post-conversion noise);
    * users who never convert absorb in (null). Null users carry no
    * journey. The distributed pass ends at the transition-count table —
    * at most (|channels|+2)² rows — which is collected and iterated on
    * the driver `iters` times per scenario: a bounded k×k control-plane
    * collect, the same contract as the IVF centroid/codebook collects
    * ([[Similarity]]), never row-scale. Within each iteration the
    * per-state sum runs over targets in ASCENDING state order (and the
    * oracle sums an identically-ordered list), so the fp result is
    * engine-reproducible. Fixed `iters` power iterations rather than a
    * tolerance keep the result closed-form replayable — the
    * [[graft.operators.Graph.pageRank]] contract; 8 iterations bound the
    * walk at length 8, ample when journeys average a handful of steps.
    *
    * Output: one row per channel — base_conv (the unremoved chain's
    * conversion probability, repeated), removed_conv, removal_effect
    * = (base − removed)/base (null when base = 0). */
  def markovAttribution(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tieCol: String, convType: String,
                        iters: Int = 8): DataFrame = {
    require(iters > 0, "iters > 0")
    val START = "(start)"; val CONV = "(conv)"; val NULLS = "(null)"
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val ev = df.filter(col(userCol).isNotNull)
      .withColumn("rn", row_number().over(w))
      .select(col(userCol).as("u"), col(typeCol).as("ty"), col("rn"))
    val convRn = ev.filter(col("ty") === convType)
      .groupBy("u").agg(min(col("rn")).as("conv_rn"))
    val kept = ev.join(convRn, Seq("u"), "left")
      .filter(col("conv_rn").isNull || col("rn") <= col("conv_rn"))
      .select(col("u"),
        when(col("ty") === convType, lit(CONV)).otherwise(col("ty")).as("state"),
        col("rn"))
    val wk = Window.partitionBy(col("u")).orderBy(col("rn"))
    val seq = kept.withColumn("nxt", lead(col("state"), 1).over(wk))
    val tr = seq.filter(col("rn") === 1)
        .select(lit(START).as("f"), col("state").as("t"))
      .unionAll(seq.filter(col("nxt").isNotNull && col("state") =!= CONV)
        .select(col("state").as("f"), col("nxt").as("t")))
      .unionAll(seq.filter(col("nxt").isNull && col("state") =!= CONV)
        .select(col("state").as("f"), lit(NULLS).as("t")))
    val counts = tr.groupBy("f", "t").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("f").agg(sum(col("c")).as("tc"))
    // bounded (|channels|+2)^2 control-plane collect
    val matrix = counts.join(totals, "f")
      .select(col("f"), col("t"),
        (col("c").cast("double") / col("tc").cast("double")).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val byFrom = matrix.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq
    }
    val channels = matrix.flatMap(r => Seq(r._1, r._2)).distinct
      .filterNot(Set(START, CONV, NULLS)).sorted
    def absorb(removed: Option[String]): Double = {
      var p = Map.empty[String, Double].withDefaultValue(0.0)
      def value(t: String, cur: Map[String, Double]): Double =
        if (t == CONV) 1.0
        else if (t == NULLS) 0.0
        else if (removed.contains(t)) 0.0
        else cur.getOrElse(t, 0.0)
      for (_ <- 1 to iters) {
        p = byFrom.map { case (f, outs) =>
          f -> outs.foldLeft(0.0) { case (acc, (t, pr)) =>
            acc + pr * value(t, p)
          }
        }.toMap.withDefaultValue(0.0)
      }
      p(START)
    }
    val base = absorb(None)
    val spark = df.sparkSession
    import spark.implicits._
    // rounding through Spark's own round() so the oracle's replay rule
    // (shortest-repr HALF_UP) applies to these driver-computed doubles too
    channels.map(c => (c, base, absorb(Some(c))))
      .toSeq.toDF("channel", "__base", "__removed")
      .select(col("channel"),
        round(col("__base"), 6).as("base_conv"),
        round(col("__removed"), 6).as("removed_conv"),
        when(col("__base") > 0,
          round((col("__base") - col("__removed")) / col("__base"), 6))
          .as("removal_effect"))
  }

  /** First-order transition matrix of the event stream: for each
    * (from_type → to_type) pair of CONSECUTIVE events within a user's
    * timeline, the transition count and its share of all transitions —
    * the Markov-chain summary behind "what do users do after X"
    * next-action analysis and synthetic-journey generation.
    *
    * One shuffle on the user key (the `lead` window); the transition pair
    * table then collapses to at most |types|² rows, and the global total
    * joins back as a broadcast single row — no second pass over the
    * events. Ties in the order key break by `tieCol` (unique event id) so
    * the sequence, and therefore the matrix, is engine-reproducible. */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val tr = df
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col(typeCol).as("from_type"), col("to_type"))
    val counts = tr.groupBy("from_type", "to_type")
      .agg(count(lit(1)).cast("long").as("n_transitions"))
    val total = counts.agg(sum("n_transitions").cast("double").as("t"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_transitions").cast("double") / col("t"), 4))
      .drop("t")
  }

  /** Event-type co-occurrence support: for each unordered pair of event
    * types, how many users emitted BOTH at least once (order-free basket
    * analysis, vs [[transitionMatrix]]'s ordered adjacency).
    *
    * The (user, type) distinct table is the only corpus-sized state (one
    * shuffle); its self-join is keyed on the user id with `type_a <
    * type_b` keeping each pair once, and the output is at most
    * |types|·(|types|−1)/2 rows. Per-user fan-out is |types choose 2| —
    * bounded by the type vocabulary, not by the user's event count. */
  def eventCooccurrence(df: DataFrame, userCol: String,
                        typeCol: String): DataFrame = {
    val du = df.select(col(userCol).as("u"), col(typeCol).as("t")).distinct()
    du.join(du.select(col("u"), col("t").as("t2")), "u")
      .filter(col("t") < col("t2"))
      .groupBy(col("t").as("type_a"), col("t2").as("type_b"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }

  /** Daily active users with a trailing `windowDays`-day distinct-user
    * count (DAU/WAU when windowDays=7) — the activity/retention headline
    * series.
    *
    * Distinctness is resolved ONCE into the (day, user) table — bounded by
    * days × active users, far below the raw event count — and the trailing
    * window re-counts distinct users per anchor day by joining that table
    * to the broadcast day spine on a day-range predicate: trailing
    * distinct counts cannot be windowed (a user active twice in the window
    * must count once), so the spine join is the honest formulation. Cost
    * is |day-user| × windowDays rows through one aggregation; the spine
    * side is |days| rows, always broadcast. */
  def rollingActiveUsers(df: DataFrame, tsCol: String, userCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, "windowDays > 0")
    val du = df.select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct().localCheckpoint()
    val dau = du.groupBy("day").agg(count(lit(1)).cast("long").as("dau"))
    val spine = du.select(col("day").as("anchor")).distinct()
    val wau = du.join(broadcast(spine),
        col("day") >= date_sub(col("anchor"), windowDays - 1) &&
          col("day") <= col("anchor"))
      .groupBy("anchor")
      .agg(countDistinct(col("u")).cast("long").as("wau"))
    dau.join(wau, dau("day") === wau("anchor"))
      .select(col("day"), col("dau"), col("wau"))
  }

  /** Retention cohort matrix: users grouped by their FIRST active day
    * (the cohort), tracked for `horizonDays` — cell (cohort_day, k) is how
    * many of that cohort were active k days later and what fraction of the
    * cohort that is. The standard activation/retention report.
    *
    * Shapes: the (day, user) distinct table is resolved once (bounded by
    * days × active users); each user's cohort day is a min-aggregate over
    * it; the join back is keyed on the user id (hash join, AQE broadcasts
    * the cohort side when it fits); cohort sizes re-enter by a broadcast
    * join on the cohort day (|days| rows). Nothing after the first
    * distinct scales with raw event volume. */
  def retentionCohorts(df: DataFrame, tsCol: String, userCol: String,
                       horizonDays: Int = 7): DataFrame = {
    require(horizonDays >= 0, "horizonDays >= 0")
    val du = df.select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct().localCheckpoint()
    val cohorts = du.groupBy("u").agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).cast("long").as("cohort_size"))
    du.join(cohorts, "u")
      .withColumn("k", datediff(col("day"), col("cohort_day")))
      .filter(col("k") <= horizonDays)
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).cast("long").as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention",
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 4))
      .select(col("cohort_day"), col("k").cast("long").as("k"),
        col("n_active"), col("cohort_size"), col("retention"))
  }

  /** Top-k frequent event-type sequences of length 3 (sequential-pattern
    * mining, contiguous form): consecutive in-user trigrams of the event
    * stream, counted corpus-wide, top-k by support — "what three-step
    * paths dominate" without the exponential candidate lattice of full
    * sequential pattern mining (contiguity bounds patterns at one per
    * event).
    *
    * One user-key window produces both lookaheads in a single Window
    * operator; the trigram count table is |types|³-bounded and its top-k
    * rides the bounded [[graft.functions.TopKAgg]] — no rank window over
    * the pattern table. Ties break lexicographically on the pattern. */
  def topEventTrigrams(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String, k: Int): DataFrame = {
    require(k > 0, "k > 0")
    graft.functions.TopKAgg.register(df.sparkSession)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val tri = df
      .withColumn("t2", lead(col(typeCol), 1).over(w))
      .withColumn("t3", lead(col(typeCol), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col(typeCol), col("t2"), col("t3")).as("pattern"))
    val counts = tri.groupBy("pattern").agg(count(lit(1)).as("cnt"))
    counts
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("cnt")).as("nc"), col("pattern").as("p")), k).as("arr"))
      .select(posexplode(col("arr")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.p").as("pattern"), negate(col("col.nc")).cast("long").as("n_occurrences"))
  }

  /** Funnel latency report: for users who completed stage A then stage B
    * (first A before first B), the stage-to-stage conversion delay
    * distribution — count plus exact p50/p90 of the delay in seconds (the
    * rank rule of [[graft.operators.Stats.groupQuantiles]], single group).
    *
    * Per-user firsts are one grouped aggregation (two conditional mins —
    * no window, no self-join); the delay frame is ≤ one row per converted
    * user, and the quantiles ride `percentile_approx` at exact-retention
    * accuracy — a map-side-partial sketch aggregate that never sorts the
    * frame through one partition (the q110 contract: at this accuracy it
    * reproduces the quantile_disc rank rule the oracle runs; at true
    * 100 TB funnel sizes, lower the accuracy and accept the sketch's
    * documented rank error). */
  def funnelLatency(df: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromStage: String,
                    toStage: String): DataFrame = {
    val firsts = df.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === fromStage, col(tsCol))).as("ta"),
        min(when(col(typeCol) === toStage, col(tsCol))).as("tb"))
      .filter(col("ta").isNotNull && col("tb").isNotNull && col("ta") <= col("tb"))
      .select(col(userCol),
        // floor(), not integer `div` or a double->long cast: floor is the
        // one whole-second truncation both engines compute identically
        floor((unix_micros(col("tb")) - unix_micros(col("ta")))
          .cast("double") / lit(1e6)).cast("long").as("delay_s"))
    firsts.agg(count(lit(1)).cast("long").as("n_converted"),
        percentile_approx(col("delay_s"), array(lit(0.5), lit(0.9)),
          lit(1000000)).as("ps"))
      .select(col("n_converted"),
        element_at(col("ps"), 1).cast("long").as("p50_delay_s"),
        element_at(col("ps"), 2).cast("long").as("p90_delay_s"))
  }

  /** Hour-of-day uniformity test per event type: the 24-bin count profile
    * reduced to a chi-square statistic against the uniform expectation —
    * the seasonality/bot-traffic detector (χ² far above the df=23
    * reference says the type has strong diurnal structure or a scheduled
    * job behind it; the peak hour and its share say where). Statistic
    * only — no p-value table, the conventional reference is documented,
    * not enforced.
    *
    * One scan bins rows to (type, hour); the chi-square needs EMPTY hours
    * to contribute (0−e)²/e, so the |types|×24 frame is densified from a
    * broadcast 24-row spine before the per-type reduction. Every
    * aggregation after the scan is bounded by |types|×24; the peak hour
    * resolves with a max-count equi-join back onto that same small frame
    * (ties take the earliest hour) — no rank window. */
  def hourOfDayUniformity(df: DataFrame, typeCol: String,
                          tsCol: String): DataFrame = {
    val counts = df.filter(col(tsCol).isNotNull)
      .select(col(typeCol).as("t"), hour(col(tsCol)).cast("long").as("h"))
      .groupBy(col("t"), col("h")).agg(count(lit(1)).as("cnt"))
    val spine = df.sparkSession.range(0, 24).select(col("id").as("h"))
    val dense = counts.select(col("t")).distinct()
      .crossJoin(broadcast(spine))
      .join(counts, Seq("t", "h"), "left")
      .select(col("t"), col("h"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .localCheckpoint() // feeds the chi2 agg AND the peak join — bin once
    val stats = dense.groupBy(col("t"))
      .agg(sum(col("cnt")).cast("long").as("n"),
        max(col("cnt")).as("__mx"))
    val chi = dense.join(broadcast(stats), "t")
      .withColumn("__e", col("n").cast("double") / 24.0)
      .groupBy(col("t"))
      .agg(max(col("n")).as("n"), max(col("__mx")).as("__mx"),
        sum((col("cnt") - col("__e")) * (col("cnt") - col("__e")) / col("__e"))
          .as("__chi2"))
    val peak = dense.join(broadcast(stats), "t")
      .filter(col("cnt") === col("__mx"))
      .groupBy(col("t")).agg(min(col("h")).as("peak_hour"))
    chi.join(broadcast(peak), "t")
      .select(col("t").as("event_type"), col("n"),
        round(col("__chi2"), 4).as("chi2"),
        col("peak_hour"),
        round(col("__mx").cast("double") / col("n").cast("double"), 6)
          .as("peak_share"))
  }

  def sessionWindowAgg(df: DataFrame, userCol: String, tsCol: String,
                       valueCol: String, gap: String): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"),
        round(sum(col(valueCol)), 2).as("session_value"))
      .select(col(userCol),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("duration_us"), col("session_value"))

  /** Behavioral-regularity triage: the `topN` users whose event streams
    * look least human — low Shannon entropy over event types (always the
    * same action) AND low coefficient of variation on inter-event gaps
    * (metronome timing). Real users are bursty and varied; scripts and
    * scrapers are neither — this is the first-cut bot filter an events
    * pipeline runs before engagement stats, and a curation pipeline runs
    * before trusting behavioral signals as training labels.
    *
    * `score = entropy + gap_cv`, ascending (low = suspicious). Entropy
    * uses the identity `H = ln(n) − Σ c·ln(c)/n` (c = per-type counts),
    * so every input to the float math is an exact integer; the gap CV is
    * derived from integer second-resolution moments (n, Σg, Σg², g ≤
    * corpus span in seconds, so Σg² stays in BIGINT range) — no
    * engine-specific `stddev` algorithm in the replay path. Users need
    * ≥ `minEvents` events and a positive total gap (all-simultaneous
    * streams have no timing signal and report null CV — excluded).
    *
    * Scale: per-user lag window (PARTITIONED — no global sort), two
    * grouped aggregations, and a TakeOrdered top-N cut on the rounded
    * score with user-id tie-break (deterministic under float summation).
    * State per user is one row of moments. */
  def userRegularity(df: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, minEvents: Int = 5,
                     topN: Int = 20): DataFrame = {
    require(minEvents >= 2, "minEvents >= 2 (CV needs two gaps)")
    require(topN >= 1, "topN >= 1")
    val base = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("t"),
        unix_micros(col(tsCol)).as("us"))
      // INTEGER div to whole seconds (freshnessReport's exactness rule)
      .withColumn("s", expr("us div 1000000")).drop("us")
    // entropy moments: per-(user, type) counts -> Σ c·ln c per user
    val ent = base.groupBy(col("u"), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("u"))
      .agg(count(lit(1)).cast("long").as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clnc"))
    // gap moments: integer seconds, exact Σg / Σg²
    val w = Window.partitionBy(col("u")).orderBy(col("s"))
    val gaps = base.select(col("u"),
        (col("s") - lag(col("s"), 1).over(w)).as("g"))
      .filter(col("g").isNotNull)
      .groupBy(col("u"))
      .agg(count(lit(1)).as("ng"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("sg2"))
    val n = col("ng") + lit(1) // events = gaps + 1
    val mean = col("sg").cast("double") / col("ng").cast("double")
    val variance = (col("sg2").cast("double") -
      col("sg").cast("double") * col("sg").cast("double") /
        col("ng").cast("double")) / col("ng").cast("double")
    val entropy = log(n.cast("double")) - col("clnc") / n.cast("double")
    ent.join(gaps, "u")
      .filter(n >= minEvents && col("sg") > 0)
      .select(col("u").as(userCol), n.cast("long").as("n_events"),
        col("n_types"),
        round(entropy, 4).as("entropy"),
        round(sqrt(greatest(variance, lit(0.0))) / mean, 4).as("gap_cv"),
        round(entropy + sqrt(greatest(variance, lit(0.0))) / mean, 4)
          .as("score"))
      .orderBy(col("score"), col(userCol))
      .limit(topN)
  }

  /** Kaplan–Meier user-lifetime curve with right-censoring: per observed
    * lifetime day, the at-risk count, deaths, censored exits, and the
    * product-limit survival estimate `S(t) = Π_{s≤t} (1 − d_s/r_s)` — the
    * honest "how long do users stay?" curve. The naive churn histogram
    * treats every silent user as dead; KM counts users still active near
    * the corpus edge (last event within `censorDays` of the corpus max)
    * as CENSORED — they exit the at-risk pool without being deaths, which
    * is exactly the correction that keeps fresh cohorts from dragging the
    * curve down.
    *
    * Lifetime = whole days between a user's first and last event. The
    * at-risk count is a reverse cumulative sum over the |days|-row curve
    * frame; the product rides `exp(Σ ln(1−d/r))` over positive terms with
    * a cumulative went-to-zero flag (a day where everyone at risk dies
    * pins S at 0 from there on — `ln(0)` never evaluates). All counts are
    * exact integers; windows scan the curve frame (bounded by the corpus
    * SPAN in days), never user rows — the per-user reduction is one
    * grouped min/max. */
  def kaplanMeierRetention(df: DataFrame, userCol: String, tsCol: String,
                           censorDays: Int = 3): DataFrame = {
    require(censorDays >= 1, "censorDays >= 1")
    val users = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("first_d"),
        max(to_date(col(tsCol))).as("last_d"))
    val end = users.agg(max(col("last_d")).as("cend"))
    val lives = users.crossJoin(broadcast(end))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("t"),
        (datediff(col("cend"), col("last_d")) < censorDays).as("cens"))
    val byDay = lives.groupBy(col("t"))
      .agg(sum(when(col("cens"), 0L).otherwise(1L)).as("d"),
        sum(when(col("cens"), 1L).otherwise(0L)).as("c"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay.withColumn("at_risk", sum(col("d") + col("c")).over(wDesc))
      .withColumn("term",
        lit(1.0) - col("d").cast("double") / col("at_risk").cast("double"))
      .withColumn("zeroed",
        max(when(col("term") === 0.0, 1L).otherwise(0L)).over(wAsc))
      .withColumn("lnsum",
        sum(when(col("term") > 0, log(col("term")))).over(wAsc))
      .select(col("t").as("day"), col("at_risk"), col("d").as("deaths"),
        col("c").as("censored"),
        round(when(col("zeroed") === 1, 0.0)
          .otherwise(exp(coalesce(col("lnsum"), lit(0.0)))), 6)
          .as("survival"))
  }

  /** Watermark-lateness profile: for each stream (key) and a grid of
    * candidate watermark delays, how many events a Structured-Streaming
    * watermark at that delay would DROP — the number you need BEFORE
    * setting `withWatermark`, answered from the batch log. An event is
    * late by (max event-time already seen at its arrival) − (its event
    * time); it survives a watermark of W iff late_by ≤ W. Arrival order
    * is the `arrivalCol` (monotone ingest id); event time is `tsCol`.
    *
    * One partitioned running-max window per stream + one grid explode of
    * the BOUNDED (key, late-bucket) aggregate — lateness is bucketed to
    * the grid first, so the exploded frame is keys × |grid|, never
    * events × |grid|. Counts exact; one division per cell. */
  def latenessProfile(df: DataFrame, keyCol: String, arrivalCol: String,
                      tsCol: String,
                      gridSeconds: Seq[Long] = Seq(0L, 60L, 300L, 900L,
                        3600L)): DataFrame = {
    require(gridSeconds.nonEmpty && gridSeconds == gridSeconds.sorted &&
      gridSeconds.distinct == gridSeconds, "grid ascending, distinct")
    val w = Window.partitionBy(col("k")).orderBy(col("arr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = df.filter(col(tsCol).isNotNull && col(arrivalCol).isNotNull)
      .select(col(keyCol).as("k"), col(arrivalCol).as("arr"),
        unix_timestamp(col(tsCol)).as("ts"))
      .withColumn("late_by",
        greatest(lit(0L), coalesce(max(col("ts")).over(w) - col("ts"),
          lit(0L))))
    // bucket = the SMALLEST grid watermark that keeps the event (or null
    // if even the largest drops it); the exploded spine is keys x grid
    val bucket = gridSeconds.foldRight(lit(null).cast("long")) {
      case (g, rest) => when(col("late_by") <= g, lit(g)).otherwise(rest)
    }
    val perBucket = late.groupBy(col("k"), bucket.as("kept_at"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(eager = false) // totals + the grid join
    val tot = perBucket.groupBy(col("k"))
      .agg(sum(col("n")).cast("long").as("n_events"))
    val grid = perBucket.select(col("k")).distinct()
      .withColumn("watermark_s",
        explode(array(gridSeconds.map(lit): _*)))
    grid.join(perBucket, Seq("k"), "left")
      .groupBy(col("k"), col("watermark_s"))
      // conditional sum, not a filter: a (key, watermark) cell with zero
      // drops must report 0, not disappear
      .agg(sum(when(col("kept_at").isNull ||
        col("kept_at") > col("watermark_s"), col("n")).otherwise(0L))
        .cast("long").as("n_dropped"))
      .join(tot, Seq("k"))
      .select(col("k").as(keyCol), col("watermark_s"), col("n_dropped"),
        col("n_events"),
        round(col("n_dropped").cast("double") /
          col("n_events").cast("double"), 6).as("drop_rate"))
  }

  /** Growth accounting (the "new / retained / resurrected / churning"
    * ledger): classify every active (user, day) by the user's PREVIOUS
    * active day — `new_users` (none), `retained` (gap ≤ `gapDays`),
    * `resurrected` (gap > `gapDays`) — and flag `churning` actives whose
    * NEXT activity is more than `gapDays` out (or absent). DAU =
    * new + retained + resurrected by construction, so the report
    * decomposes every DAU move into its cause — the standard growth ledger.
    *
    * The last `gapDays` of the observation window right-censor `churning`
    * (a user quiet "so far" may yet return); that column reads as "at risk
    * as of the data's edge", the standard caveat. Shape: events collapse
    * once to the distinct (user, day) spine (bounded by users × active
    * days); lag/lead run per-user over that spine (partitioned window,
    * each user's slice is their active-day count); one bounded groupBy on
    * day. Nothing after the first distinct scales with raw event rows. */
  def growthAccounting(df: DataFrame, userCol: String, tsCol: String,
                       gapDays: Int = 7): DataFrame = {
    require(gapDays >= 1, "gapDays >= 1")
    val du = df.filter(col(tsCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val w = Window.partitionBy(col("u")).orderBy(col("day"))
    du.withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(count(lit(1)).cast("long").as("dau"),
        sum(when(col("prev").isNull, 1L).otherwise(0L))
          .cast("long").as("new_users"),
        sum(when(col("prev").isNotNull &&
          datediff(col("day"), col("prev")) <= gapDays, 1L).otherwise(0L))
          .cast("long").as("retained"),
        sum(when(col("prev").isNotNull &&
          datediff(col("day"), col("prev")) > gapDays, 1L).otherwise(0L))
          .cast("long").as("resurrected"),
        sum(when(col("nxt").isNull ||
          datediff(col("nxt"), col("day")) > gapDays, 1L).otherwise(0L))
          .cast("long").as("churning"))
  }
}
