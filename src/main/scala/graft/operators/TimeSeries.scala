package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization for event streams: resampling onto a fixed
  * grid with forward fill or linear interpolation — the step that turns
  * irregular event data into the fixed-interval sequences a training
  * pipeline consumes. */
object TimeSeries {

  /** Shared resample prelude: per-(key, bucket) last observation (the q06
    * windowed-dedup shape, deterministic under equal timestamps) and the
    * per-key spine (one `sequence()` per key exploded to its own grid —
    * array length = the key's span / step, never the global span). The
    * observation table is checkpointed so the dedup runs once for the
    * spine bounds and the join side. */
  private def lastObsAndSpine(df: DataFrame, keyCol: String, tsCol: String,
                              valueCol: String, tieCol: String,
                              step: String): (DataFrame, DataFrame) = {
    // the grid stride must EQUAL the bucket truncation granularity, or
    // observations land in buckets the spine never visits (silently
    // filling stale values over real data) — so only "1 <unit>" steps
    // with a valid date_trunc unit are accepted
    val parts = step.trim.split("\\s+")
    val validUnits = Set("minute", "hour", "day", "week", "month", "quarter", "year")
    require(parts.length == 2 && parts(0) == "1" && validUnits(parts(1)),
      s"""step must be "1 <unit>" with unit in ${validUnits.mkString("/")}, got "$step" — """ +
        "the spine stride must match the bucket truncation granularity")
    val unit = parts(1)
    val bucketed = df.select(col(keyCol).as("k"),
      date_trunc(unit, col(tsCol)).as("bucket"),
      col(tsCol).as("ts"), col(valueCol).as("v"), col(tieCol).as("tie"))
    val lastObs = bucketed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k"), col("bucket"))
          .orderBy(col("ts").desc, col("tie").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("bucket"), col("v"))
      .localCheckpoint()
    // pinned-width exchange on the spine key (r18): the per-key span
    // aggregate is tiny in BYTES but everything downstream — the spine
    // EXPLODE, the observation join, and the resample windows — inherits
    // its partitioning, so AQE (which sizes by bytes and cannot see the
    // explode fan-out) coalesced the whole resample onto ONE task
    // (measured: a 1-task 1.9-2.3 s final stage on the q113 gate with 31
    // cores idle). The pin must sit HERE, on the UnknownPartitioning
    // checkpoint scan, where it is neither redundant (so the optimizer
    // keeps it) nor coalescable (REPARTITION_BY_NUM) — a repartition
    // after the join is eliminated as redundant because this aggregate's
    // hash(k) partitioning already propagates there. Width derives from
    // the cluster, never a constant (guide §2.5).
    val n = df.sparkSession.sparkContext.defaultParallelism
    val spine = lastObs.repartition(n, col("k")).groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"),
        explode(sequence(col("b0"), col("b1"), expr(s"INTERVAL $step"))).as("bucket"))
    (lastObs, spine)
  }

  /** Resample each key's events onto a `step` grid from its first to its
    * last bucket, carrying the last observed value forward across empty
    * buckets.
    *
    * Three bounded stages, all partitioned on the key: the per-bucket
    * dedup, the per-key spine, and one running `last(value, ignoreNulls)`
    * window per key. Nothing is ever quadratic and every shuffle is on the
    * key; a key's cost is proportional to ITS span, so sparse keys stay
    * cheap. The leading bucket of each key always holds an observation
    * (the spine starts at the first event), so forward fill never emits
    * null. */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, tieCol: String,
                   step: String = "1 hour"): DataFrame = {
    val (lastObs, spine) = lastObsAndSpine(df, keyCol, tsCol, valueCol, tieCol, step)
    val fillW = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(lastObs, Seq("k", "bucket"), "left")
      .withColumn("filled_v", last(col("v"), ignoreNulls = true).over(fillW))
      .withColumn("is_observed", col("v").isNotNull)
      .select(col("k").as(keyCol), col("bucket"), col("filled_v"), col("is_observed"))
  }

  /** Resample with LINEAR INTERPOLATION across empty buckets — the other
    * standard regularization mode (sensor/metric series where holding the
    * last value flat would bias downstream aggregates). Observed buckets
    * keep their exact value; an empty bucket gets
    * `pv + (nv - pv) * (t - tp) / (tn - tp)` between its neighboring
    * observations. Two RUNNING windows per key: a backward
    * `last(ignoreNulls)` pair for the previous observation, and — for the
    * next observation — the same running frame over the REVERSED bucket
    * order. NOT `first(ignoreNulls)` over currentRow..unboundedFollowing:
    * Spark evaluates unbounded-FOLLOWING frames by re-scanning from the
    * current row to the partition end for every row, O(n^2) per key
    * (measured 18 s vs ~1 s on the q113 gate at sf0.1); a running frame
    * over a descending sort computes the identical value in O(n) at the
    * cost of one extra per-partition sort. Gaps are always interior (the
    * spine spans first..last observation), so both neighbors exist and
    * the interpolation never divides by zero. */
  def resampleInterpolate(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, tieCol: String,
                          step: String = "1 hour"): DataFrame = {
    val (lastObs, spine) = lastObsAndSpine(df, keyCol, tsCol, valueCol, tieCol, step)
    val back = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdRun = Window.partitionBy(col("k")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def secs(c: org.apache.spark.sql.Column) = unix_timestamp(c).cast("double")
    spine.join(lastObs, Seq("k", "bucket"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pb", last(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(back))
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(fwdRun))
      .withColumn("nb", last(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(fwdRun))
      .withColumn("interp_v",
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (secs(col("bucket")) - secs(col("pb"))) /
            (secs(col("nb")) - secs(col("pb")))))
      .withColumn("is_observed", col("v").isNotNull)
      .select(col("k").as(keyCol), col("bucket"), col("interp_v"), col("is_observed"))
  }

  /** Offline CUSUM changepoint estimate per key: daily event counts, the
    * classic cumulative-sum chart `S_t = Σ_{i<=t} cnt_i − t·μ`, and the
    * day maximizing |S_t| — the standard single-changepoint locator for
    * level shifts in a count series (Page's statistic without the online
    * clamp, so it is closed-form replayable). Also reports the normalized
    * statistic `max|S| / (σ·√n)` (≳1.3 flags a likely shift at the usual
    * bootstrap quantiles).
    *
    * Determinism at hash-compare strictness: every fp value derives from
    * EXACT integer sums — `S_t` is an integer running sum minus `t·μ`
    * where `μ = Σcnt/n` divides two integers, and `σ` comes from integer
    * Σcnt² — so aggregation fold order can never wobble a bit. Ties on
    * |S| break to the earliest day via one `max(struct)` (no rank
    * window). Scale: one shuffle on the key for the daily rollup, one
    * bounded per-key window over its own days (≤ calendar span), one
    * bounded aggregate — state is days-per-key, never events. Days with
    * zero events contribute no row (resample first if closed gaps should
    * count as zeros). */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("k"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy("k").agg(
      sum(col("cnt")).as("tot"), sum(col("cnt") * col("cnt")).as("totsq"),
      count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val s = daily.join(stats, "k")
      .withColumn("t", row_number().over(w))
      .withColumn("run", sum(col("cnt")).over(w))
      .withColumn("mu", col("tot").cast("double") / col("n_days"))
      .withColumn("s", col("run").cast("double") - col("t") * col("mu"))
    s.groupBy(col("k"))
      .agg(max(struct(abs(col("s")).as("a"),
          (-unix_timestamp(col("day"))).as("nd"), col("day").as("d"),
          col("s").as("sv"), col("mu").as("m"), col("n_days").as("n"),
          col("tot").as("tt"), col("totsq").as("tq"))).as("b"))
      .select(col("k").as(keyCol), col("b.n").as("n_days"),
        col("b.d").as("change_day"), round(col("b.sv"), 4).as("s_at_change"),
        round(col("b.m"), 4).as("daily_mean"),
        // σ = 0 ⟺ n·Σc² = (Σc)² — an INTEGER identity, so the guard can't
        // fp-drift; without it a constant series emits NaN (0/0), not null
        when(col("b.tq") * col("b.n") === col("b.tt") * col("b.tt"),
          lit(null).cast("double"))
          .otherwise(round(col("b.a") /
            (sqrt(col("b.tq").cast("double") / col("b.n") -
              (col("b.tt").cast("double") / col("b.n")) *
              (col("b.tt").cast("double") / col("b.n"))) * sqrt(col("b.n"))), 4))
          .as("cusum_stat"))
  }

  /** Lead-lag Pearson cross-correlation between two keys' daily count
    * series: r(lag) over lag ∈ [−maxLag, maxLag], where positive lag means
    * "`keyA` today co-moves with `keyB` `lag` days LATER" — the diagnostic
    * for pipeline causality questions (do error spikes trail deploy
    * spikes?).
    *
    * Both series are zero-filled onto the full observed calendar spine
    * (min..max day across either key) so gaps read as 0 events, not
    * missing rows; each lag correlates the n−|lag| overlapping days.
    * Scale shape: the one real shuffle is the daily rollup of raw events;
    * everything after runs on the DAILY table (span-bounded — a decade is
    * ~3.7k rows), so the lag fan-out (2·maxLag+1 copies) and the
    * correlation sums are post-aggregation small data. Pearson terms are
    * integer sums of count products — fold-order-proof. Zero variance on
    * either side of a lag (one series constant over the overlap) yields a
    * null r. */
  def leadLagCorrelation(df: DataFrame, keyCol: String, tsCol: String,
                         keyA: String, keyB: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 0, "maxLag >= 0")
    require(keyA != keyB,
      "keyA == keyB correlates a series with itself (r(0) = 1 trivially)")
    val daily = df.filter(col(keyCol).isin(keyA, keyB))
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // tiny; feeds the spine and both series
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    def series(k: String) = spine.join(
        daily.filter(col("k") === k).select(col("day"), col("cnt")),
        Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("c"))
    val a = series(keyA).select(col("day"), col("c").as("ca"))
    val b = series(keyB).select(col("day"), col("c").as("cb"))
    val lags = df.sparkSession.range(-maxLag, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val pairs = a.crossJoin(lags)
      .join(b.withColumnRenamed("day", "bday"),
        expr("bday = date_add(day, lag)"))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("ca")).as("sa"),
        sum(col("cb")).as("sb"), sum(col("ca") * col("ca")).as("saa"),
        sum(col("cb") * col("cb")).as("sbb"),
        sum(col("ca") * col("cb")).as("sab"))
      .select(col("lag"), col("n"), {
        val va = col("n") * col("saa") - col("sa") * col("sa")
        val vb = col("n") * col("sbb") - col("sb") * col("sb")
        val cov = (col("n") * col("sab") - col("sa") * col("sb")).cast("double")
        // zero variance is an INTEGER identity -> the guard can't fp-drift
        when(va === 0 || vb === 0, lit(null).cast("double"))
          .otherwise(round(cov /
            (sqrt(va.cast("double")) * sqrt(vb.cast("double"))), 4)).as("r")
      })
  }

  /** Day-of-week seasonal baseline + residuals per key: expected(k, dow) =
    * mean daily count over that key's same-weekday history, residual =
    * observed − expected. The de-seasonalization step that keeps weekly
    * rhythm (weekend dips, Monday batch spikes) from drowning real volume
    * anomalies — CUSUM/z-score the RESIDUAL, not the raw count.
    *
    * Two aggregations, both keyed (daily rollup, then the 7-row-per-key
    * dow profile joined back — broadcastable at any scale since it is
    * |keys|×7). Expected values divide exact integer sums; residuals
    * subtract them — fold-order-proof. */
  def seasonalResiduals(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("k"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("day")))
      .localCheckpoint() // feeds the profile AND the residual join
    val profile = daily.groupBy("k", "dow")
      .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_days"))
    daily.join(broadcast(profile), Seq("k", "dow"))
      .withColumn("expected", col("tot").cast("double") / col("n_days"))
      .select(col("k").as(keyCol), col("day"), col("dow"), col("cnt"),
        round(col("expected"), 4).as("expected"),
        round(col("cnt").cast("double") - col("expected"), 4).as("residual"))
  }

  /** Per-key burstiness of daily event counts: the Fano factor
    * (variance/mean — 1 for a Poisson process, ≫1 for bursty arrivals,
    * <1 for metronomes) and the bounded burstiness index
    * `(σ−μ)/(σ+μ)` ∈ (−1, 1) — the load-planning number that says
    * whether a key's daily volume is steady or spiky (capacity for the
    * p99 day, not the mean day), and a second bot tell next to
    * [[graft.operators.EventOps.userRegularity]]'s gap CV.
    *
    * ABSENT days count as ZERO events — the whole point (a key active
    * one day a week is bursty, which dropping its silent days would
    * hide): the day spine is the corpus's observed day range, densified
    * per key (|keys|×|days| bounded frame). Daily counts are integers,
    * so the moments (n, Σc, Σc²) are exact and both statistics replay
    * externally; population variance (÷n). */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the spine bounds AND the densify join
    val days = daily.select(col("day")).agg(
      min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = daily.select(col("k")).distinct()
      .crossJoin(broadcast(days))
      .join(daily, Seq("k", "day"), "left")
      .select(col("k"), coalesce(col("cnt"), lit(0L)).as("c"))
    val mean = col("s").cast("double") / col("n")
    val variance = (col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n")) / col("n")
    val sd = sqrt(variance)
    dense.groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("c")).cast("long").as("s"),
        sum(col("c") * col("c")).cast("long").as("ss"),
        max(col("c")).cast("long").as("peak"))
      .withColumn("n", col("n_days"))
      .select(col(keyCol), col("n_days"), col("s").as("n_events"),
        col("peak"),
        round(mean, 4).as("mean_daily"),
        round(variance / mean, 4).as("fano"),
        round((sd - mean) / (sd + mean), 4).as("burstiness"))
  }

  /** Per-series daily mean spine shared by the trend operators: exact
    * DECIMAL numerator, integer denominator, one fp division — the same
    * determinism contract as [[ewma]]. */
  private def dailyMeans(df: DataFrame, keyCol: String, tsCol: String,
                         valueCol: String): DataFrame =
    df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg((sum(col(valueCol).cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))

  /** Theil–Sen trend slope per series: the MEDIAN of all pairwise slopes
    * `(m_j − m_i)/(day_j − day_i)` over the daily-mean spine — the robust
    * trend estimator (up to ~29% outlier days cannot move it, where OLS
    * follows a single spike). Median selection uses the engine-portable
    * discrete convention (value at ordered position ceil(n/2), exactly
    * [[Stats.groupQuantiles]]'s rule) — no interpolated midpoint average,
    * so the result is one of the actual slopes, bit-reproducible.
    *
    * Scale contract: the pair join is per-SERIES O(L²) in the series
    * LENGTH (days), never the row count — the row→day collapse happens
    * first, and the join key is the series, so a thousand metrics × a
    * year of days is ~66k slope rows per series, one shuffle. */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val daily = dailyMeans(df, keyCol, tsCol, valueCol).localCheckpoint()
    val slopes = daily.as("a").join(daily.as("b"),
        col("a.k") === col("b.k") && col("a.day") < col("b.day"))
      .select(col("a.k").as("k"),
        ((col("b.m") - col("a.m")) /
          datediff(col("b.day"), col("a.day")).cast("double")).as("slope"))
    val w = Window.partitionBy(col("k")).orderBy(col("slope"))
    val wc = Window.partitionBy(col("k"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(wc))
      .groupBy(col("k").as(keyCol))
      .agg(max(col("np")).cast("long").as("n_pairs"),
        round(max(when(col("rn") ===
          ceil(lit(0.5) * col("np").cast("double")), col("slope"))), 6)
          .as("sen_slope"))
  }

  /** Mann–Kendall trend test per series over the daily-mean spine:
    * S = Σ_{i<j} sign(m_j − m_i) (an INTEGER — exact), the tie-corrected
    * variance n(n−1)(2n+5)/18 − Σ t(t−1)(2t+5)/18, and the
    * continuity-corrected z — the standard monotonic-trend detector that
    * pairs with [[theilSen]] (MK says WHETHER the trend is real, Sen says
    * HOW STEEP). Everything is integer arithmetic until the final two fp
    * ops (÷18 inside the sqrt), so the statistic is engine-exact; the
    * pair join is the same per-series O(L²) as Theil–Sen. */
  def mannKendall(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val daily = dailyMeans(df, keyCol, tsCol, valueCol).localCheckpoint()
    val s = daily.as("a").join(daily.as("b"),
        col("a.k") === col("b.k") && col("a.day") < col("b.day"))
      .groupBy(col("a.k").as("k"))
      .agg(sum(signum(col("b.m") - col("a.m")).cast("long")).as("s"))
    val n = daily.groupBy(col("k")).agg(count(lit(1)).cast("long").as("n"))
    val ties = daily.groupBy(col("k"), col("m"))
      .agg(count(lit(1)).cast("long").as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
        .as("tie_term"))
    val varS = (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
      col("tie_term")).cast("double") / lit(18.0)
    val z = when(col("s") > 0,
        (col("s").cast("double") - 1.0) / sqrt(varS))
      .when(col("s") < 0, (col("s").cast("double") + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    n.join(ties, Seq("k")).join(s, Seq("k"))
      .select(col("k").as(keyCol), col("n").as("n_days"), col("s"),
        round(varS, 4).as("var_s"), round(z, 4).as("z"))
  }

  /** Exponentially weighted moving average of the per-day mean value per
    * series — the standard anomaly-baseline smoother, EXACT (the real
    * recursion y_t = (1−α)·y_{t−1} + α·x_t with y_1 = x_1, not a
    * truncated-window approximation). The recursion is a left fold over
    * the day-ordered prefix, expressed as `collect_list` over the running
    * window + the `aggregate` HOF with the first element as init — the
    * SAME fold sequence DuckDB's `list(...) OVER` + `list_reduce` runs,
    * so every fp operation matches order-for-order and the result is
    * bit-identical cross-engine (daily means themselves are exact-DECIMAL
    * numerator single divisions).
    *
    * Scale contract: the prefix list costs O(L²) values per series where
    * L is the series LENGTH (days), not the row count — fine for any
    * metric dashboard (L ≤ a few thousand); the row→day collapse before
    * it is the only full-data pass. A per-partition imperative scan
    * (repartition by series + sortWithinPartitions + mapPartitions)
    * replaces it when L grows unbounded. */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    val daily = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"),
        (sum(col(valueCol).cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("m"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = collect_list(col("m")).over(w)
    daily
      .withColumn("l", prefix)
      .select(col("k").as(keyCol), col("day"), col("n"),
        round(col("m"), 4).as("daily_mean"),
        round(aggregate(slice(col("l"), lit(2), size(col("l")) - 1),
          element_at(col("l"), 1),
          (acc, x) => lit(1.0 - alpha) * acc + lit(alpha) * x), 4)
          .as("ewma"))
  }

  /** Classical seasonal decomposition of per-key daily counts —
    * count = trend + seasonal + residual — with trend the CENTERED 7-row
    * moving mean, seasonal the day-of-week mean of the detrended series,
    * and the residual what monitoring should actually alert on (q201's
    * weekday baseline answers "what is normal", this splits "why").
    * Only days with a FULL ±3-row frame emit (edges have no honest
    * trend); calendar gaps make the frame the 7 nearest OBSERVED days
    * (documented, as in [[autocorrelation]]).
    *
    * Exactness by ×7 scaling: d7 = 7·n − Σ₇n is an INTEGER, so
    * trend = Σ₇/7, seasonal = Σ_dow(d7)/(7·c) and
    * residual = (d7·c − Σ_dow(d7))/(7·c) are each ONE division of exact
    * integers — no float accumulates anywhere, bit-equal across engines
    * and partitionings. Two bounded passes (frame window + dow means). */
  def seasonalDecompose(df: DataFrame, keyCol: String,
                        tsCol: String): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val framed = daily
      .withColumn("s7", sum(col("n")).over(w))
      .withColumn("c7", count(lit(1)).over(w))
      .filter(col("c7") === 7)
      .withColumn("d7", lit(7L) * col("n") - col("s7"))
      .withColumn("dow", dayofweek(col("day")))
      .localCheckpoint(eager = false) // dow means + the output pass
    val dow = framed.groupBy(col("k"), col("dow"))
      .agg(sum(col("d7")).cast("long").as("sd"),
        count(lit(1)).cast("long").as("c"))
    framed.join(dow, Seq("k", "dow"))
      .select(col("k").as(keyCol), col("day"), col("n"),
        round(col("s7").cast("double") / 7.0, 4).as("trend"),
        round(col("sd").cast("double") / (lit(7.0) *
          col("c").cast("double")), 4).as("seasonal"),
        round((col("d7") * col("c") - col("sd")).cast("double") /
          (lit(7.0) * col("c").cast("double")), 4).as("residual"))
  }

  /** Holt double-exponential-smoothing one-step forecast eval on per-key
    * daily counts, scored AGAINST the naive carry-forward baseline: level
    * l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}), trend b_t = β(l_t−l_{t−1}) +
    * (1−β)b_{t−1}, forecast f_t = l_{t−1}+b_{t−1}, init l₁ = x₁, b₁ = 0.
    * `skill` = 1 − holt_mae/naive_mae: positive means modeling the trend
    * actually beats "predict yesterday" — the go/no-go for deploying any
    * smoother on that key.
    *
    * EXACT-DYADIC contract: α and β must be dyadic rationals (k/2^m, e.g.
    * the defaults 0.5/0.25), so with integer counts every level/trend/
    * error value is a dyadic rational carried EXACTLY by doubles — the
    * whole recursion is fp-error-free and engine-identical, not merely
    * same-order. The fold runs over each key's sorted day list (one
    * bounded array per key, the q251 EWMA shape); gap days are simply
    * successive observations (documented, as in [[autocorrelation]]). */
  def holtForecastEval(df: DataFrame, keyCol: String, tsCol: String,
                       alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    def dyadic(x: Double) = { val s = x * 1048576.0; s == math.rint(s) }
    require(alpha > 0 && alpha < 1 && dyadic(alpha), "alpha dyadic in (0,1)")
    require(beta >= 0 && beta < 1 && dyadic(beta), "beta dyadic in [0,1)")
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val folded = daily.groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("xs"))
      .withColumn("st", aggregate(col("xs"),
        struct(lit(Double.NaN).as("l"), lit(0.0).as("b"),
          lit(Double.NaN).as("px"),
          lit(0.0).as("sae"), lit(0.0).as("nae"), lit(0L).as("t")),
        (acc, x) => {
          val xv = x("n")
          val f = acc("l") + acc("b")
          val l2 = lit(alpha) * xv + lit(1 - alpha) * f
          val first = acc("t") === 0L
          struct(
            when(first, xv).otherwise(l2).as("l"),
            when(first, lit(0.0)).otherwise(
              lit(beta) * (l2 - acc("l")) + lit(1 - beta) * acc("b"))
              .as("b"),
            xv.as("px"),
            when(first, lit(0.0)).otherwise(acc("sae") + abs(xv - f))
              .as("sae"),
            when(first, lit(0.0)).otherwise(acc("nae") + abs(xv - acc("px")))
              .as("nae"),
            (acc("t") + 1L).as("t"))
        }))
    folded
      .filter(col("st.t") >= 2L)
      .select(col("k").as(keyCol), col("st.t").as("n_days"),
        round(col("st.sae") / (col("st.t") - 1L).cast("double"), 4)
          .as("holt_mae"),
        round(col("st.nae") / (col("st.t") - 1L).cast("double"), 4)
          .as("naive_mae"),
        round(when(col("st.nae") > 0.0,
          lit(1.0) - col("st.sae") / col("st.nae")), 4).as("skill"))
  }

  /** Autocorrelation function of per-key DAILY counts at calendar lags
    * 1..`maxLag`: r_l = Σ(x_t−x̄)(x_{t+l}−x̄) / Σ(x_t−x̄)², the "does
    * yesterday predict today / is there a weekly echo" diagnostic every
    * volume monitor wants before it picks a seasonal baseline (a spike at
    * lag 7 is the licence for q270's t−7 forecast).
    *
    * Exactness: counts are integers and x̄ = T/n is rational, so both
    * sides multiply through by n² into EXACT integer forms —
    * n²·num = n²·Σx_t·x_{t+l} − n·T·(Σhead + Σtail) + c·T², and
    * n²·den = n·(n·Σx² − T²) — carried in DECIMAL(38,0) with ONE double
    * division at the end; no floating accumulation anywhere. Lags are
    * CALENDAR lags: a gap day simply contributes no pair (c counts the
    * realized pairs per lag).
    *
    * Scale shape: the event scan collapses to a keys×days spine once;
    * lagging is an `explode(sequence(1, maxLag))` over that bounded spine
    * (L× a tiny frame, never L× events) followed by ONE equi-join on
    * (key, day) — no range join, no window. */
  def autocorrelation(df: DataFrame, keyCol: String, tsCol: String,
                      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 90, "maxLag in [1, 90]")
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(eager = false)
    val base = daily.groupBy(col("k"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("nd"),
        sum(col("n")).cast("decimal(38,0)").as("t"),
        sum(col("n") * col("n")).cast("decimal(38,0)").as("sxx"))
    // head rows re-keyed forward by l: (k, day+l) meets the tail row at
    // (k, day) — pair (x_t, x_{t+l}) materializes iff both days exist
    val head = daily
      .withColumn("l", explode(sequence(lit(1), lit(maxLag))))
      .select(col("k"), col("l"), date_add(col("day"), col("l")).as("day"),
        col("n").as("n_head"))
    val pairs = head.join(daily, Seq("k", "day"))
      .groupBy(col("k"), col("l"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"),
        sum(col("n_head") * col("n")).cast("decimal(38,0)").as("sxy"),
        sum(col("n_head")).cast("decimal(38,0)").as("sh"),
        sum(col("n")).cast("decimal(38,0)").as("st"))
    pairs.join(base, Seq("k"))
      .select(col("k").as(keyCol), col("l").cast("long").as("lag"),
        col("c").cast("long").as("n_pairs"),
        round(
          ((col("nd") * col("nd") * col("sxy") -
            col("nd") * col("t") * (col("sh") + col("st")) +
            col("c") * col("t") * col("t")).cast("double")) /
          ((col("nd") * (col("nd") * col("sxx") - col("t") * col("t")))
            .cast("double")), 4).as("acf"))
  }

  /** Seasonal-naive forecast evaluation with pinball (quantile) loss: the
    * forecast for day d is the observed count at d−season; per key, report
    * MAE and the pinball losses at τ=0.5/0.9 — the baseline every
    * volume-forecasting model must beat, and the metric (pinball) that
    * scores quantile forecasts properly (τ=0.9 charges under-forecasting
    * 9× over-forecasting — the "don't under-provision" asymmetry).
    *
    * Exactness: daily counts are integers, so errors are integers and
    * both losses carry exact INTEGER numerators — |e| for MAE/τ=0.5 and
    * max(9e, −e) for τ=0.9 (pinball×10) — with ONE division per output
    * cell. One aggregation + one self-join on (key, day): the joined spine
    * is bounded by keys × days, never event rows. */
  def seasonalForecastEval(df: DataFrame, keyCol: String, tsCol: String,
                           season: Int = 7): DataFrame = {
    require(season >= 1 && season <= 366, "season in [1, 366]")
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val prev = daily.select(col("k"),
      date_add(col("day"), season).as("day"), col("n").as("n_prev"))
    val err = col("n") - col("n_prev")
    daily.join(prev, Seq("k", "day"))
      .groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(abs(err)).cast("long").as("sae"),
        sum(greatest(lit(9L) * err, -err)).cast("long").as("sp90"))
      .select(col("k").as(keyCol), col("n_days"),
        round(col("sae").cast("double") /
          col("n_days").cast("double"), 4).as("mae"),
        round(col("sae").cast("double") /
          (lit(2.0) * col("n_days").cast("double")), 4).as("pinball50"),
        round(col("sp90").cast("double") /
          (lit(10.0) * col("n_days").cast("double")), 4).as("pinball90"))
  }
}
