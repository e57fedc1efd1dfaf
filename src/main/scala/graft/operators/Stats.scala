package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics per group. */
object Stats {

  /** Exact discrete quantiles (`quantile_disc` semantics: the value at
    * ordered position `ceil(p * n)`) of `valueCol` per `keyCol`, one output
    * row per group with a column per requested p.
    *
    * Exactness costs one sort per group (row_number over the value order) —
    * a single shuffle on the group key, each partition sorted once for ALL
    * requested quantiles together. Integer rank selection (not
    * interpolation) keeps the result engine-portable: the value at rank k is
    * well-defined even under duplicate values, whereas interpolated
    * `percentile_cont` would hit cross-engine fp-average drift. At 100 TB
    * you'd reach for `approx_percentile` (KLL/GK sketch, no full sort) when
    * exactness is negotiable; the selection semantics here are the oracle
    * for that sketch's error. */
  def groupQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("v"))
    val wc = Window.partitionBy(col(keyCol))
    // null values are excluded: engines disagree on null sort position
    // (Spark nulls-first vs others nulls-last), which would shift every rank
    val ranked = df.select(col(keyCol), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
    val aggs = max(col("n")).cast("long").as("n") +:
      ps.map { p =>
        val label = "p" + math.round(p * 100)
        max(when(col("rn") === ceil(lit(p) * col("n").cast("double")), col("v")))
          .as(label)
      }
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Robust per-group outlier detection via median/MAD (Iglewicz–Hoaglin
    * modified z-score): a value is an outlier when
    * 0.6745·|x − median| > cutoff·MAD — written in multiply form so a
    * zero MAD (constant group) yields zero outliers instead of a division
    * blow-up. Three group aggregations over the column (median, MAD of the
    * residuals, then the outlier count); each pass is a pruned columnar
    * scan plus one group-count-bounded broadcast join — no window, no sort
    * of the data plane, so the per-group cardinality never concentrates on
    * one partition the way a rank-based trim would. percentile_approx runs
    * at exact-retention accuracy here (== DuckDB quantile_disc rank rule,
    * the q110 parity contract); at 100 TB lower the accuracy and accept
    * the sketch's documented rank error. */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
                  cutoff: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(keyCol)).agg(
      percentile_approx(v, lit(0.5), lit(1000000)).as("med"))
    val mad = df.join(broadcast(med), keyCol)
      .groupBy(col(keyCol))
      .agg(first(col("med")).as("med"),
        percentile_approx(abs(v - col("med")), lit(0.5), lit(1000000))
          .as("mad"))
    df.join(broadcast(mad), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(abs(v - col("med")) * 0.6745 > col("mad") * cutoff, 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_frac",
        round(col("n_outliers").cast("double") / col("n"), 4))
  }

  /** Per-column table profile — the "ANALYZE TABLE" statistics a metadata
    * catalog records per snapshot: row count, null count, exact distinct
    * count, min/max (stringified so one output schema covers every column
    * type).
    *
    * Two narrow passes instead of Spark's multi-`countDistinct` plan: that
    * plan Expands every row |cols|+1 times and shuffles the expansion with
    * ALL profiled columns as grouping keys — wide rows, rows x cols of
    * them. Here (1) counts/nulls/min/max run in one ordinary aggregation
    * (single result row, no distinct), and (2) distinct counts dedup an
    * exploded (col_name, value-string) pair stream whose map-side partial
    * collapses each partition to its LOCAL distinct values — the shuffle
    * carries ~sum of per-partition distincts in 2-column rows, a large
    * factor less than the Expand for every repetitive column. The
    * stringified pair stream is type-injective for primitive columns. At
    * 100 TB swap stage (2) for [[Sketches.hllDistinct]]'s bounded
    * registers — stage (1) is already sketch-cheap. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.c").as("c"), col("p.v").as("v"))
      .filter(col("v").isNotNull) // countDistinct semantics: nulls excluded
    val nd = pairs.distinct()
      .groupBy(col("c")).agg(count(lit(1)).cast("long").as("__ndist"))
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").cast("long").as("n_rows"),
        col(s"__nn_$c").cast("long").as("n_nulls"),
        col(s"__mn_$c").as("min_val"), col(s"__mx_$c").as("max_val"))
    }
    row.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
      .join(broadcast(nd.withColumnRenamed("c", "col_name")), Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("__ndist"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
  }

  /** Gaps in an integer id sequence — the ingestion-completeness check
    * ("did we lose a batch?"): every maximal run of missing ids between the
    * observed min and max, as (gap_start, gap_end, gap_len).
    *
    * The naive formulation (`lag` over a global `ORDER BY id` window) sorts
    * every distinct id through ONE partition — a single-executor sort on the
    * one operator whose input is the whole corpus's id space. Instead:
    * bucket the [min, max] span into `nRanges` contiguous intervals (bucket
    * = monotone affine map of the id, so each bucket holds a contiguous id
    * slice), run the lag per bucket — `nRanges` parallel partition-local
    * sorts — and stitch bucket boundaries from the per-bucket (min, max)
    * summary. The summary is ≤ `nRanges` rows, so it rides the bounded
    * control-plane collect (same contract as a DPP filter list); cross-bucket
    * gaps are computed on the driver from adjacent (prev.max, cur.min) pairs
    * and unioned back as a literal relation. The distinct id frame is
    * localCheckpoint'd so its shuffle is paid once, not once per action
    * (bounds, summary, final job). Bucket math runs in doubles — fp rounding
    * preserves monotonicity, so buckets stay contiguous even past 2^53 —
    * with the top bucket clamped against fp round-up on the max id. Gap
    * arithmetic itself is exact integers end to end. */
  def sequenceGaps(df: DataFrame, idCol: String, nRanges: Int = 64): DataFrame = {
    require(nRanges > 0, "nRanges > 0")
    val ids = df.select(col(idCol).cast("long").as("id"))
      .filter(col("id").isNotNull).distinct().localCheckpoint()
    val empty = ids.limit(0).select(col("id").as("gap_start"),
      col("id").as("gap_end"), col("id").as("gap_len"))
    val b = ids.agg(min(col("id")), max(col("id"))).collect()(0)
    if (b.isNullAt(0)) return empty
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val span = mx.toDouble - mn.toDouble + 1.0
    val r = math.max(1L, math.min(nRanges.toLong, mx - mn + 1)).toInt
    val ranged = ids.withColumn("rg",
      least(lit(r - 1),
        floor((col("id").cast("double") - mn.toDouble) * r / span)).cast("int"))
    val w = Window.partitionBy(col("rg")).orderBy(col("id"))
    val inner = ranged
      .withColumn("prev", lag(col("id"), 1).over(w))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"), (col("id") - 1).as("gap_end"),
        (col("id") - col("prev") - 1).as("gap_len"))
    val summary = ranged.groupBy(col("rg"))
      .agg(min(col("id")).as("rmin"), max(col("id")).as("rmax"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val cross = summary.iterator.sliding(2).withPartial(false).collect {
      case Seq((_, _, prevMax), (_, curMin, _)) if curMin - prevMax > 1 =>
        (prevMax + 1, curMin - 1, curMin - prevMax - 1)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    inner.union(cross.toDF("gap_start", "gap_end", "gap_len"))
  }

  /** Per-group ordinary-least-squares fit of y on x: slope, intercept and
    * r² — the groupwise trend report (price-per-unit by segment, quality
    * vs length by source) computed in closed form, no iterative solver.
    *
    * Deliberately TWO passes: means first (|groups| rows, broadcast back),
    * then sums of CENTERED cross-products. The textbook single-pass form
    * (E[xy] − E[x]E[y]) subtracts two near-equal ~|x·y·n| magnitudes —
    * catastrophic cancellation that makes the 6dp result depend on
    * partition-summation order; centering keeps every summand at residual
    * scale, so the distributed sum agrees with a sequential engine to
    * ~1e-12 relative and the rounded statistics are engine-stable. Groups
    * with zero x-variance report null slope/intercept/r² rather than a
    * division blow-up. Both passes are map-side-combined group-key
    * shuffles; nothing scales beyond the group count after the scans. */
  def groupRegression(df: DataFrame, keyCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df.filter(x.isNotNull && y.isNotNull)
    val means = base.groupBy(col(keyCol))
      .agg(avg(x).as("mx"), avg(y).as("my"))
    val dx = x - col("mx")
    val dy = y - col("my")
    base.join(broadcast(means), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("mx")).as("_mx"), max(col("my")).as("_my"),
        sum(dx * dy).as("sxy"), sum(dx * dx).as("sxx"),
        sum(dy * dy).as("syy"))
      .select(col(keyCol), col("n"),
        round(when(col("sxx") > 0, col("sxy") / col("sxx")), 6).as("slope"),
        round(when(col("sxx") > 0,
          col("_my") - (col("sxy") / col("sxx")) * col("_mx")), 4)
          .as("intercept"),
        round(when(col("sxx") > 0 && col("syy") > 0,
          (col("sxy") * col("sxy")) / (col("sxx") * col("syy"))), 6)
          .as("r2"))
  }

  /** Winsorized (percentile-clipped) per-group summary: the group mean
    * before and after clamping values into [p_lo, p_hi], with how many
    * rows each tail clipped — the robust-mean report that shows what the
    * outliers were doing to the raw average (the groupwise cousin of
    * q135's clipped int8 quantization, and [[madOutliers]]'s
    * clamp-instead-of-drop counterpart).
    *
    * The cut points ride [[groupQuantiles]]'s exact rank rule (value at
    * ordered position ceil(p·n) — the engine-portable selection, no
    * interpolation); they come back |groups| rows and broadcast-join onto
    * the data for a single clamp-and-aggregate pass. Two passes over the
    * column total, both group-key shuffles with map-side partials. */
  def winsorizedStats(df: DataFrame, keyCol: String, valueCol: String,
                      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "0 <= pLo < pHi <= 1")
    val v = col(valueCol).cast("double")
    val lbl = (p: Double) => "p" + math.round(p * 100)
    val cuts = groupQuantiles(df, keyCol, valueCol, Seq(pLo, pHi))
      .select(col(keyCol), col(lbl(pLo)).as("lo"), col(lbl(pHi)).as("hi"))
    df.filter(v.isNotNull).join(broadcast(cuts), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(v), 2).as("mean_raw"),
        round(avg(least(greatest(v, col("lo")), col("hi"))), 2)
          .as("mean_wins"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).cast("long").as("n_lo"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).cast("long").as("n_hi"))
  }

  /** Global total-order rank (row_number semantics over
    * `ORDER BY orderCol, idCol`) without a global single-partition sort —
    * the "export the corpus in quality order" / "assign stable global
    * sequence numbers" primitive.
    *
    * The naive `row_number().over(Window.orderBy(...))` funnels every row
    * through ONE partition (Spark even warns). Instead, the classic
    * two-pass range formulation: `repartitionByRange` on the order key
    * splits the data into `nRanges` contiguous, range-ordered partitions
    * (the same sampled range boundaries a global `orderBy` would compute —
    * one extra pass over the data, not a single-machine sort); per-partition
    * counts (≤ `nRanges` rows — bounded control-plane collect, the DPP
    * contract) prefix-sum on the driver into per-partition rank offsets;
    * then a partition-local `row_number` window (partitioned by the range
    * id, so all `nRanges` sorts run in parallel) plus the broadcast offset
    * gives the exact global rank. The result is boundary-independent:
    * whatever split the sampler picks, concatenating range-ordered
    * partitions in partition order IS the total order, so ranks are
    * deterministic even though the partitioner samples. Ties on `orderCol`
    * are broken by `idCol`; the composite key is also the range key, so a
    * tie group sliced across two ranges still ranks consistently. The
    * ranged frame is localCheckpoint'd: the range exchange is paid once,
    * not once per action (counts, final job). At 100 TB, `nRanges` scales
    * with the cluster (e.g. 2-4× executor cores) — each range sorts
    * ~1/nRanges of the data locally. */
  def globalRank(df: DataFrame, orderCol: String, idCol: String,
                 nRanges: Int = 64): DataFrame = {
    require(nRanges > 0, "nRanges > 0")
    val ranged = df
      .repartitionByRange(nRanges, col(orderCol).asc, col(idCol).asc)
      .withColumn("__rg", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("__rg")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (p, c) => val o = (p, acc); acc += c; o }.toMap
    }
    val w = Window.partitionBy(col("__rg"))
      .orderBy(col(orderCol).asc, col(idCol).asc)
    ranged
      .withColumn("global_rank",
        row_number().over(w).cast("long") +
          element_at(typedLit(offsets), col("__rg")))
      .drop("__rg")
  }

  /** Join-key skew profile: the diagnostic run BEFORE committing to a big
    * join's partitioning (the input that decides whether [[SkewJoin]]'s
    * salting or AQE skew splitting is needed). One count-per-key shuffle
    * (map-side combined), then the global stats (n_keys, n_rows, max)
    * reduce to a single row and the top-`topK` heavy hitters ride the
    * bounded [[graft.functions.TopKAgg]] — no global sort of the key-count
    * table, which is itself as big as the key space. Each heavy key is
    * reported with its row count, share of all rows, and `x_avg` = how many
    * times the mean key's size it is (the salting-factor input). */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK > 0")
    graft.functions.TopKAgg.register(df.sparkSession)
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // heavy hitters AND the global stats come out of ONE aggregation over
    // the key-count table — a separate totals subtree would re-scan the
    // input and re-run the count-per-key shuffle (plans are trees, not DAGs)
    val profile = counts.agg(
      graft.functions.TopKAgg.topK(
        struct(negate(col("cnt")).as("nc"), col(keyCol).cast("string").as("k")),
        topK).as("arr"),
      count(lit(1)).cast("double").as("n_keys"),
      sum(col("cnt")).cast("double").as("n_rows"))
    profile
      .select(col("n_keys"), col("n_rows"), posexplode(col("arr")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.k").as("key"),
        negate(col("col.nc")).cast("long").as("cnt"),
        round(negate(col("col.nc")) / col("n_rows"), 4).as("share"),
        round(negate(col("col.nc")) * col("n_keys") / col("n_rows"), 2).as("x_avg"))
  }

  /** Equal-frequency bucketing (curriculum/quality binning) WITHOUT a global
    * row_number: a global rank window collapses the corpus onto one
    * partition, which dies at scale. Instead the exact histogram algorithm:
    * count per distinct value (a shuffle bounded by the value space), then
    * each value's bucket = floor(rank_of_first_occurrence * nBuckets / n)
    * in pure integer arithmetic, joined back on the value. Ties share a
    * value, so they land in the same bucket by construction —
    * deterministic across engines with no tie-break column needed. Bucket
    * ids are 0..nBuckets-1; a value run longer than a bucket simply
    * occupies it.
    *
    * The cumulative pass over the sorted value GRID uses [[globalRank]]'s
    * two-pass range partitioning (per-range prefix sums + collected
    * per-range totals as offsets), NOT an unpartitioned window — on a
    * quantized score the grid is small either way, but on a raw
    * continuous column the grid is as large as the row count, and this
    * operator must not be the one unpartitioned-window trap in the repo
    * (StatsSpec pins the plan on a continuous column). The join back is
    * AQE-chosen, not a pinned broadcast, for the same reason. */
  def histogramBuckets(df: DataFrame, valueCol: String,
                       nBuckets: Int = 10, nRanges: Int = 64): DataFrame = {
    require(nRanges > 0, "nRanges > 0")
    // null values are excluded from the output AND the offsets: a null
    // count group would inflate n and shift every non-null bucket while
    // the final equi-join dropped the null rows anyway
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    val ranged = counts
      .repartitionByRange(nRanges, col(valueCol).asc)
      .withColumn("__rg", spark_partition_id())
      // lazy: the per-range totals collect right below is the first
      // action and materializes it; the prefix pass then reuses blocks
      .localCheckpoint(eager = false)
    val parts = ranged.groupBy(col("__rg"))
      .agg(sum(col("cnt")).as("s")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = parts.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      parts.map { case (p, s) => val o = (p, acc); acc += s; o }.toMap
    }
    val w = Window.partitionBy(col("__rg")).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranged
      .withColumn("cum", sum(col("cnt")).over(w) +
        element_at(typedLit(offsets), col("__rg")))
      .select(col(valueCol),
        least(lit(nBuckets - 1),
          expr(s"((cum - cnt) * $nBuckets) div ${math.max(total, 1L)}"))
          .cast("long").as("bucket"))
    df.join(cum, Seq(valueCol))
  }

  /** Binned two-sample Kolmogorov–Smirnov distance between every pair of
    * groups' value distributions — the multi-source drift matrix ("is src3's
    * length distribution the same shape as src0's?") run before trusting a
    * cross-source mixture. PSI ([[psiReport]]) compares two snapshots of one
    * stream; this compares ALL group pairs at once and reports WHERE the
    * distributions diverge (the bin realizing the sup).
    *
    * Exact KS needs a global sort per group; the binned variant needs only
    * fixed-width bin COUNTS over the shared global min..max — one scan + one
    * (group, bin)-key aggregate, shuffle bounded by |groups|·nBins, never by
    * rows. CDFs are a cumulative window over the densified |groups|·nBins
    * frame (partitioned by group, nBins rows each); the pairwise sup is a
    * bin-key self-join of that same small frame. Bin edges come from the
    * 1-row global min/max aggregate via crossJoin(broadcast) — no driver
    * collect. The discretization error is bounded by the largest single-bin
    * mass, reported as `max_bin_share` so a reader can tell a real 0.4 KS
    * from a coarse-binning artifact. */
  def ksBinnedDrift(df: DataFrame, groupCol: String, valueCol: String,
                    nBins: Int = 64): DataFrame = {
    require(nBins > 1, "nBins > 1")
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull)
      .select(col(groupCol).cast("string").as("g"), v.as("v"))
    val mm = base.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    val binned = base.crossJoin(broadcast(mm))
      .withColumn("bin", least(lit(nBins - 1L), greatest(lit(0L),
        floor((col("v") - col("__lo")) /
          when(width > 0, width).otherwise(lit(1.0))).cast("long"))))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
    // densify: every (group, bin) cell, zero-filled — the cumulative window
    // and the pairwise join both need aligned bin frames
    val groups = binned.select(col("g")).distinct()
    val bins = df.sparkSession.range(0, nBins.toLong).select(col("id").as("bin"))
    val dense = groups.crossJoin(broadcast(bins))
      .join(binned, Seq("g", "bin"), "left")
      .select(col("g"), col("bin"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(col("g"))
    val cdf = dense
      .withColumn("cdf", sum(col("cnt")).over(wcum).cast("double") /
        sum(col("cnt")).over(wall))
      .withColumn("bin_share", col("cnt").cast("double") /
        sum(col("cnt")).over(wall))
    val a = cdf.select(col("g").as("g_a"), col("bin"),
      col("cdf").as("cdf_a"), col("bin_share").as("sh_a"))
    val b = cdf.select(col("g").as("g_b"), col("bin"),
      col("cdf").as("cdf_b"), col("bin_share").as("sh_b"))
    val diffs = a.join(b, "bin").filter(col("g_a") < col("g_b"))
      .withColumn("d", abs(col("cdf_a") - col("cdf_b")))
    diffs
      .withColumn("__mx",
        max(col("d")).over(Window.partitionBy(col("g_a"), col("g_b"))))
      .groupBy(col("g_a"), col("g_b"))
      .agg(round(max(col("d")), 6).as("ks_stat"),
        min(when(col("d") === col("__mx"), col("bin"))).as("at_bin"),
        round(max(greatest(col("sh_a"), col("sh_b"))), 6).as("max_bin_share"))
  }

  /** Calibration-report bins + expected calibration error for a [0,1]
    * confidence score against a binary label — the eval a heuristic
    * classifier (lang-ID confidence, quality logit) gets before its scores
    * gate a corpus: per fixed-width confidence bin, the mean claimed
    * confidence vs the empirical positive rate, their gap, and the
    * n-weighted ECE repeated on every row.
    *
    * One scan bins rows (`least(nBins-1, floor(score·nBins))` — scores
    * exactly 1.0 land in the top bin), one nBins-bounded aggregate per bin,
    * and the scalar ECE rides a crossJoin(broadcast) of the 1-row weighted
    * sum — shuffles bounded by the bin count throughout, no collect. Rows
    * with a null score or label are excluded (they'd shift every bin's
    * rate under engines' differing null-comparison semantics). */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins > 0")
    val sc = col(scoreCol).cast("double")
    val lb = col(labelCol).cast("boolean")
    val binned = df.filter(sc.isNotNull && lb.isNotNull)
      .withColumn("bin",
        least(lit(nBins - 1L), greatest(lit(0L),
          floor(sc * nBins).cast("long"))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        avg(sc).as("__conf"),
        avg(lb.cast("double")).as("__rate"))
    binned.crossJoin(broadcast(binned.agg(
        (sum(col("n") * abs(col("__conf") - col("__rate"))) /
          sum(col("n"))).as("__ece")))
      )
      .select(col("bin"), col("n"),
        round(col("__conf"), 6).as("mean_conf"),
        round(col("__rate"), 6).as("pos_rate"),
        round(abs(col("__conf") - col("__rate")), 6).as("gap"),
        round(col("__ece"), 6).as("ece"))
  }

  /** Surrogate-key collision audit: for each candidate hash width, how many
    * distinct natural keys collide when assigned `hash mod 2^bits` surrogate
    * ids, against the birthday-bound expectation m·(1 − (1−1/m)^n) distinct
    * hashes — the sizing table read before replacing a natural join key
    * with a fixed-width hash id (the failure mode: silent row merges in
    * every downstream join). Uses the portable md5-based 32-bit hash
    * ([[graft.functions.Hashes.portableHash32]]) so widths ≤ 32 are
    * meaningful and any engine can replay the audit.
    *
    * One distinct over the natural keys, one explode to |widths| rows per
    * key, one (width, hash)-key dedup + width-key count — the shuffle is
    * |keys|·|widths| narrow rows, and the output is |widths| rows. At
    * 100 TB run the same audit over [[Sketches.hllDistinct]] register sets
    * per width instead of the exact dedup; the exact form here is that
    * sketch's oracle. */
  def surrogateKeyAudit(df: DataFrame, keyCol: String,
                        widths: Seq[Int] = Seq(16, 20, 24, 28)): DataFrame = {
    require(widths.nonEmpty && widths.forall(b => b > 0 && b <= 32),
      "widths in 1..32")
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull).distinct()
      .withColumn("h", graft.functions.Hashes.portableHash32(col("k")))
    val pairs = keys.select(explode(array(widths.map(b =>
        struct(lit(b.toLong).as("bits"), pmod(col("h"), lit(1L << b)).as("sk")))
        : _*)).as("p"))
      .select(col("p.bits").as("bits"), col("p.sk").as("sk"))
    val perWidth = pairs.groupBy(col("bits"), col("sk"))
      .agg(count(lit(1)).as("keys_in_bucket"))
      .groupBy(col("bits"))
      .agg(sum(col("keys_in_bucket")).cast("long").as("n_keys"),
        count(lit(1)).cast("long").as("n_hashes"),
        max(col("keys_in_bucket")).cast("long").as("max_bucket"))
    perWidth
      .withColumn("space", pow(lit(2.0), col("bits").cast("double")))
      .select(col("bits"), col("n_keys"), col("n_hashes"),
        (col("n_keys") - col("n_hashes")).as("n_collisions"),
        round(col("n_keys").cast("double") -
          col("space") * (lit(1.0) -
            pow(lit(1.0) - lit(1.0) / col("space"),
              col("n_keys").cast("double"))), 2).as("expected_collisions"),
        col("max_bucket"))
      .orderBy(col("bits"))
  }

  /** Population-stability-index drift report between a reference and a
    * current snapshot of one numeric column — the per-feature drift monitor
    * a continuously-ingested corpus runs between snapshots (PSI > 0.25 is
    * the conventional "investigate" line, documented here, not enforced).
    * Bins are `nBins` fixed-width slices of the REFERENCE min..max (so the
    * binning is stable when the current distribution shifts), with the two
    * open tails clamped into the edge bins; each side bins with one scan +
    * one nBins-group aggregate (shuffles bounded by the bin count, not
    * rows), shares join broadcast, and psi_term = (cur−ref)·ln(cur/ref)
    * with ε-smoothed shares so an empty bin contributes a finite term.
    * `psi_total` repeats the scalar Σ on every row (a broadcast of the
    * 1-row aggregate — keeps the result one self-contained frame). Only
    * min/max travel through a driver-free crossJoin(broadcast) — no
    * collect anywhere. */
  def psiReport(ref: DataFrame, cur: DataFrame, valueCol: String,
                nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    val mm = ref.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    def binned(df: DataFrame, share: String): DataFrame = {
      val width = (col("__hi") - col("__lo")) / nBins
      val raw = floor((col(valueCol).cast("double") - col("__lo")) / width)
      val n = df.filter(col(valueCol).isNotNull)
        .crossJoin(broadcast(mm))
        .withColumn("bin",
          least(lit(nBins - 1L), greatest(lit(0L), raw.cast("long"))))
      n.groupBy("bin").agg(count(lit(1)).as("__c"))
        .crossJoin(broadcast(
          n.agg(count(lit(1)).as("__n"))))
        .select(col("bin"), (col("__c").cast("double") / col("__n")).as(share))
    }
    val bins = ref.sparkSession.range(0, nBins.toLong)
      .select(col("id").as("bin"))
    val joined = bins
      .join(binned(ref, "ref_share"), Seq("bin"), "left")
      .join(binned(cur, "cur_share"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ref_share"), lit(0.0)).as("ref_share"),
        coalesce(col("cur_share"), lit(0.0)).as("cur_share"))
      .withColumn("psi_term",
        (col("cur_share") - col("ref_share"))
          * log((col("cur_share") + eps) / (col("ref_share") + eps)))
    joined.crossJoin(broadcast(
        joined.agg(sum(col("psi_term")).as("__psi"))))
      .select(col("bin"),
        round(col("ref_share"), 6).as("ref_share"),
        round(col("cur_share"), 6).as("cur_share"),
        round(col("psi_term"), 6).as("psi_term"),
        round(col("__psi"), 6).as("psi_total"))
  }

  /** Cohen's kappa between two categorical label columns — the standard
    * chance-corrected agreement statistic for labeler/classifier QA
    * (two annotation runs, a heuristic vs a model scorer, two model
    * versions): `κ = (p_o − p_e) / (1 − p_e)` with `p_o` the observed
    * agreement rate and `p_e = Σ_label p_A(l)·p_B(l)` the agreement
    * expected from the marginals alone.
    *
    * One pass for (n, matches), one two-sided marginal count, one bounded
    * label-space join — state is the label vocabulary, never the rows.
    * Every fp value divides exact integer sums (`Σ c_A(l)·c_B(l)` is a sum
    * of longs), so partial-aggregation fold order cannot wobble a bit at
    * hash-compare strictness. Perfect chance agreement (p_e = 1: both
    * sides constant and equal — κ undefined) reports null.
    *
    * Rows where EITHER label is null are excluded from n entirely (an
    * unlabeled item is not a rating). Counting them would be
    * inconsistent by construction: `a = b` is never true for nulls and
    * the marginal join drops null groups, so a corpus of identical null
    * pairs would read as disagreement (κ = 0.33 instead of the honest
    * "no data") — treat null-as-category upstream if that is the
    * intent. */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val labeled = df.select(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val base = labeled.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("matches"))
    val ma = labeled.groupBy(col("a").as("label")).agg(count(lit(1)).as("ca"))
    val mb = labeled.groupBy(col("b").as("label")).agg(count(lit(1)).as("cb"))
    val cross = ma.join(mb, Seq("label"), "inner")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("cxc"))
    base.crossJoin(broadcast(cross))
      .withColumn("po", col("matches").cast("double") / col("n"))
      .withColumn("pe", col("cxc").cast("double") / (col("n") * col("n")))
      .select(col("n"), round(col("po"), 4).as("po"),
        round(col("pe"), 4).as("pe"),
        when(col("pe") === 1.0, lit(null).cast("double"))
          .otherwise(round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 4))
          .as("kappa"))
  }

  /** Mutual information between two categorical columns, reported per cell
    * (pointwise term, nats) plus the total — "how much does knowing the
    * source tell you about the quality band": the dependence audit before
    * trusting a stratified design or suspecting a confound. Follows the
    * [[psiDrift]] report shape: cell rows carry `n_ab` and the term
    * `(n_ab/n)·ln(n·n_ab / (n_a·n_b))`, the total is broadcast onto every
    * row. All ratios divide exact integer counts; only the per-cell `ln`
    * and the final (few-term) total sum are fp. One pass for the cell
    * counts, marginals by a second aggregation of the CELL table (never
    * the rows), a broadcast-sized label-space join. */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.select(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .localCheckpoint() // label-space-bounded; feeds marginals + terms
    val ma = cells.groupBy("a").agg(sum(col("n_ab")).as("n_a"))
    val mb = cells.groupBy("b").agg(sum(col("n_ab")).as("n_b"))
    val n = cells.agg(sum(col("n_ab")).as("n"))
    val terms = cells.join(ma, "a").join(mb, "b").crossJoin(broadcast(n))
      .withColumn("term",
        (col("n_ab").cast("double") / col("n")) *
          log((col("n").cast("double") * col("n_ab")) /
            (col("n_a").cast("double") * col("n_b"))))
    terms.crossJoin(broadcast(terms.agg(sum(col("term")).as("__mi"))))
      .select(col("a"), col("b"), col("n_ab"),
        round(col("term"), 6).as("mi_term"),
        round(col("__mi"), 6).as("mi_total"))
  }

  /** Quantile normalization of a score across groups: each row's value is
    * replaced by the POOLED distribution's value at the same within-group
    * percentile — the calibration step that makes per-source quality
    * scores comparable before a global threshold or mixture weighting
    * (source A's "0.9" and source B's "0.9" rarely mean the same thing).
    *
    * Exact, deterministic semantics (no interpolation): within-group rank
    * r of n (row_number by value, ties by id), mapped to the pooled
    * order statistic at rank `ceil(r·N / n)` — computed as the INTEGER
    * `(r·N + n − 1) div n`, so the mapping can't fp-drift. The pooled
    * side uses [[globalRank]] (range-partitioned — never a single-
    * partition window); the within-group window partitions on the group.
    * One range-repartition for the pooled ranks, one group shuffle, one
    * join on the target rank. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String, nRanges: Int = 64): DataFrame = {
    val pooled = globalRank(df.select(col(idCol), col(valueCol)),
        valueCol, idCol, nRanges)
      .select(col("global_rank").as("target_rank"),
        col(valueCol).as("norm_value"))
      .localCheckpoint() // collected range offsets; don't recompute per join
    val n = df.count()
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val ranked = df.select(col(idCol), col(groupCol), col(valueCol))
      .withColumn("r", row_number().over(wg).cast("long"))
      .withColumn("n_g", count(lit(1)).over(
        Window.partitionBy(col(groupCol))).cast("long"))
      .withColumn("target_rank",
        expr(s"(r * ${n}L + n_g - 1) div n_g")) // INTEGER ceil(r·N/n)
    ranked.join(pooled, "target_rank")
      .select(col(idCol), col(groupCol), col(valueCol),
        col("r").as("group_rank"), col("norm_value"))
  }

  /** Wilson score interval per group for a boolean success predicate —
    * the small-sample-honest error bars a data-quality rate needs before
    * anyone compares two sources' pass rates (a 3/4 source and a
    * 7500/10000 source both read "75%"; their intervals don't overlap
    * the same decisions). Closed form, no bootstrap: every input is an
    * exact integer count, the z constant is a literal, and the formula
    * tree is written identically in the oracle so the doubles replay
    * bit-for-bit. Groups with n = 0 successes still report (0-width
    * intervals never happen: Wilson is defined at k = 0 and k = n). */
  def wilsonIntervals(df: DataFrame, groupCol: String, success: Column,
                      z: Double = 1.96): DataFrame = {
    val z2 = z * z
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(when(coalesce(success, lit(false)), 1L).otherwise(0L)).as("k"))
    val n = col("n").cast("double")
    val p = col("k").cast("double") / n
    val denom = lit(1.0) + lit(z2) / n
    val center = p + lit(z2) / (lit(2.0) * n)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      lit(z2) / (lit(4.0) * n * n))
    agg.select(col(groupCol), col("n"), col("k"),
      round(p, 6).as("rate"),
      round((center - half) / denom, 6).as("wilson_lo"),
      round((center + half) / denom, 6).as("wilson_hi"))
  }

  /** Decile lift/gains table for a score against a boolean label — the
    * standard eval for "does this quality score actually rank good docs
    * first" before using it as a filter or curriculum key. Deciles are
    * the exact equal-frequency buckets of [[histogramBuckets]] (decile 1
    * = highest scores); each reports its positive rate, lift over the
    * base rate, and the cumulative capture share walking down from the
    * top. Counts are exact integers end to end; the cumulative walk is a
    * 10-row window. */
  def liftTable(df: DataFrame, scoreCol: String, label: Column,
                nBuckets: Int = 10): DataFrame = {
    val labeled = df.select(col(scoreCol),
      when(coalesce(label, lit(false)), 1L).otherwise(0L).as("y"))
    val bucketed = histogramBuckets(labeled, scoreCol, nBuckets)
      .withColumn("decile", (lit(nBuckets).cast("long") - col("bucket")))
    val per = bucketed.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_k", sum(col("k")).over(w))
      .withColumn("tot_n", sum(col("n")).over(tot))
      .withColumn("tot_k", sum(col("k")).over(tot))
      .select(col("decile"), col("n"), col("k"),
        round(col("k").cast("double") / col("n"), 6).as("rate"),
        // zero positives anywhere: lift/capture undefined -> null (an
        // INTEGER guard, not a fp comparison)
        when(col("tot_k") === 0, lit(null).cast("double"))
          .otherwise(round((col("k").cast("double") / col("n")) /
            (col("tot_k").cast("double") / col("tot_n")), 4)).as("lift"),
        when(col("tot_k") === 0, lit(null).cast("double"))
          .otherwise(round(col("cum_k").cast("double") / col("tot_k"), 6))
          .as("capture"))
  }

  /** Chi-squared test of independence + Cramér's V for two categorical
    * columns — the effect-size companion to [[mutualInformation]] (MI
    * says "how much information", V says "how strong on a 0..1 scale",
    * and the χ² statistic is what a significance threshold consumes).
    *
    * One scan builds the observed contingency cells; row/column marginals
    * re-aggregate the CELLS (bounded r and c, never the row scale) and
    * broadcast back. Zero-observed cells of the r×c grid are never
    * materialized: each contributes exactly its expectation e to χ², and
    * Σe over ALL cells is n, so χ² = Σ_observed((o−e)²/e − e) + n — the
    * full-grid statistic from the observed cells alone (a dense
    * crossJoin of the margins would be r×c rows for no reason).
    * Null categories are excluded (their margins are undefined across
    * engines). Output is one row: n, r, c, dof, chi2, cramers_v
    * (null when either margin is degenerate, where V divides by 0). */
  def chiSquaredIndependence(df: DataFrame, colA: String,
                             colB: String): DataFrame = {
    val base = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).cast("string").as("a"), col(colB).cast("string").as("b"))
    val cells = base.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val rowTot = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val colTot = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val dims = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("a")).as("r"), count_distinct(col("b")).as("c"))
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("n").cast("double")
    val contrib = cells
      .join(broadcast(rowTot), "a").join(broadcast(colTot), "b")
      .crossJoin(broadcast(dims))
      .select((pow(col("o").cast("double") - e, 2) / e - e).as("t"))
      .agg(coalesce(sum(col("t")), lit(0.0)).as("t_sum"))
    val minDim = least(col("r"), col("c")) - lit(1L)
    dims.crossJoin(broadcast(contrib)).select(
      col("n"), col("r"), col("c"),
      ((col("r") - 1) * (col("c") - 1)).as("dof"),
      round(col("t_sum") + col("n").cast("double"), 6).as("chi2"),
      when(minDim <= 0, lit(null).cast("double"))
        .otherwise(round(sqrt((col("t_sum") + col("n").cast("double")) /
          (col("n").cast("double") * minDim.cast("double"))), 6))
        .as("cramers_v"))
  }

  /** Benjamini–Hochberg FDR adjustment over a per-hypothesis p-value
    * frame — the multiple-testing correction every "which groups
    * drifted?" sweep needs before alerting: testing 50 source pairs at
    * α = 0.05 expects 2–3 false alarms; BH caps the FALSE DISCOVERY RATE
    * at α instead. Input is one row per hypothesis (already aggregated —
    * the m-row control frame, not row-scale data); output adds the
    * ascending-p rank, the step-up adjusted q-value
    * q_i = min_{j≥i}(m·p_j / j) clamped to 1, and the α decision.
    *
    * The two unpartitioned windows order/scan the m-row HYPOTHESIS frame
    * (m = groups or group pairs, control-plane bounded) — same contract
    * as [[liftTable]]'s 10-row walk, never a row-scale sort. Ties in p
    * share one q-value by construction (the running min from the bottom
    * flows through equal p's); `idCol` breaks rank ties so the emitted
    * rank column is deterministic. */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String,
               alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    val wRank = Window.orderBy(col(pCol), col(idCol))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wTail = Window.orderBy(col(pCol).desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("rank", row_number().over(wRank))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("q_value", round(least(lit(1.0),
        min(col("__m").cast("double") * col(pCol) /
          col("rank").cast("double")).over(wTail)), 6))
      .withColumn("significant", col("q_value") <= alpha)
      .drop("__m")
  }

  /** Split-conformal prediction interval with a coverage audit: fit a
    * simple regression on the TRAIN split, take the
    * `⌈(n+1)(1−α)⌉`-th smallest absolute residual on the CALIBRATION
    * split as the interval half-width q̂, and measure realized coverage on
    * the held-out TEST split — the distribution-free guarantee
    * (coverage ≥ 1−α regardless of the model being right) that makes
    * conformal the honest way to ship uncertainty with a prediction.
    * A calibrated pipeline reads `coverage ≈ target`; a drifted one shows
    * the gap directly.
    *
    * Splits are portable-hash-mod-3 of the id (deterministic, replayable).
    * `xCol`/`yCol` are cast to long (integer-metric contract), so the OLS
    * moments are EXACT integers and slope/intercept/residuals replay
    * bit-for-bit externally. The rank selection rides [[globalRank]]
    * (range-partitioned — no single-partition sort of the calibration
    * set); everything else is moment aggregates and 1-row control frames.
    * Output is ONE row: split sizes, fit, q̂, realized coverage, target. */
  def conformalInterval(df: DataFrame, idCol: String, xCol: String,
                        yCol: String, alpha: Double = 0.1,
                        nRanges: Int = 64): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    val base = df.filter(col(idCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(idCol).as("id"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"),
        pmod(graft.functions.Hashes.portableHash32(
          col(idCol).cast("string")), lit(3L)).as("split"))
      .localCheckpoint() // three splits, three reads
    val fit = base.filter(col("split") === 0)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_train"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("b"), col("sx"), col("sy"))
      .select(col("n_train"), col("b"),
        ((col("sy").cast("double") - col("b") * col("sx").cast("double")) /
          col("n_train")).as("a"))
    def resid(split: Int): DataFrame = base.filter(col("split") === split)
      .crossJoin(broadcast(fit))
      .select(col("id"), col("n_train"), col("a"), col("b"),
        abs(col("y").cast("double") -
          (col("a") + col("b") * col("x").cast("double"))).as("resid"))
    val cal = resid(1).localCheckpoint() // feeds the size frame AND the rank
    val kF = cal.agg(count(lit(1)).as("nc"))
      .select(col("nc").cast("long").as("n_cal"),
        least(ceil((col("nc") + lit(1)).cast("double") * lit(1.0 - alpha))
          .cast("long"), col("nc")).as("k"))
    val qhat = globalRank(cal.select(col("id"), col("resid")),
        "resid", "id", nRanges)
      .crossJoin(broadcast(kF))
      .filter(col("global_rank") === col("k"))
      .select(col("n_cal"), col("resid").as("qhat"))
    val test = resid(2).crossJoin(broadcast(qhat))
      .groupBy(lit(1).as("__g"))
      .agg(count(lit(1)).as("nt"), max(col("n_train")).as("n_train"),
        max(col("a")).as("a"), max(col("b")).as("b"),
        max(col("n_cal")).as("n_cal"), max(col("qhat")).as("qhat"),
        sum(when(col("resid") <= col("qhat"), 1L).otherwise(0L)).as("cov"))
    test.select(col("n_train"), col("n_cal"),
      col("nt").cast("long").as("n_test"),
      round(col("b"), 6).as("slope"), round(col("a"), 4).as("intercept"),
      round(col("qhat"), 4).as("qhat"),
      round(col("cov").cast("double") / col("nt"), 4).as("coverage"),
      lit(1.0 - alpha).as("target"))
  }

  /** Experiment power planning per group: with the group's observed
    * variance, (a) the minimum detectable effect if its rows were split
    * into two equal arms TODAY, and (b) the per-arm sample size a 5%-of-
    * mean lift would need — `n = 2σ²(z_{α/2}+z_β)²/δ²`, the planning
    * arithmetic run BEFORE an experiment, answering "is this metric even
    * testable at our traffic?" (the ex-ante complement of [[welchTTest]]'s
    * ex-post verdict). Fixed z constants (α = 0.05 two-sided, 80% power)
    * are literals, so no inverse-normal evaluation exists anywhere —
    * engine-replayable by construction. One conditional-moment scan per
    * group; sample variances (÷(n−1)). */
  def powerAnalysis(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val zA = 1.959963984540054 // Phi^-1(0.975)
    val zB = 0.8416212335729143 // Phi^-1(0.80)
    val v = col(valueCol).cast("double")
    val m = floor(col("n") / 2).cast("double") // per-arm size today
    val sd = sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
    val mean = col("s") / col("n")
    val mde = lit(zA + zB) * sd * sqrt(lit(2.0) / m)
    val delta5 = lit(0.05) * mean
    df.filter(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("ss"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        round(mean, 4).as("mean"), round(sd, 4).as("stddev"),
        round(mde, 4).as("mde_abs"),
        round(mde / mean, 4).as("mde_rel"),
        ceil(lit(2.0) * sd * sd * lit((zA + zB) * (zA + zB)) /
          (delta5 * delta5)).cast("long").as("n_per_arm_5pct"))
  }

  /** Delta-method confidence interval for a RATIO-of-sums metric
    * (revenue per session, clicks per impression, value per event): the
    * metric is `Σx/Σy` over independent UNITS (users), and its variance
    * comes from the delta method over the per-unit (x, y) pairs —
    * `se² = (s_x² − 2r·s_xy + r²·s_y²)/(n·ȳ²)` with r the ratio and
    * sample (co)variances. Naively treating the EVENT as the unit
    * understates the variance whenever users differ (they always do);
    * this is the standard correct form every experimentation platform
    * ships for ratio metrics.
    *
    * Two-level aggregation: rows → per-unit sums (the only row-scale
    * shuffle) → per-group moments; the CI arithmetic runs on one row per
    * group. Fixed z literal (95%), same no-inverse-normal stance as
    * [[powerAnalysis]]. */
  def ratioMetricCI(df: DataFrame, groupCol: String, unitCol: String,
                    numCol: Column, denCol: Column): DataFrame = {
    val z = 1.959963984540054
    val units = df.groupBy(col(groupCol).as("g"), col(unitCol).as("u"))
      .agg(sum(coalesce(numCol, lit(0.0))).as("x"),
        sum(coalesce(denCol, lit(0.0))).as("y"))
    val n = col("n").cast("double")
    val r = col("sx") / col("sy")
    val my = col("sy") / n
    val vx = (col("sxx") - col("sx") * col("sx") / n) / (n - 1)
    val vy = (col("syy") - col("sy") * col("sy") / n) / (n - 1)
    val cxy = (col("sxy") - col("sx") * col("sy") / n) / (n - 1)
    val se = sqrt(greatest(
      (vx - lit(2.0) * r * cxy + r * r * vy) / (n * my * my), lit(0.0)))
    units.groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col(groupCol), col("n").cast("long").as("n_units"),
        round(r, 6).as("ratio"), round(se, 6).as("se"),
        round(r - lit(z) * se, 4).as("ci_lo"),
        round(r + lit(z) * se, 4).as("ci_hi"))
  }

  /** Gini concentration of an integer-valued measure across groups — the
    * one-number "how skewed is this corpus toward a few sources?" audit
    * (0 = perfectly even, →1 = one group holds everything). Corpus-mix
    * planning reads it next to [[graft.operators.Corpus.domainCaps]]: a
    * high Gini says the cap will bind, a low one says it's a no-op.
    *
    * Computed from the sorted-rank identity
    * `G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n` over per-group totals sorted
    * ascending (ties broken by group name — Σ i·xᵢ is tie-order
    * invariant, the break just pins the rank column). `valueCol` is cast
    * to long ([[graft.operators.Sampling.neymanAllocation]]'s
    * integer-metric contract), so every sum is exact integer arithmetic
    * and only the two final divisions are floating point — the estimate
    * replays bit-for-bit externally.
    *
    * Scale shape: one grouped sum (rows → |groups|), then one rank window
    * and one aggregate over the |groups|-row control frame — the
    * unpartitioned window orders groups, never rows. Output is ONE row:
    * (n_groups, total, gini 6dp, top_share 6dp). */
  def giniConcentration(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val totals = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(sum(col(valueCol).cast("long")).as("w"))
    val ranked = totals.withColumn("i",
      row_number().over(Window.orderBy(col("w"), col("g"))))
    ranked.agg(count(lit(1)).as("n"), sum(col("w")).as("tw"),
        sum(col("i") * col("w")).as("iw"), max(col("w")).as("mw"))
      .select(col("n").cast("long").as("n_groups"),
        col("tw").cast("long").as("total"),
        round(lit(2.0) * col("iw").cast("double") /
          (col("n") * col("tw")).cast("double") -
          (col("n") + lit(1)).cast("double") / col("n").cast("double"), 6)
          .as("gini"),
        round(col("mw").cast("double") / col("tw").cast("double"), 6)
          .as("top_share"))
  }

  /** CUPED variance reduction for an A/B readout: adjust each unit's
    * post-period metric by its own PRE-period metric
    * (`adj = post − θ·(pre − mean(pre))`, θ = cov(pre, post)/var(pre),
    * pooled across arms — pre-period data can't be affected by treatment,
    * so the adjustment is unbiased) and report per-arm means before/after
    * plus the realized variance reduction. The industry-standard way to
    * cut experiment runtimes: same decision, tighter confidence, often
    * 30–60% variance gone when pre/post correlate.
    *
    * Scale: one global moment frame (n, Σpre, Σpost, Σpre², Σpre·post →
    * θ and mean(pre), ONE row, broadcast back), then one per-arm moment
    * pass over the adjusted metric — two aggregations, no windows, unit
    * rows never leave their shuffle. Population variances (÷n): the
    * reduction RATIO is the readout, not an inference statistic. */
  def cupedAdjustment(units: DataFrame, armCol: String, preCol: String,
                      postCol: String): DataFrame = {
    val pre = col(preCol).cast("double")
    val post = col(postCol).cast("double")
    val base = units.filter(pre.isNotNull && post.isNotNull)
    val ctl = base.agg(count(lit(1)).as("n"), sum(pre).as("sp"),
        sum(post).as("so"), sum(pre * pre).as("spp"),
        sum(pre * post).as("spo"))
      .select(
        ((col("spo") - col("sp") * col("so") / col("n")) /
          (col("spp") - col("sp") * col("sp") / col("n"))).as("theta"),
        (col("sp") / col("n")).as("mpre"))
    val adj = post - col("theta") * (pre - col("mpre"))
    base.crossJoin(broadcast(ctl))
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).cast("long").as("n_units"),
        max(col("theta")).as("__t"),
        sum(post).as("__so"), sum(post * post).as("__soo"),
        sum(adj).as("__sa"), sum(adj * adj).as("__saa"))
      .select(col("arm"), col("n_units"),
        round(col("__so") / col("n_units"), 4).as("mean_post"),
        round(col("__sa") / col("n_units"), 4).as("mean_adj"),
        round(col("__t"), 4).as("theta"),
        round(lit(1.0) -
          (col("__saa") - col("__sa") * col("__sa") / col("n_units")) /
          (col("__soo") - col("__so") * col("__so") / col("n_units")), 4)
          .as("var_reduction"))
  }

  /** Pre-experiment covariate balance: standardized mean difference per
    * covariate between two arms, `SMD = (m_b − m_a)/√((v_a + v_b)/2)` —
    * the randomization-health check run BEFORE trusting any readout
    * (|SMD| < 0.1 is the conventional "balanced" line). A skewed SMD on a
    * pre-period covariate means the split is broken or the analysis needs
    * stratification, and no amount of post-period statistics fixes it.
    *
    * One conditional-moment pass for ALL covariates together (six sums
    * per covariate inside a single aggregate — the [[DataQuality.ruleReport]]
    * shape: adding a covariate never adds a scan), then arithmetic on the
    * |covariates|-row literal unpivot. Population variances (÷n).
    * NULL stance: each covariate's n counts its own NON-NULL rows (the
    * value sums always skipped NULLs — counting them would silently bias
    * every mean/variance/SMD downstream), matching [[welchTTest]] /
    * [[cupedAdjustment]]'s explicit filters; a covariate with NULLs is
    * compared over the rows where it exists. */
  def covariateBalance(df: DataFrame, arm: Column,
                       covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty, "at least one covariate")
    val aggs = covariates.flatMap { c =>
      val v = col(c).cast("double")
      Seq(sum(when(arm && v.isNotNull, 1L).otherwise(0L)).as(s"__nb_$c"),
        sum(when(!arm && v.isNotNull, 1L).otherwise(0L)).as(s"__na_$c"),
        sum(when(arm, v).otherwise(lit(0.0))).as(s"__sb_$c"),
        sum(when(!arm, v).otherwise(lit(0.0))).as(s"__sa_$c"),
        sum(when(arm, v * v).otherwise(lit(0.0))).as(s"__ssb_$c"),
        sum(when(!arm, v * v).otherwise(lit(0.0))).as(s"__ssa_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = covariates.map { c =>
      struct(lit(c).as("cov"), col(s"__na_$c").as("na"),
        col(s"__nb_$c").as("nb"), col(s"__sa_$c").as("sa"),
        col(s"__sb_$c").as("sb"), col(s"__ssa_$c").as("ssa"),
        col(s"__ssb_$c").as("ssb"))
    }
    val ma = col("r.sa") / col("r.na")
    val mb = col("r.sb") / col("r.nb")
    val va = col("r.ssa") / col("r.na") - ma * ma
    val vb = col("r.ssb") / col("r.nb") - mb * mb
    val smd = (mb - ma) / sqrt((va + vb) / 2.0)
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.cov").as("covariate"),
        round(ma, 4).as("mean_a"), round(mb, 4).as("mean_b"),
        round(smd, 4).as("smd"), (abs(smd) < 0.1).as("balanced"))
  }

  /** Welch's unequal-variance t-test between two arms: t statistic and
    * Welch–Satterthwaite degrees of freedom from one conditional-moment
    * pass (never pooled-variance Student's t — arms in production rarely
    * share a variance, and Welch is the safe default). Sample variances
    * (÷(n−1)) as the test requires. One row out; the caller compares |t|
    * to the critical value for `df` — the heavy lift at 100 TB is the
    * moment pass, and that is one scan with map-side partials. */
  def welchTTest(df: DataFrame, arm: Column, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val one = df.filter(v.isNotNull).agg(
      sum(when(arm, 1L).otherwise(0L)).as("nb"),
      sum(when(!arm, 1L).otherwise(0L)).as("na"),
      sum(when(arm, v).otherwise(lit(0.0))).as("sb"),
      sum(when(!arm, v).otherwise(lit(0.0))).as("sa"),
      sum(when(arm, v * v).otherwise(lit(0.0))).as("ssb"),
      sum(when(!arm, v * v).otherwise(lit(0.0))).as("ssa"))
    val ma = col("sa") / col("na")
    val mb = col("sb") / col("nb")
    val va = (col("ssa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("ssb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val sea = va / col("na")
    val seb = vb / col("nb")
    one.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      round(ma, 4).as("mean_a"), round(mb, 4).as("mean_b"),
      round((mb - ma) / sqrt(sea + seb), 4).as("t_stat"),
      round((sea + seb) * (sea + seb) /
        (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1)), 2)
        .as("df"))
  }

  /** Exact weighted quantiles per group: the smallest value whose
    * cumulative weight reaches `q·W` — `percentile_disc` generalized to a
    * weight column (volume-weighted median price, token-weighted length
    * quantiles: "half the TOKENS sit in documents shorter than X", which
    * the unweighted [[groupQuantiles]] cannot say when long docs hold most
    * of the mass).
    *
    * Weights are cast to long (integer-metric contract — quantities/
    * tokens/bytes), so cumulative weights are EXACT and order-stable; the
    * only float op is the `q·W` threshold product, identical in any
    * engine. Duplicate values collapse to one row BEFORE the cumulative
    * window (sum-then-scan), so the scan length is the distinct-value
    * count and the crossing rule is well-defined under ties.
    *
    * Scale: one grouped sum (rows → group×distinct-value), one cumulative
    * window PARTITIONED by group (no global sort), one crossing aggregate.
    * Output: one row per (group, q). */
  def weightedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                        weightCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")
    val byValue = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(keyCol).as("k"), col(valueCol).as("v"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
    val cum = byValue
      .withColumn("cw",
        sum(col("w")).over(Window.partitionBy(col("k")).orderBy(col("v"))))
      .withColumn("tw",
        sum(col("w")).over(Window.partitionBy(col("k"))))
    cum.select(col("k"), col("v"), col("cw"), col("tw"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("cw").cast("double") >= col("q") * col("tw").cast("double"))
      .groupBy(col("k").as(keyCol), col("q"))
      .agg(min(col("v")).as("value"))
  }

  /** 2-D Pareto frontier (skyline, both dimensions maximized): the points
    * no other point dominates (≥ in both dims, > in at least one) — the
    * curation trade-off surface ("no doc is both longer AND lexically
    * richer"). Output: one row per frontier POINT with its member count
    * and smallest id, ordered implicitly by the caller.
    *
    * Scale shape: collapse to distinct (x, max-y-at-x) first — the window
    * then scans DISTINCT x values, not rows. That global ordered window is
    * a single-partition sort over |distinct x| (bounded: a metric's value
    * grid, not the corpus); the row→point collapse before it is an
    * ordinary shuffled aggregate. Dominance via running max: after
    * per-x collapse, a point is on the frontier iff its y strictly
    * exceeds every y at strictly larger x — exactly `max(y) over
    * (order by x desc rows unbounded preceding .. 1 preceding)`, so ties
    * in x never self-dominate and equal-y plateaus keep only the
    * largest-x point (standard strict-dominance skyline). */
  def paretoFrontier(df: DataFrame, idCol: String, xCol: String,
                     yCol: String): DataFrame = {
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        min(col(idCol)).as("min_id"))
    val atX = pts.groupBy(col("x"))
      .agg(max(col("y")).as("ymax"))
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = atX
      .withColumn("prev_best", max(col("ymax")).over(w))
      .filter(col("prev_best").isNull || col("ymax") > col("prev_best"))
      .select(col("x"), col("ymax").as("y"))
    frontier.join(pts, Seq("x", "y"))
      .select(col("x").as(xCol), col("y").as(yCol), col("n_members"),
        col("min_id"))
  }

  /** Poisson bootstrap standard error of a per-group mean — the bootstrap
    * that scales: instead of resampling rows (a shuffle per replicate),
    * each row carries `b` independent Poisson(1) weights derived from a
    * portable hash of (unit id, replicate), so ALL replicates compute in
    * ONE pass with map-side partial aggregation and the only shuffle is
    * the (group × replicate) aggregate — `b`× map-side row expansion,
    * zero extra scans. Standard large-scale practice (each replicate's
    * total weight ~Poisson(n) ≈ n, the classic multinomial-bootstrap
    * approximation).
    *
    * Determinism: ONE md5 per row ([[graft.functions.Hashes.portableHash32]])
    * fanned into `b` decorrelated streams by the integer-codegen
    * [[graft.functions.Hashes.portableMix32]] avalanche (x = h ⊕ rep·φ32
    * mod 2^32, then fmix32) — engine-portable bit-for-bit at a fraction
    * of the b-md5s-per-row cost; u = mix/2^32 feeds an inverse-CDF lookup
    * against hard-coded Poisson(1) cumulative literals. Value sums are
    * DECIMAL(18,2): exact and
    * summation-order-independent, so replicate means are reproducible
    * across partitionings; only the final stddev over `b` means is fp.
    * Output per group: n rows, the full-sample mean, the bootstrap SE,
    * and the normal-approximation CI. */
  /** Poisson(1) cumulative masses — shared by every bootstrap variant
    * and their oracle generators (bit-identical literals both engines). */
  private[graft] val poissonCum = Seq(0.36787944117144233,
    0.7357588823428847, 0.9196986029286058, 0.9810118431238463,
    0.9963401531726563, 0.9994058151824183, 0.999916758850712,
    0.9999897508033253, 0.999998874797402)

  /** q246's portable weight chain: one md5 per unit fanned per replicate
    * by the fmix32 avalanche, then the Poisson(1) inverse-CDF ladder.
    * Expects columns `h` (portableHash32 of the unit id) and `rep`. */
  private def poissonWeight: Column = {
    val u = graft.functions.Hashes.portableMix32(
      col("h").bitwiseXOR((col("rep") * 2654435761L) % 4294967296L))
      .cast("double") / lit(4294967296.0)
    // inverse-CDF: weight k has cumulative mass cum(k); u >= last literal
    // (mass 1.1e-6) truncates to 9 — beyond any per-replicate noise
    poissonCum.zipWithIndex.foldRight(lit(9): Column) {
      case ((c, k), rest) => when(u < lit(c), lit(k)).otherwise(rest)
    }.cast("long")
  }

  def poissonBootstrapSE(df: DataFrame, groupCol: String, idCol: String,
                         valueCol: String, b: Int): DataFrame = {
    require(b >= 2 && b <= 512, "replicates in [2, 512]")
    // widen BEFORE the per-row md5 + b-way explode: a single-file input
    // arrives as one scan partition, which would serialize the whole
    // hash/weight pass onto one core (guide §2.5 input skew — measured
    // 13.7 s single-task at sf0.1; a no-op once the scan has >= cores
    // splits). Only the three projected columns cross the exchange.
    val base = graft.Tables.widen(df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("__id"),
        col(valueCol).cast("decimal(18,2)").as("v")))
      .select(col("g"),
        graft.functions.Hashes.portableHash32(col("__id")).as("h"),
        col("v"))
    val reps = base
      .withColumn("rep", explode(sequence(lit(0L), lit(b - 1L))))
      .withColumn("w", poissonWeight)
      .groupBy(col("g"), col("rep"))
      // exact DECIMAL numerator, exact integer denominator, then ONE fp
      // division — the replicate mean is bit-identical across engines
      // and partitionings
      .agg((sum(col("w") * col("v")).cast("double") /
        sum(col("w")).cast("double")).as("m"))
      .groupBy(col("g"))
      .agg(stddev_samp(col("m")).as("boot_se"))
    val full = base.groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        (sum(col("v")).cast("double") /
          count(lit(1)).cast("double")).as("est"))
    full.join(reps, Seq("g"))
      .select(col("g").as(groupCol), col("n_rows"),
        round(col("est"), 4).as("mean"),
        round(col("boot_se"), 4).as("boot_se"),
        round(col("est") - lit(1.959963984540054) * col("boot_se"), 4)
          .as("ci_lo"),
        round(col("est") + lit(1.959963984540054) * col("boot_se"), 4)
          .as("ci_hi"))
  }

  /** Percentile-bootstrap confidence interval for a per-group MEDIAN —
    * the quantile CI no normal approximation gives you (the median's SE
    * depends on the unknown density at the median; the bootstrap
    * sidesteps it). Same one-pass Poisson machinery as
    * [[poissonBootstrapSE]]: b hash-deterministic Poisson(1) weights per
    * unit, but each replicate's statistic is the WEIGHTED LOWER MEDIAN,
    * computed on the per-(group, replicate) VALUE GRID — cumulative
    * windows over grid rows (bounded by distinct values), never a
    * per-replicate sort of raw rows. The CI is the percentile interval
    * of the b replicate medians (sorted-list positions ⌈0.025b⌉ /
    * b+1−⌈0.025b⌉).
    *
    * FULLY exact: medians are data values selected by integer-weight
    * comparisons (2·cum ≥ W picks the lower median), so there is no
    * floating arithmetic anywhere — the gate matches bit-for-bit by
    * construction. Replicates whose total weight lands 0 (only possible
    * for tiny groups) drop, and n_reps reports the survivors.
    *
    * TRIMMED SEARCH (the scale lever): a Poisson replicate's weighted
    * median sits within O(√n) ranks of the point median, so the
    * per-replicate sorted pass runs only over the CENTRAL rank window
    * |2·rank − n| ≤ 32·√n; the mass below the window enters as a plain
    * per-(group, replicate) aggregate (map-side combinable, no sort).
    * The window is part of the estimator's definition — a replicate
    * whose true median escapes it (probability < e⁻⁵⁰⁰ per replicate)
    * clips to the window edge or drops — so both engines compute the
    * identical, deterministic statistic. Cuts the b× sorted volume from
    * all values to ~64√n per group. */
  def bootstrapMedianCI(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String, b: Int = 64): DataFrame = {
    require(b >= 8 && b <= 512, "replicates in [8, 512]")
    // widen before the md5 pass: same single-scan-partition serialization
    // fix as [[poissonBootstrapSE]] (guide §2.5)
    val base = graft.Tables.widen(df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("__id"),
        col(valueCol).cast("decimal(18,2)").as("v")))
      .select(col("g"),
        graft.functions.Hashes.portableHash32(col("__id")).as("h"),
        col("v"))
      .localCheckpoint(eager = false) // point estimate + the rep grid
    val grid = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).cast("long").as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = grid
      .withColumn("cum", sum(col("c")).over(wg))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy(col("g"))))
      .localCheckpoint(eager = false) // point median + the central cut
    val point = ranked.filter(col("cum") * 2 >= col("ng"))
      .groupBy(col("g")).agg(min(col("v")).as("median"))
    val margin = ceil(lit(32.0) * sqrt(col("ng").cast("double")))
      .cast("long")
    val central = ranked.filter(
      col("cum") * 2 >= col("ng") - margin &&
        (col("cum") - col("c")) * 2 <= col("ng") + margin)
      .select(col("g"), col("v"))
    // the central window is a CONTIGUOUS rank range of the grid (both
    // cum-filters are monotone in v-order), so membership is exactly
    // v_lo <= v <= v_hi — one broadcast row per group replaces the r17
    // (g, v) equi-join of the exploded stream against the central set
    val cut = central.groupBy(col("g"))
      .agg(min(col("v")).as("v_lo"), max(col("v")).as("v_hi"))
    val n = base.groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    // ONE pass over the b-way exploded weight stream (r17 ran two: a
    // masses pass and an in-window pass — guide §2.4 remove passes):
    // every row is zoned below/inside/above the search window, in-window
    // rows keep their value, and partial aggregation collapses the
    // stream to the bounded (g, rep, zone, v_central) grid before the
    // shuffle. Masses re-aggregate from that grid — integer weights, so
    // every sum is exact under any grouping order.
    val zoned = base
      .withColumn("rep", explode(sequence(lit(0L), lit(b - 1L))))
      .withColumn("w", poissonWeight)
      .join(broadcast(cut), Seq("g"))
      .withColumn("zone", when(col("v") < col("v_lo"), lit(0))
        .when(col("v") <= col("v_hi"), lit(1)).otherwise(lit(2)))
      .groupBy(col("g"), col("rep"), col("zone"),
        when(col("zone") === 1, col("v")).as("vc"))
      .agg(sum(col("w")).as("w8"))
      .localCheckpoint(eager = false) // masses + the sorted pass
    // total and below-window mass: straight aggregates to g×b groups
    val masses = zoned
      .groupBy(col("g"), col("rep"))
      .agg(sum(col("w8")).as("wt"),
        sum(when(col("zone") === 0, col("w8")).otherwise(0L))
          .as("below"))
    // the sorted pass runs ONLY over the central window's rep grid
    val inWin = zoned.filter(col("zone") === 1)
      .select(col("g"), col("rep"), col("vc").as("v"), col("w8"))
    val wr = Window.partitionBy(col("g"), col("rep")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val repMeds = inWin
      .withColumn("cum", sum(col("w8")).over(wr))
      .join(masses, Seq("g", "rep"))
      .filter(col("wt") > 0 &&
        (col("below") + col("cum")) * 2 >= col("wt"))
      .groupBy(col("g"), col("rep")).agg(min(col("v")).as("med"))
    val ci = repMeds.groupBy(col("g"))
      .agg(sort_array(collect_list(col("med"))).as("ms"))
      .select(col("g"), size(col("ms")).cast("long").as("n_reps"),
        element_at(col("ms"),
          greatest(lit(1), ceil(lit(0.025) * size(col("ms")))
            .cast("int"))).as("ci_lo"),
        element_at(col("ms"),
          size(col("ms")) + 1 - greatest(lit(1),
            ceil(lit(0.025) * size(col("ms"))).cast("int"))).as("ci_hi"))
    n.join(point, Seq("g")).join(ci, Seq("g"))
      .select(col("g").as(groupCol), col("n_rows"), col("n_reps"),
        col("median").cast("double").as("median"),
        col("ci_lo").cast("double").as("ci_lo"),
        col("ci_hi").cast("double").as("ci_hi"))
  }

  /** Top-k multivariate outliers by DIAGONAL Mahalanobis distance over
    * integer-valued feature columns: score = Σ_f (x_f − μ_f)²/σ²_f — the
    * axis-scaled distance that makes "3σ on ANY combination of features"
    * one number, without the d×d covariance inverse (features are treated
    * independent; the full-covariance version needs a driver-side d×d
    * solve and is overkill for a curation triage).
    *
    * The INTEGER-features contract is what makes the gate exact: moments
    * (n, Σx, Σx²) are exact longs, so μ and σ² are deterministic fp
    * functions of integers, every row's score is bit-reproducible, and
    * the (score desc, id) top-k is stable across engines and
    * partitionings. Two passes: one moment aggregate (map-side partials,
    * d×3 longs total), one scored scan + partial top-k. At true 100 TB
    * the Σx² accumulator needs DECIMAL headroom — cast up before the
    * feature values exceed ~3e9. */
  def mahalanobisOutliers(df: DataFrame, idCol: String,
                          features: Seq[String], topK: Int): DataFrame = {
    require(features.nonEmpty, "at least one feature")
    require(topK >= 1, "topK >= 1")
    val clean = df.filter(features.map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol) +: features.map(f => col(f).cast("long").as(f)): _*)
    val momentAggs = features.flatMap { f =>
      Seq(sum(col(f)).as(s"sx_$f"), sum(col(f) * col(f)).as(s"sxx_$f"))
    }
    val m = clean.agg(count(lit(1)).cast("long").as("n"),
      momentAggs: _*)
    val scored = clean.crossJoin(broadcast(m))
    val nD = col("n").cast("double")
    val score = features.map { f =>
      val mu = col(s"sx_$f").cast("double") / nD
      val v = (col(s"sxx_$f").cast("double") -
        col(s"sx_$f").cast("double") * col(s"sx_$f").cast("double") / nD) /
        (nD - 1.0)
      val d = col(f).cast("double") - mu
      // a constant feature has zero variance and zero information — its
      // term is 0, not a divide-by-zero Infinity poisoning every score
      when(v === 0.0, lit(0.0)).otherwise(d * d / v)
    }.reduce(_ + _)
    scored
      .select(col(idCol) +: features.map(col) :+
        round(score, 4).as("score"): _*)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Per-group ROC AUC of a score against a binary label, computed exactly
    * as the Mann-Whitney U statistic: AUC = (Σ avg-ranks of positives −
    * n⁺(n⁺+1)/2) / (n⁺·n⁻), with midranks for score ties (the standard
    * tie treatment — counts a tied positive/negative pair as half
    * concordant). The classifier-quality audit per slice ("does the
    * quality score actually separate keep from drop IN EVERY source?") —
    * a global AUC hides a slice where the score is inverted.
    *
    * One rank window per group (shuffle on the group key, sort within),
    * midranks from rank() + (tie-count−1)/2 — all integer arithmetic
    * until the final division, so the result is engine-exact. Degenerate
    * groups (no positives or no negatives) emit null AUC rather than
    * vanishing. */
  def groupAuc(df: DataFrame, groupCol: String, score: Column,
               label: Column): DataFrame = {
    val base = df.filter(score.isNotNull && label.isNotNull)
      .select(col(groupCol).as("g"), score.as("s"),
        label.cast("boolean").as("y"))
    val r = rank().over(Window.partitionBy(col("g")).orderBy(col("s")))
    val tc = count(lit(1)).over(Window.partitionBy(col("g"), col("s")))
    val ranked = base
      .withColumn("ar",
        r.cast("double") + (tc.cast("double") - 1.0) / 2.0)
    val np = sum(when(col("y"), 1L).otherwise(0L))
    val nn = sum(when(!col("y"), 1L).otherwise(0L))
    ranked.groupBy(col("g"))
      .agg(np.as("np"), nn.as("nn"),
        sum(when(col("y"), col("ar")).otherwise(lit(0.0))).as("rpos"))
      .select(col("g").as(groupCol),
        col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        round(when(col("np") === 0 || col("nn") === 0,
          lit(null).cast("double"))
          .otherwise((col("rpos") -
            col("np").cast("double") * (col("np").cast("double") + 1.0) / 2.0)
            / (col("np").cast("double") * col("nn").cast("double"))), 4)
          .as("auc"))
  }

  /** Mixture sequential probability ratio test (mSPRT) — the always-valid
    * p-value an experimentation platform shows on a LIVE dashboard: unlike
    * a fixed-horizon t-test, it stays valid under continuous monitoring
    * (peeking), because the mixture likelihood ratio is a martingale under
    * the null. Normal mixture with variance `tau2` over the treatment
    * effect; two-sample form with plug-in variance
    * `V = s²_a/n_a + s²_b/n_b`:
    *
    *   Λ = sqrt(V/(V+τ²)) · exp(δ²τ² / (2V(V+τ²))),  p = min(1, 1/Λ)
    *
    * One conditional-moment pass per group (map-side partials — the 100 TB
    * cost is the scan, as [[welchTTest]]); the mixture algebra is a
    * per-group scalar epilogue. */
  def msprt(df: DataFrame, groupCol: String, arm: Column, valueCol: String,
            tau2: Double): DataFrame = {
    require(tau2 > 0, "tau2 > 0")
    val v = col(valueCol).cast("double")
    val m = df.filter(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(when(arm, 1L).otherwise(0L)).as("nb"),
        sum(when(!arm, 1L).otherwise(0L)).as("na"),
        sum(when(arm, v).otherwise(lit(0.0))).as("sb"),
        sum(when(!arm, v).otherwise(lit(0.0))).as("sa"),
        sum(when(arm, v * v).otherwise(lit(0.0))).as("ssb"),
        sum(when(!arm, v * v).otherwise(lit(0.0))).as("ssa"))
    val va = (col("ssa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("ssb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val vn = va / col("na") + vb / col("nb")
    val delta = col("sb") / col("nb") - col("sa") / col("na")
    val lam = sqrt(vn / (vn + lit(tau2))) *
      exp(delta * delta * lit(tau2) / (lit(2.0) * vn * (vn + lit(tau2))))
    m.select(col(groupCol),
      (col("na") + col("nb")).cast("long").as("n"),
      round(delta, 4).as("delta"),
      round(lam, 4).as("lambda"),
      round(least(lit(1.0), lit(1.0) / lam), 4).as("always_valid_p"))
  }

  /** Yuen's trimmed-mean t-test between two arms: Welch's t on `trim`-
    * trimmed means with winsorized variances — the robust two-sample test
    * that a single whale user cannot move (plain Welch on revenue-like
    * metrics is dominated by the tail; trimming is the standard fix that
    * still comes with a valid reference distribution).
    *
    * Per arm: g = floor(trim·n) observations clipped per tail; trimmed
    * mean over the middle h = n−2g; winsorized variance s²w over values
    * clamped to the (g+1)-th / (n−g)-th order statistics;
    * d = (n−1)s²w/(h(h−1)); t = Δ(trimmed means)/√(d_a+d_b) with the
    * Welch–Satterthwaite df on (h−1). Values stay DECIMAL through
    * clamping, so all moments are exact and the statistic is
    * engine-deterministic. One rank window per arm + one moment pass. */
  def yuenTrimmedT(df: DataFrame, arm: Column, valueCol: String,
                   trim: Double): DataFrame = {
    require(trim > 0 && trim < 0.5, "trim in (0, 0.5)")
    val base = df.filter(col(valueCol).isNotNull)
      .select(arm.as("b"), col(valueCol).cast("decimal(18,2)").as("v"))
    val w = Window.partitionBy(col("b")).orderBy(col("v"))
    val wc = Window.partitionBy(col("b"))
    val ranked = base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .withColumn("g", floor(lit(trim) * col("n").cast("double")))
    val lims = ranked.groupBy(col("b"))
      .agg(max(when(col("rn") === col("g") + 1, col("v"))).as("lo"),
        max(when(col("rn") === col("n") - col("g"), col("v"))).as("hi"))
    val winz = ranked.join(broadcast(lims), Seq("b"))
      .withColumn("wv", greatest(col("lo"), least(col("hi"), col("v"))))
      .withColumn("mid",
        col("rn") > col("g") && col("rn") <= col("n") - col("g"))
    val m = winz.groupBy(col("b"))
      .agg(max(col("n")).cast("long").as("n"),
        (max(col("n") - lit(2) * col("g"))).cast("long").as("h"),
        (sum(when(col("mid"), col("v"))).cast("double") /
          sum(when(col("mid"), 1L).otherwise(0L)).cast("double")).as("mt"),
        sum(col("wv")).cast("double").as("sw"),
        sum(col("wv") * col("wv")).cast("double").as("sww"))
      .withColumn("s2w", (col("sww") - col("sw") * col("sw") /
        col("n").cast("double")) / (col("n").cast("double") - 1.0))
      .withColumn("d", (col("n").cast("double") - 1.0) * col("s2w") /
        (col("h").cast("double") * (col("h").cast("double") - 1.0)))
    val a = m.filter(!col("b")).select(col("n").as("n_a"), col("h").as("h_a"),
      col("mt").as("mt_a"), col("d").as("d_a"))
    val bb = m.filter(col("b")).select(col("n").as("n_b"), col("h").as("h_b"),
      col("mt").as("mt_b"), col("d").as("d_b"))
    val den = col("d_a") + col("d_b")
    a.crossJoin(broadcast(bb))
      .select(col("n_a"), col("n_b"), col("h_a"), col("h_b"),
        round(col("mt_a"), 4).as("tmean_a"),
        round(col("mt_b"), 4).as("tmean_b"),
        round((col("mt_b") - col("mt_a")) / sqrt(den), 4).as("t_stat"),
        round(den * den /
          (col("d_a") * col("d_a") / (col("h_a").cast("double") - 1.0) +
            col("d_b") * col("d_b") / (col("h_b").cast("double") - 1.0)), 2)
          .as("df"))
  }

  /** Post-stratified mean: reweight a (hash-deterministic) sample's
    * per-stratum means by the POPULATION stratum shares — the survey
    * estimator that removes sampling imbalance across strata
    * (est = Σ Wₛ·x̄ₛ, SE = √(Σ Wₛ²·s²ₛ/nₛ)), the estimation-side
    * complement of [[neymanAllocation]]'s planning. Emits the naive
    * sample mean alongside, so the correction is visible. Population
    * shares are exact integer ratios; per-stratum moments are
    * DECIMAL-exact; only the final Σ over |strata| terms is fp. */
  def postStratifiedMean(population: DataFrame, strataCol: String,
                         valueCol: String, sample: DataFrame): DataFrame = {
    val popW = population.groupBy(col(strataCol).as("s"))
      .agg(count(lit(1)).cast("long").as("n_pop"))
    val samp = sample
      .filter(col(valueCol).isNotNull)
      .select(col(strataCol).as("s"),
        col(valueCol).cast("decimal(18,2)").as("v"))
    val sm = samp.groupBy(col("s"))
      .agg(count(lit(1)).cast("long").as("n_s"),
        sum(col("v")).cast("double").as("sx"),
        sum(col("v") * col("v")).cast("double").as("sxx"))
      .withColumn("mean_s", col("sx") / col("n_s").cast("double"))
      .withColumn("var_s", (col("sxx") - col("sx") * col("sx") /
        col("n_s").cast("double")) / (col("n_s").cast("double") - 1.0))
    val joined = popW.join(sm, Seq("s")).crossJoin(
      broadcast(popW.agg(sum(col("n_pop")).cast("long").as("n_pop_t"))))
      .withColumn("w", col("n_pop").cast("double") /
        col("n_pop_t").cast("double"))
    joined.agg(
        max(col("n_pop_t")).as("n_population"),
        sum(col("n_s")).cast("long").as("n_sample"),
        (sum(col("sx")) / sum(col("n_s")).cast("double")).as("naive"),
        sum(col("w") * col("mean_s")).as("ps"),
        sum(col("w") * col("w") * col("var_s") /
          col("n_s").cast("double")).as("v"))
      .select(col("n_population"), col("n_sample"),
        round(col("naive"), 4).as("naive_mean"),
        round(col("ps"), 4).as("poststrat_mean"),
        round(sqrt(col("v")), 4).as("se"))
  }

  /** Difference-in-differences: the 2×2 (treat × post) panel estimator
    * `(T_post − T_pre) − (C_post − C_pre)` with its four-cell pooled SE
    * `sqrt(Σ s²_cell/n_cell)` — the pre-period differences out any fixed
    * group gap, so the estimate isolates the post-period treatment shift
    * under the parallel-trends assumption. One conditional-moment pass
    * over the facts (4 cells × 3 moments, all map-side partials); output
    * is one row. */
  def diffInDiff(df: DataFrame, treat: Column, post: Column,
                 valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val cells = Seq(("tp", true, true), ("t0", true, false),
      ("cp", false, true), ("c0", false, false))
    val aggs = cells.flatMap { case (tag, t, p) =>
      val in = (if (t) treat else !treat) && (if (p) post else !post)
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$tag"),
        sum(when(in, v).otherwise(lit(0.0))).as(s"s_$tag"),
        sum(when(in, v * v).otherwise(lit(0.0))).as(s"ss_$tag"))
    }
    val m = df.filter(v.isNotNull).agg(aggs.head, aggs.tail: _*)
    def mean(tag: String): Column = col(s"s_$tag") / col(s"n_$tag")
    def varTerm(tag: String): Column =
      ((col(s"ss_$tag") - col(s"s_$tag") * col(s"s_$tag") / col(s"n_$tag")) /
        (col(s"n_$tag") - 1)) / col(s"n_$tag")
    val did = (mean("tp") - mean("t0")) - (mean("cp") - mean("c0"))
    val se = sqrt(varTerm("tp") + varTerm("t0") + varTerm("cp") +
      varTerm("c0"))
    m.select(
      (col("n_tp") + col("n_t0") + col("n_cp") + col("n_c0")).cast("long")
        .as("n"),
      round(mean("t0"), 4).as("treat_pre"),
      round(mean("tp"), 4).as("treat_post"),
      round(mean("c0"), 4).as("control_pre"),
      round(mean("cp"), 4).as("control_post"),
      round(did, 4).as("did"),
      round(se, 6).as("se"),
      round(did / se, 4).as("z"))
  }

  /** Exact histogram Wasserstein-1 (earth-mover distance) and
    * Kolmogorov-Smirnov statistic of each group's value distribution
    * against the POOLED corpus — the drift metric family beyond PSI/chi²:
    * EMD is the area between the CDFs in VALUE units (how far mass must
    * move), KS the largest CDF gap. Together they say both "how different"
    * and "different where it matters" (EMD weights tail mass by distance;
    * KS is location-free).
    *
    * Scale shape: one pass bins every row into `nBins` equi-width buckets
    * (global min/max from a 1-row broadcast), then ALL remaining work runs
    * on the groups×bins grid — bounded by the parameter, never by rows.
    * CDF windows are partitioned (by group over ≤nBins rows, by bin over
    * ≤|groups| rows); the |F_g − F_pool| terms keep exact INTEGER
    * numerators (|cum_g·N − C_b·n_g| in DECIMAL(38,0)), so the statistic
    * is bit-reproducible across engines and partitionings — fp enters only
    * in the final one-shot division per group. */
  def emdDrift(df: DataFrame, groupCol: String, valueCol: String,
               nBins: Int = 64): DataFrame = {
    require(nBins >= 2 && nBins <= 4096, "nBins in [2, 4096]")
    val spark = df.sparkSession
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
    val ext = base.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    // degenerate all-equal corpus: every row lands in bin 0, EMD = KS = 0
    val binIdx = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(lit((nBins - 1).toLong),
        floor((col("v") - col("lo")) / (col("hi") - col("lo")) * nBins)
          .cast("long")))
    val counts = base.crossJoin(broadcast(ext))
      .select(col("g"), binIdx.as("b"))
      .groupBy(col("g"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))
    // dense grid: a group's missing bins are zero-count rows, or its CDF
    // (and the pooled per-bin sum) silently skips mass
    val bins = spark.range(nBins).select(col("id").as("b"))
    val grid = counts.select(col("g")).distinct()
      .crossJoin(broadcast(bins))
      .join(counts, Seq("g", "b"), "left")
      .select(col("g"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wgAll = Window.partitionBy(col("g"))
    val wb = Window.partitionBy(col("b"))
    val total = counts.agg(sum(col("c")).cast("long").as("total"))
    val dev = grid
      .withColumn("cum", sum(col("c")).over(wg))
      .withColumn("n_g", sum(col("c")).over(wgAll))
      .withColumn("cb", sum(col("cum")).over(wb))
      .crossJoin(broadcast(total))
      .select(col("g"), col("n_g"),
        abs(col("cum").cast("decimal(38,0)") *
          col("total").cast("decimal(38,0)") -
          col("cb").cast("decimal(38,0)") *
          col("n_g").cast("decimal(38,0)")).as("dev"),
        col("total"))
    dev.groupBy(col("g"))
      .agg(max(col("n_g")).as("n_g"), sum(col("dev")).as("num"),
        max(col("dev")).as("ksnum"), max(col("total")).as("total"))
      .crossJoin(broadcast(ext))
      .select(col("g").as(groupCol), col("n_g").cast("long").as("n"),
        round(col("num").cast("double") *
          ((col("hi") - col("lo")) / lit(nBins.toDouble)) /
          (col("n_g").cast("double") * col("total").cast("double")), 6)
          .as("emd"),
        round(col("ksnum").cast("double") /
          (col("n_g").cast("double") * col("total").cast("double")), 6)
          .as("ks"))
  }

  /** Bradley-Terry preference strengths from pairwise comparisons
    * (winner, loser) via `iters` minorization-maximization rounds
    * (Hunter 2004): p_i ← W_i / Σ_j n_ij/(p_i+p_j), renormalized to mean 1
    * each round — the batch model behind preference-data curation and
    * LLM-judge leaderboards (order-free, unlike Elo's sequential fold).
    *
    * Scale shape: one groupBy collapses the comparison stream to the
    * observed-pair win matrix (≤ items² rows, items vocabulary-bounded);
    * every MM round is a self-join on that matrix plus a per-item fold
    * over its (sorted) opponent list — bounded by item degree, never by
    * comparisons. fp determinism: each round's denominator is a left fold
    * over the sorted opponent structs and the mean-1 renormalizer folds
    * the sorted item list, so results are bit-identical across engines
    * and partitionings. */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, "iters in [1, 8]")
    val dirPairs = comparisons
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .select(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"), lit(1L).as("win"))
      .unionByName(comparisons
        .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
        .select(col(loserCol).cast("string").as("i"),
          col(winnerCol).cast("string").as("j"), lit(0L).as("win")))
    // the win matrix is items² rows at most — materialize it ONCE so the
    // (potentially expensive) comparison-generating plan upstream never
    // re-executes inside the MM iterations, which would otherwise replay
    // it ~3× per round through the terms/wins joins
    val pairAgg = dirPairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).cast("long").as("n_ij"),
        sum(col("win")).cast("long").as("w_ij"))
      .localCheckpoint()
    val wins = pairAgg.groupBy(col("i"))
      .agg(sum(col("w_ij")).cast("long").as("wins"),
        sum(col("n_ij")).cast("long").as("n_comp"))
      .localCheckpoint()
    var p = wins.select(col("i"), lit(1.0).as("p"))
    for (_ <- 1 to iters) {
      val pj = p.select(col("i").as("j"), col("p").as("pj"))
      val terms = pairAgg.join(pj, Seq("j")).join(p, Seq("i"))
        .groupBy(col("i"), col("p"))
        .agg(sort_array(collect_list(
          struct(col("j"), col("n_ij"), col("pj")))).as("ts"))
      val raw = terms.join(wins, Seq("i"))
        .select(col("i"), (col("wins").cast("double") /
          aggregate(col("ts"), lit(0.0),
            (acc, x) => acc + x("n_ij").cast("double") /
              (col("p") + x("pj")))).as("praw"))
      val norm = raw
        .agg(sort_array(collect_list(struct(col("i"), col("praw"))))
          .as("ls"))
        .select((aggregate(col("ls"), lit(0.0),
          (acc, x) => acc + x("praw")) /
          size(col("ls")).cast("double")).as("pbar"))
      // items rows; cuts the per-round lineage (the pageRank contract)
      p = raw.crossJoin(broadcast(norm))
        .select(col("i"), (col("praw") / col("pbar")).as("p"))
        .localCheckpoint()
    }
    p.join(wins, Seq("i"))
      .select(col("i").as("item"), col("wins"), col("n_comp"),
        round(col("p"), 4).as("strength"))
  }

  /** Delete-one-group jackknife standard error for the corpus mean: units
    * hash into `nGroups` pseudo-replicates; each leave-one-out mean is
    * (S−s_g)/(N−n_g) from EXACT decimal/integer group moments, and
    * SE² = (G−1)/G · Σ (LOO_g − mean LOO)². The cheap honest SE when the
    * Poisson bootstrap's B passes are too dear: ONE aggregation pass,
    * G bounded driver-free rows, and — unlike the naive s/√n — it stays
    * valid when units contribute correlated rows (whole units leave
    * together).
    *
    * fp determinism: group sums are exact DECIMAL, each LOO mean is one
    * division, and both the jackknife mean and the deviance sum fold the
    * SORTED G-row list — bit-identical across engines/partitionings. */
  def jackknifeGroupSE(df: DataFrame, unitCol: Column, valueCol: String,
                       nGroups: Int = 24): DataFrame = {
    require(nGroups >= 2 && nGroups <= 1024, "nGroups in [2, 1024]")
    val base = df.filter(col(valueCol).isNotNull && unitCol.isNotNull)
      .select(pmod(graft.functions.Hashes.portableHash32(
        unitCol.cast("string")), lit(nGroups.toLong)).as("g"),
        col(valueCol).cast("decimal(18,2)").as("v"))
    val grp = base.groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n_g"), sum(col("v")).as("s_g"))
    val tot = grp.agg(sum(col("n_g")).cast("long").as("n"),
      sum(col("s_g")).cast("decimal(38,2)").as("s"))
    val loo = grp.crossJoin(broadcast(tot))
      .select(col("g"),
        ((col("s") - col("s_g")).cast("double") /
          (col("n") - col("n_g")).cast("double")).as("loo"))
    val gd = size(col("ls")).cast("double")
    loo.agg(sort_array(collect_list(struct(col("g"), col("loo")))).as("ls"))
      .crossJoin(broadcast(tot))
      .withColumn("jm", aggregate(col("ls"), lit(0.0),
        (acc, x) => acc + x("loo")) / gd)
      .select(col("n").as("n_rows"), size(col("ls")).cast("long")
        .as("n_groups"),
        round(col("s").cast("double") / col("n").cast("double"), 4)
          .as("theta"),
        round(col("jm"), 4).as("jack_mean"),
        round(sqrt((gd - lit(1.0)) / gd * aggregate(col("ls"), lit(0.0),
          (acc, x) => acc + (x("loo") - col("jm")) *
            (x("loo") - col("jm")))), 6).as("se_jack"))
  }

  /** Spearman rank correlation per group — the monotone-association
    * number that survives outliers and nonlinear scales where Pearson
    * (q198/q153) lies. Midranks handle ties exactly: rank(v) =
    * #smaller + (#tied+1)/2, computed on the per-group VALUE GRID (one
    * count per distinct value + a cumulative window over the grid), so
    * the window scans |distinct values| rows, never data rows — the
    * q245/q151 bounded-grid contract. Rows pick up their ranks by two
    * joins against the tiny grid tables.
    *
    * Exactness: ranks are doubled into integers (2·midrank is always
    * whole), all five Pearson moments over (2rx, 2ry) are exact
    * DECIMAL(38,0) sums — the ×2 cancels in the correlation — and ρ is
    * one sqrt-and-divide over exact integers, same operation order both
    * engines. Degenerate groups (a constant side) emit null ρ. */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol).as("g"), col(xCol).as("x"), col(yCol).as("y"))
      .localCheckpoint(eager = false) // rank grids + the rank-join spine
    def gridRanks(v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("g")).orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, 0)
      base.groupBy(col("g"), col(v))
        .agg(count(lit(1)).cast("long").as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        // 2·midrank = 2·(cum−c) + c + 1 — integer even under ties
        .select(col("g"), col(v),
          (lit(2L) * (col("cum") - col("c")) + col("c") + 1L).as(out))
    }
    // no broadcast hint: the grid is value-space-bounded for the intended
    // discrete columns, but a continuous column would blow an 8 GB forced
    // broadcast — let AQE pick (it broadcasts the small grids anyway)
    base
      .join(gridRanks("x", "rx"), Seq("g", "x"))
      .join(gridRanks("y", "ry"), Seq("g", "y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("rx")).cast("decimal(38,0)").as("sx"),
        sum(col("ry")).cast("decimal(38,0)").as("sy"),
        sum(col("rx") * col("ry")).cast("decimal(38,0)").as("sxy"),
        sum(col("rx") * col("rx")).cast("decimal(38,0)").as("sxx"),
        sum(col("ry") * col("ry")).cast("decimal(38,0)").as("syy"))
      .select(col("g").as(groupCol), col("n").cast("long").as("n_rows"),
        round(when(
          (col("n") * col("sxx") - col("sx") * col("sx")) === 0 ||
            (col("n") * col("syy") - col("sy") * col("sy")) === 0, null)
          .otherwise(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))), 4).as("spearman_rho"))
  }

  /** Range-partitioner audit: compute split bounds from a DETERMINISTIC
    * hash sample (the repartitionByRange recipe, made reproducible) and
    * report each partition's REALIZED row count and skew ratio — the
    * pre-flight for any global sort / range shuffle: sampled bounds that
    * looked fine can still land 3× on one partition when the column is
    * stepped or heavy-tailed, and that partition is the straggler. Bound
    * i is the smallest sampled value whose cumulative sample count
    * reaches ⌈i·S/n⌉ (exact grid quantiles of the sample, no
    * interpolation); assignment joins the value grid against the ≤n−1
    * broadcast bounds. All counts exact; one division per output cell. */
  def rangePartitionAudit(df: DataFrame, idCol: String, valueCol: String,
                          nParts: Int, samplePct: Int = 5): DataFrame = {
    require(nParts >= 2 && nParts <= 4096, "nParts in [2, 4096]")
    require(samplePct >= 1 && samplePct <= 100, "samplePct in [1, 100]")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).cast("string").as("id"), col(valueCol).as("v"))
    val grid = base.groupBy(col("v"))
      .agg(count(lit(1)).cast("long").as("c"),
        sum(when(pmod(graft.functions.Hashes.portableHash32(col("id")),
          lit(100L)) < samplePct, 1L).otherwise(0L)).cast("long")
          .as("sc"))
      .localCheckpoint(eager = false) // bounds + the assignment pass
    val wv = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val sampled = grid.filter(col("sc") > 0)
      .withColumn("cum", sum(col("sc")).over(wv))
    val stot = sampled.agg(sum(col("sc")).cast("long").as("st"))
    val bounds = sampled.crossJoin(broadcast(stot))
      .withColumn("i", explode(sequence(lit(1), lit(nParts - 1))))
      // smallest sampled v reaching the i-th exact sample quantile
      .filter(col("cum") * nParts >= col("i") * col("st"))
      .groupBy(col("i")).agg(min(col("v")).as("bound"))
    val assigned = grid.join(broadcast(bounds),
        col("v") >= col("bound"), "left")
      .groupBy(col("v"), col("c"))
      .agg(count(col("i")).cast("int").as("partition"))
    val tot = grid.agg(sum(col("c")).cast("long").as("nt"))
    assigned.groupBy(col("partition"))
      .agg(sum(col("c")).cast("long").as("n_rows"))
      .crossJoin(broadcast(tot))
      .select(col("partition").cast("long").as("partition"),
        col("n_rows"),
        round(col("n_rows").cast("double") / col("nt").cast("double"), 6)
          .as("share"),
        round(col("n_rows").cast("double") * nParts /
          col("nt").cast("double"), 4).as("skew_ratio"))
  }

  /** Iterative proportional fitting (raking) of a two-way contingency
    * table to UNIFORM target margins: the survey-calibration step that
    * turns a biased collection into one whose row and column totals match
    * the design — [[postStratifiedMean]] corrects ONE margin exactly;
    * raking reconciles both when the joint target is unknown. Fixed
    * `iters` alternating row/column scalings (the deterministic-loop
    * contract of pageRank/BPE); each scaling is a ≤|rows|- or
    * ≤|cols|-bounded join, and every margin total folds the SORTED cell
    * list so the fp sequence is engine-identical. Output per cell: raw
    * count, the raking weight, and the fitted share. */
  def ipfRaking(df: DataFrame, rowCol: Column, colCol: Column,
                iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters in [1, 10]")
    val cells = df.filter(rowCol.isNotNull && colCol.isNotNull)
      .groupBy(rowCol.cast("string").as("r"), colCol.cast("string").as("c"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint() // the fixpoint re-reads it every scaling
    val dims = cells.agg(countDistinct(col("r")).cast("double").as("nr"),
      countDistinct(col("c")).cast("double").as("nc"),
      sum(col("n")).cast("double").as("nt")).collect().head
    val (nr, nc, nt) = (dims.getDouble(0), dims.getDouble(1),
      dims.getDouble(2))
    var w = cells.select(col("r"), col("c"), col("n"), lit(1.0).as("w"))
    def scale(key: String, targetShare: Double): Unit = {
      val tot = w.groupBy(col(key))
        .agg(sort_array(collect_list(struct(
          (if (key == "r") col("c") else col("r")).as("o"),
          (col("w") * col("n").cast("double")).as("m")))).as("ls"))
        .select(col(key), aggregate(col("ls"), lit(0.0),
          (a, e) => a + e("m")).as("mt"))
      w = w.join(tot, Seq(key))
        .select(col("r"), col("c"), col("n"),
          (col("w") * lit(targetShare * nt) / col("mt")).as("w"))
        .localCheckpoint()
    }
    (1 to iters).foreach { _ =>
      scale("r", 1.0 / nr)
      scale("c", 1.0 / nc)
    }
    w.select(col("r"), col("c"), col("n"), round(col("w"), 6).as("weight"),
      round(col("w") * col("n").cast("double") / nt, 6).as("fitted_share"))
  }

  /** Two-proportion z-test on an ordered funnel step between two arms:
    * a user converts iff an `eventB` STRICTLY FOLLOWS their first
    * `eventA`; rates compare via the pooled-variance z (the experiment
    * readout for "did the variant move step conversion"), with |z| >
    * 1.96 as the two-sided 5% flag. Counts are exact (two aggregates +
    * one semi-join on the user spine — nothing scales past the user
    * count); z is a fixed-order double expression both engines replay. */
  def funnelConversionTest(df: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, eventA: String, eventB: String,
                           armB: Column): DataFrame = {
    val base = df.filter(col(tsCol).isNotNull && col(typeCol).isNotNull &&
      col(userCol).isNotNull)
      .select(col(userCol).as("u"), armB.as("arm"), col(typeCol).as("t"),
        col(tsCol).as("ts"))
      .localCheckpoint(eager = false) // entry aggregate + follow-up join
    val entered = base.filter(col("t") === eventA)
      .groupBy(col("u"), col("arm"))
      .agg(min(col("ts")).as("ta"))
    val converted = entered.join(
        base.filter(col("t") === eventB)
          .select(col("u"), col("ts").as("tb")), Seq("u"))
      .filter(col("tb") > col("ta"))
      .select(col("u"), col("arm")).distinct()
      .groupBy(col("arm")).agg(count(lit(1)).cast("long").as("conv"))
    val arms = entered.groupBy(col("arm"))
      .agg(count(lit(1)).cast("long").as("n"))
      .join(converted, Seq("arm"), "left")
      .select(col("arm"), col("n"), coalesce(col("conv"), lit(0L))
        .as("conv"))
    // ONE pivoted aggregate over the (<=2)-row arm frame, not an a×b
    // crossJoin: with a degenerate (zero-entered) arm the crossJoin had
    // an empty side and silently VANISHED the whole report — the
    // surviving arm's counts must stay visible, with null rate/z for
    // what cannot be computed (ADVICE r11)
    val one = arms.agg(
      coalesce(max(when(!col("arm"), col("n"))), lit(0L)).as("n_a"),
      coalesce(max(when(!col("arm"), col("conv"))), lit(0L)).as("conv_a"),
      coalesce(max(when(col("arm"), col("n"))), lit(0L)).as("n_b"),
      coalesce(max(when(col("arm"), col("conv"))), lit(0L)).as("conv_b"))
    val pa = when(col("n_a") > 0,
      col("conv_a").cast("double") / col("n_a").cast("double"))
    val pb = when(col("n_b") > 0,
      col("conv_b").cast("double") / col("n_b").cast("double"))
    val pp = when(col("n_a") + col("n_b") > 0,
      (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double"))
    // a pooled rate of exactly 0 or 1 has zero variance: z undefined
    // (null), not an ANSI divide-by-zero; an empty arm likewise leaves
    // its rate (and so z) null
    val z = when(pa.isNotNull && pb.isNotNull && pp > 0.0 && pp < 1.0,
      (pb - pa) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double"))))
    one.select(col("n_a"), col("conv_a"), round(pa, 6).as("rate_a"),
      col("n_b"), col("conv_b"), round(pb, 6).as("rate_b"),
      round(z, 4).as("z"),
      (abs(z) > 1.959963984540054).as("significant_5pct"))
  }

  /** Murphy decomposition of the Brier score over a fixed bin grid:
    * reliability (how far bin-mean forecasts sit from bin outcome rates
    * — lower is better-calibrated), resolution (how far bin outcome
    * rates spread from the base rate — higher is more informative), and
    * uncertainty (the base rate's own variance, the no-skill floor).
    * Complements [[calibrationReport]]'s ECE: REL/RES separate "honest"
    * from "useful". Binning makes the classic identity Brier = REL −
    * RES + UNC hold only up to within-bin forecast variance; the exact
    * Brier is reported alongside so the residual is visible, not
    * assumed away.
    *
    * Exactness: scores round to 12 decimals and sum as DECIMAL (the
    * q276 contract), so bin means are single divisions; the bin-level
    * folds run in bin order on both engines; Brier's numerator is
    * Σf² − 2Σ(f·y) + pos — exact decimals, one division. */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         nBins: Int = 20): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "nBins in [2, 1000]")
    val f = round(col(scoreCol), 12).cast("decimal(20,12)")
    val binned = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(least(lit(nBins - 1), greatest(lit(0),
        floor(col(scoreCol) * nBins).cast("int"))).as("bin"),
        f.as("f"), col(labelCol).cast("boolean").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).cast("long").as("pos"),
        sum(col("f")).cast("decimal(38,12)").as("sf"),
        sum((col("f") * col("f")).cast("decimal(38,24)"))
          .cast("decimal(38,24)").as("sf2"),
        sum(when(col("y"), col("f"))).cast("decimal(38,12)").as("sfy"))
    val folded = binned
      .agg(sort_array(collect_list(struct(col("bin"), col("n"),
        col("pos"), col("sf"), col("sf2"), col("sfy")))).as("ls"))
      .select(col("ls"),
        aggregate(col("ls"), lit(0L), (a, e) => a + e("n")).as("nt"),
        aggregate(col("ls"), lit(0L), (a, e) => a + e("pos")).as("pt"),
        aggregate(col("ls"), lit(0).cast("decimal(38,12)"),
          (a, e) => (a + e("sf")).cast("decimal(38,12)")).as("sft"),
        aggregate(col("ls"), lit(0).cast("decimal(38,24)"),
          (a, e) => (a + e("sf2")).cast("decimal(38,24)")).as("sf2t"),
        aggregate(col("ls"), lit(0).cast("decimal(38,12)"),
          (a, e) => coalesce((a + e("sfy")).cast("decimal(38,12)"), a))
          .as("sfyt"))
    val ntD = col("nt").cast("double")
    val obar = col("pt").cast("double") / ntD
    val rel = aggregate(col("ls"), lit(0.0), (a, e) => {
      val fb = e("sf").cast("double") / e("n").cast("double")
      val ob = e("pos").cast("double") / e("n").cast("double")
      a + e("n").cast("double") * (fb - ob) * (fb - ob)
    }) / ntD
    val res = aggregate(col("ls"), lit(0.0), (a, e) => {
      val ob = e("pos").cast("double") / e("n").cast("double")
      a + e("n").cast("double") * (ob - obar) * (ob - obar)
    }) / ntD
    folded.select(col("nt").as("n_rows"),
      round(obar, 6).as("base_rate"),
      round((col("sf2t").cast("double") -
        lit(2.0) * col("sfyt").cast("double") +
        col("pt").cast("double")) / ntD, 6).as("brier"),
      round(rel, 6).as("reliability"),
      round(res, 6).as("resolution"),
      round(obar * (lit(1.0) - obar), 6).as("uncertainty"))
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE aggregation
    * pass: the k + k(k+1)/2 exact DECIMAL moments (sums, squares, cross
    * products) land in a single map-side-combinable aggregate — one scan
    * for the whole matrix, where per-pair `corr()` calls would re-scan
    * k(k−1)/2 times. Output is the upper triangle as rows; each r is the
    * usual moment formula evaluated in one fixed operation order. Rows
    * with a NULL in ANY of the columns are excluded (listwise deletion,
    * the convention that keeps all pairs on the same n). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 12, "2 to 12 columns")
    // values scale to integer CENTS so every moment is a plain integer —
    // the common scale cancels in r, and both engines do the identical
    // integer arithmetic (DuckDB carries it in HUGEINT)
    val clean = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        (col(c).cast("decimal(18,2)") * 100).cast("decimal(20,0)")
          .as(c)): _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val momentAggs =
      cols.map(c => sum(col(c)).cast("decimal(38,0)").as(s"s_$c")) ++
      cols.map(c => sum(col(c) * col(c)).cast("decimal(38,0)")
        .as(s"ss_$c")) ++
      pairs.map { case (a, b) =>
        sum(col(a) * col(b)).cast("decimal(38,0)").as(s"sp_${a}_$b") }
    val m = clean.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      momentAggs: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n_rows"),
        round(
          (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
            .cast("double") /
            sqrt((col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
              .cast("double") *
              (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
              .cast("double")), 4).as("pearson_r"))
    }
    m.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Off-policy evaluation of a greedy target policy by IPS and SNIPS
    * over a logged (context, action, reward) stream: the behavior
    * propensity is LAPLACE-SMOOTHED per context, p̂(a|x) =
    * (n_xa+1)/(n_x+|A|) — the clipping every production IPS applies,
    * and what keeps IPS and SNIPS genuinely different (with raw
    * empirical propensities the weights telescope and the two estimators
    * collapse to the same number). The target policy π(x) picks the
    * action with the highest historical mean reward (ties to the
    * lexicographically smaller action). In-sample propensities and an
    * in-sample-greedy target make this the MACHINERY gate, not a causal
    * claim — swap in logged propensities and a real candidate policy at
    * deployment.
    *
    * Everything reduces to the bounded (context × action) frame —
    * contexts must be LOW-cardinality (a bucketing, not a user id). Each
    * context's matched term is one decimal·integer product and one
    * division; the cross-context sums fold a SORTED |contexts|-row list,
    * so the fp order is engine-identical (the q267 jackknife pattern). */
  def ipsPolicyValue(df: DataFrame, contextCol: Column, actionCol: String,
                     rewardCol: String): DataFrame = {
    val base = df
      .filter(col(actionCol).isNotNull && col(rewardCol).isNotNull)
      .select(contextCol.cast("string").as("x"),
        col(actionCol).cast("string").as("a"),
        col(rewardCol).cast("decimal(18,2)").as("r"))
    val xa = base.groupBy(col("x"), col("a"))
      .agg(count(lit(1)).cast("long").as("n_xa"), sum(col("r")).as("s_xa"))
      .localCheckpoint(eager = false) // argmax + matched sums + |A|
    val nActions = xa.agg(countDistinct(col("a")).cast("long").as("n_act"))
    val nx = xa.groupBy(col("x"))
      .agg(sum(col("n_xa")).cast("long").as("n_x"),
        sum(col("s_xa")).cast("decimal(38,2)").as("s_x"))
    // greedy target: argmax over mean reward, ties to the smaller action
    // (exact-decimal single-division means -> identical order both engines)
    val w = Window.partitionBy(col("x"))
      .orderBy((col("s_xa").cast("double") / col("n_xa").cast("double"))
        .desc, col("a"))
    val pi = xa.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("x"), col("a").as("pi_a"), col("n_xa").as("n_m"),
        col("s_xa").cast("decimal(38,2)").as("s_m"))
    // per-context matched term with the smoothed inverse propensity
    // iw = (n_x + |A|)/(n_m + 1); sums fold the sorted context list
    val per = pi.join(nx, Seq("x")).crossJoin(broadcast(nActions))
      .select(col("x"), col("n_x"), col("s_x"), col("n_m"),
        ((col("n_x") + col("n_act")).cast("double") /
          (col("n_m") + 1L).cast("double")).as("iw"),
        col("s_m").cast("double").as("sm"))
    val folded = per
      .agg(sort_array(collect_list(struct(col("x"), col("n_x"),
        col("s_x"), col("n_m"), col("iw"), col("sm")))).as("ls"))
      .select(col("ls"),
        aggregate(col("ls"), lit(0L), (a, e) => a + e("n_x")).as("n_logs"),
        aggregate(col("ls"), lit(0L), (a, e) => a + e("n_m"))
          .as("n_matched"),
        aggregate(col("ls"), lit(0).cast("decimal(38,2)"),
          (a, e) => (a + e("s_x")).cast("decimal(38,2)")).as("s_all"),
        aggregate(col("ls"), lit(0.0), (a, e) => a + e("sm") * e("iw"))
          .as("wr"),
        aggregate(col("ls"), lit(0.0),
          (a, e) => a + e("n_m").cast("double") * e("iw")).as("wsum"))
    folded.select(size(col("ls")).cast("long").as("n_contexts"),
      col("n_logs"), col("n_matched"),
      round(col("s_all").cast("double") / col("n_logs").cast("double"), 4)
        .as("behavior_value"),
      round(col("wr") / col("n_logs").cast("double"), 4).as("ips_value"),
      round(col("wr") / col("wsum"), 4).as("snips_value"),
      round(col("n_matched").cast("double") /
        col("n_logs").cast("double"), 4).as("match_rate"))
  }

  /** Mix-shift decomposition of a mean-metric move between two periods:
    * ΔR = R_B − R_A splits EXACTLY into Σ_s (w_B−w_A)·r_A  (mix: the
    * segment WEIGHTS moved) plus Σ_s w_B·(r_B−r_A)  (rate: behavior
    * WITHIN segments moved) — the first question on any metric regression
    * ("did the metric move, or did the traffic mix?"). Segments present
    * in only one period use the other period's OVERALL mean as their
    * counterfactual rate; the identity holds for any such fill (the
    * filled terms telescope), and deviation-from-average is the standard
    * convention that keeps their contributions interpretable.
    *
    * Shape: one pass to the (segment × period) moment frame (exact
    * decimal sums, single-division weights/rates), then per-segment
    * arithmetic in a fixed operation order. Output: one row per segment
    * with both contributions; the column sums reconstruct ΔR. */
  def mixShiftDecomposition(df: DataFrame, segmentCol: String,
                            periodBCol: Column,
                            valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull &&
      col(segmentCol).isNotNull && periodBCol.isNotNull)
      .select(col(segmentCol).as("s"), periodBCol.as("pb"),
        col(valueCol).cast("decimal(18,2)").as("v"))
    val sp = base.groupBy(col("s"))
      .agg(sum(when(!col("pb"), 1L).otherwise(0L)).cast("long").as("na"),
        sum(when(!col("pb"), col("v"))).cast("decimal(38,2)").as("sa"),
        sum(when(col("pb"), 1L).otherwise(0L)).cast("long").as("nb"),
        sum(when(col("pb"), col("v"))).cast("decimal(38,2)").as("sb"))
      .localCheckpoint(eager = false) // totals + the per-segment pass
    val tot = sp.agg(sum(col("na")).cast("long").as("ta"),
      sum(col("sa")).cast("decimal(38,2)").as("tsa"),
      sum(col("nb")).cast("long").as("tb"),
      sum(col("sb")).cast("decimal(38,2)").as("tsb"))
    val ra = coalesce(col("sa").cast("double") / col("na").cast("double"),
      col("tsa").cast("double") / col("ta").cast("double"))
    val rb = coalesce(col("sb").cast("double") / col("nb").cast("double"),
      col("tsb").cast("double") / col("tb").cast("double"))
    val wa = col("na").cast("double") / col("ta").cast("double")
    val wb = col("nb").cast("double") / col("tb").cast("double")
    sp.crossJoin(broadcast(tot))
      .select(col("s").as(segmentCol),
        col("na").as("n_a"), col("nb").as("n_b"),
        round(wa, 6).as("w_a"), round(wb, 6).as("w_b"),
        round(ra, 4).as("rate_a"), round(rb, 4).as("rate_b"),
        round((wb - wa) * ra, 6).as("mix_contrib"),
        round(wb * (rb - ra), 6).as("rate_contrib"))
  }

  /** Krippendorff's α (nominal) from LONG-format ratings (unit, value) —
    * the inter-annotator agreement that, unlike [[cohenKappa]], handles
    * ANY number of raters and MISSING ratings: units contribute pairable
    * values weighted 1/(m_u−1), so a unit rated twice and a unit rated
    * thrice both enter correctly and single-rating units drop out.
    * α = 1 − D_o/D_e with D_e from the pooled value marginals:
    * α = 1 − (n−1)·D_o / (n² − Σ_c n_c²).
    *
    * Exactness: n and the marginals n_c are INTEGERS (the 1/(m_u−1)
    * weights telescope out of them); only the observed-agreement diagonal
    * carries weights, and for ≤3 raters per unit those are dyadic (1 or
    * 1/2) — fp-exact. With ≥4 raters 1/(m_u−1) stops being dyadic and
    * the sums are same-order-deterministic only (document at call sites
    * needing cross-engine bit equality). Two bounded aggregations over
    * the (unit, value) frame; output is one row. */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
                        ratingCol: String): DataFrame = {
    val vals = ratings.filter(col(ratingCol).isNotNull)
      .select(col(unitCol).as("u"), col(ratingCol).as("c"))
    val uc = vals.groupBy(col("u"), col("c"))
      .agg(count(lit(1)).cast("double").as("muc"))
    val um = uc.groupBy(col("u")).agg(sum(col("muc")).as("mu"))
      .filter(col("mu") >= 2.0)
    val j = uc.join(um, Seq("u"))
      .localCheckpoint(eager = false) // diagonal + marginals
    val diag = j.agg(
      sum(col("muc") * (col("muc") - 1.0) / (col("mu") - 1.0)).as("occ"),
      sum(col("muc")).as("n"),
      countDistinct(col("u")).cast("long").as("n_units"))
    val nc2 = j.groupBy(col("c")).agg(sum(col("muc")).as("nc"))
      .agg(sum(col("nc") * col("nc")).as("snc2"))
    diag.crossJoin(broadcast(nc2))
      .select(col("n_units"), col("n").cast("long").as("n_values"),
        round(col("occ") / col("n"), 6).as("observed_agreement"),
        round(lit(1.0) - (col("n") - 1.0) * (col("n") - col("occ")) /
          (col("n") * col("n") - col("snc2")), 6).as("alpha"))
  }

  /** Precision/recall curve over a fixed `nBins` threshold grid: scores
    * histogram once into [0,1) bins, cumulative-from-the-top windows over
    * the BIN frame (nBins rows, never data rows) give TP and predicted
    * counts at every threshold k/nBins, and F1 collapses to the
    * single-division identity 2·TP/(n_pred + P). The
    * operating-point picker that complements [[calibrationReport]] (is
    * the score honest) and groupAuc (is the ranking good): where do I cut.
    * All counts exact integers; three divisions per row. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              nBins: Int = 20): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "nBins in [2, 1000]")
    val binned = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(least(lit(nBins - 1), greatest(lit(0),
        floor(col(scoreCol) * nBins).cast("int"))).as("bin"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).cast("long").as("pos"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = binned.agg(sum(col("pos")).cast("long").as("p_total"))
    binned
      .withColumn("n_pred", sum(col("n")).over(w).cast("long"))
      .withColumn("tp", sum(col("pos")).over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .select((col("bin").cast("double") / nBins).as("threshold"),
        col("n_pred"), col("tp"),
        round(col("tp").cast("double") / col("n_pred").cast("double"), 6)
          .as("precision"),
        round(when(col("p_total") > 0,
          col("tp").cast("double") / col("p_total").cast("double")), 6)
          .as("recall"),
        round(when(col("n_pred") + col("p_total") > 0,
          lit(2.0) * col("tp").cast("double") /
            (col("n_pred") + col("p_total")).cast("double")), 6).as("f1"))
  }

  /** Kendall τ-b per group between two discrete-valued columns — the
    * tie-corrected concordance coefficient, computed ENTIRELY on the
    * JOINT VALUE GRID: rows collapse to (x, y, count) cells once, and
    * concordant/discordant mass comes from a cell×cell join (each
    * unordered cell pair counted once via x-order), so the quadratic is
    * |grid|², bounded by distinct-value products, never rows². Tie terms
    * n₁/n₂ fall out of the marginals; τ-b = (nc−nd)/√((n₀−n₁)(n₀−n₂)).
    * Everything is exact DECIMAL integer arithmetic up to one final
    * sqrt-and-divide; degenerate groups (either side constant) emit null.
    * The right correlation for ordinal/low-cardinality pairs where
    * [[spearmanByGroup]]'s midranks still over-resolve. */
  def kendallTauB(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val cells = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint() // marginals + both sides of the cell join
    val tot = cells.groupBy(col("g"))
      .agg(sum(col("c")).cast("decimal(38,0)").as("n"))
      .withColumn("n0", col("n") * (col("n") - 1) / 2)
    def tiePairs(v: String, out: String) = cells
      .groupBy(col("g"), col(v)).agg(sum(col("c")).as("cv"))
      .groupBy(col("g"))
      .agg(sum(col("cv") * (col("cv") - 1) / 2).cast("decimal(38,0)")
        .as(out))
    val a = cells.select(col("g"), col("x").as("xa"), col("y").as("ya"),
      col("c").as("ca"))
    val b = cells.select(col("g"), col("x").as("xb"), col("y").as("yb"),
      col("c").as("cb"))
    val cd = a.join(b, Seq("g")).filter(col("xa") < col("xb"))
      .groupBy(col("g"))
      .agg(sum(when(col("ya") < col("yb"), col("ca") * col("cb"))
        .otherwise(0L)).cast("decimal(38,0)").as("nc"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb"))
          .otherwise(0L)).cast("decimal(38,0)").as("nd"))
    tot.join(tiePairs("x", "n1"), Seq("g"))
      .join(tiePairs("y", "n2"), Seq("g"))
      .join(cd, Seq("g"), "left")
      .select(col("g").as(groupCol), col("n").cast("long").as("n_rows"),
        coalesce(col("nc"), lit(0)).cast("long").as("concordant"),
        coalesce(col("nd"), lit(0)).cast("long").as("discordant"),
        round(when((col("n0") - col("n1")) === 0 ||
          (col("n0") - col("n2")) === 0, null)
          .otherwise((coalesce(col("nc"), lit(0)) -
            coalesce(col("nd"), lit(0))).cast("double") /
            sqrt((col("n0") - col("n1")).cast("double") *
              (col("n0") - col("n2")).cast("double"))), 4).as("tau_b"))
  }

  /** Pettitt changepoint test on per-key daily counts: the nonparametric
    * complement to [[cusumChangepoint]] — U_t = Σ_{i≤t<j} sgn(x_j − x_i)
    * over observation pairs, K = max|U_t|, with the classic significance
    * approximation p ≈ 2·exp(−6K²/(n³+n²)). Rank-based, so a monotone
    * transform of the metric changes nothing, and a single outlier moves
    * U by at most n — exactly the robustness CUSUM lacks.
    *
    * The O(d²) pair set is DELTA-ENCODED instead of cut-replicated: pair
    * (i, j) contributes sgn to every cut in [i, j), i.e. +sgn at day i
    * and −sgn at day j, so U_t is one running sum over the day spine —
    * O(d²) pairs, O(d) window rows, never O(d³) pair×cut work. All
    * integer until the final exp; ties in |U| break to the EARLIEST day
    * (the standard convention). State is per-key days², bounded by the
    * calendar, not event volume. */
  def pettittChangepoint(df: DataFrame, keyCol: String,
                         tsCol: String): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(eager = false)
    val a = daily.select(col("k"), col("day").as("di"), col("n").as("ni"))
    val b = daily.select(col("k"), col("day").as("dj"), col("n").as("nj"))
    val sgn = signum(col("nj") - col("ni")).cast("long")
    val deltas = a.join(b, Seq("k")).filter(col("di") < col("dj"))
      .select(col("k"), explode(array(
        struct(col("di").as("day"), sgn.as("d")),
        struct(col("dj").as("day"), (-sgn).as("d")))).as("e"))
      .select(col("k"), col("e.day").as("day"), col("e.d").as("d"))
      .groupBy(col("k"), col("day")).agg(sum(col("d")).as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val u = deltas.withColumn("u", sum(col("d")).over(w))
    val nd = daily.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        max(col("day")).as("last_day"))
    val cuts = u.join(nd, Seq("k")).filter(col("day") < col("last_day"))
      .select(col("k"), col("n_days"), col("day"), abs(col("u")).as("au"))
      .localCheckpoint(eager = false) // read twice: max + argmax
    val kmax = cuts.groupBy(col("k"), col("n_days"))
      .agg(max(col("au")).as("k_stat"))
    val k = cuts.join(kmax.select(col("k"), col("k_stat")), Seq("k"))
      .filter(col("au") === col("k_stat"))
      .groupBy(col("k")).agg(min(col("day")).as("change_day"))
      .join(kmax, Seq("k"))
    val n3 = col("n_days").cast("double")
    k.select(col("k").as(keyCol), col("n_days"),
      col("k_stat").cast("long").as("k_stat"), col("change_day"),
      round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) *
        col("k_stat").cast("double") * col("k_stat").cast("double") /
        (n3 * n3 * n3 + n3 * n3))), 6).as("p_value"))
  }
}
