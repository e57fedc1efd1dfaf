package graft.operators

import org.apache.spark.sql.{DataFrame}
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
    val totals = counts.agg(count(lit(1)).cast("double").as("n_keys"),
      sum(col("cnt")).cast("double").as("n_rows"))
    counts
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("cnt")).as("nc"), col(keyCol).cast("string").as("k")),
        topK).as("arr"))
      .select(posexplode(col("arr")))
      .crossJoin(broadcast(totals))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.k").as("key"),
        negate(col("col.nc")).cast("long").as("cnt"),
        round(negate(col("col.nc")) / col("n_rows"), 4).as("share"),
        round(negate(col("col.nc")) * col("n_keys") / col("n_rows"), 2).as("x_avg"))
  }

  /** Equal-frequency bucketing (curriculum/quality binning) WITHOUT a global
    * row_number: a global rank window collapses the corpus onto one
    * partition, which dies at scale. Instead the exact histogram algorithm:
    * count per distinct value (a shuffle bounded by the value space — rounded
    * scores, not rows), cumulative counts over the SORTED DISTINCT VALUES
    * (a window over that small frame only), then each value's bucket =
    * floor(rank_of_first_occurrence * nBuckets / n) in pure integer
    * arithmetic, joined back broadcast. Ties share a value, so they land in
    * the same bucket by construction — deterministic across engines with no
    * tie-break column needed. Bucket ids are 0..nBuckets-1; a value run
    * longer than a bucket simply occupies it. */
  def histogramBuckets(df: DataFrame, valueCol: String,
                       nBuckets: Int = 10): DataFrame = {
    // null values are excluded from the output AND the offsets: a null
    // count group would inflate n and shift every non-null bucket while
    // the final equi-join dropped the null rows anyway
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(valueCol),
        least(lit(nBuckets - 1),
          expr(s"((cum - cnt) * $nBuckets) div n")).cast("long").as("bucket"))
    df.join(broadcast(cum), Seq(valueCol))
  }
}
