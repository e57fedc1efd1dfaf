package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization for event streams: resampling onto a fixed
  * grid with forward fill — the step that turns irregular event data into
  * the fixed-interval sequences a training pipeline consumes. */
object TimeSeries {

  /** Resample each key's events onto a `step` grid from its first to its
    * last bucket, carrying the last observed value forward across empty
    * buckets.
    *
    * Three bounded stages, all partitioned on the key:
    *   1. per-(key, bucket) last observation — the q06 windowed-dedup shape
    *      (row_number DESC over (ts, tieCol)), so "last" is deterministic
    *      under equal timestamps;
    *   2. the spine — one `sequence()` per key exploded to its grid rows
    *      (array length = key's own span / step, never the global span);
    *   3. forward fill — `last(value, ignoreNulls)` over the bucket order,
    *      a single running window per key.
    * Nothing is ever quadratic and every shuffle is on the key; a key's
    * cost is proportional to ITS span, so sparse keys stay cheap. The
    * leading bucket of each key always holds an observation (the spine
    * starts at the first event), so forward fill never emits null. */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, tieCol: String,
                   step: String = "1 hour"): DataFrame = {
    // the grid stride must EQUAL the bucket truncation granularity, or
    // observations land in buckets the spine never visits (silently
    // forward-filling stale values over real data) — so only "1 <unit>"
    // steps with a valid date_trunc unit are accepted
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
    // spine bounds come from lastObs (one row per occupied (key, bucket) —
    // same min/max as the raw events) so the event table is scanned ONCE;
    // the checkpoint keeps the dedup from re-running for the spine and the
    // join sides
    val spine = lastObs.groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"),
        explode(sequence(col("b0"), col("b1"), expr(s"INTERVAL $step"))).as("bucket"))
    val fillW = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(lastObs, Seq("k", "bucket"), "left")
      .withColumn("filled_v", last(col("v"), ignoreNulls = true).over(fillW))
      .withColumn("is_observed", col("v").isNotNull)
      .select(col("k").as(keyCol), col("bucket"), col("filled_v"), col("is_observed"))
  }
}
