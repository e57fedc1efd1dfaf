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
}
