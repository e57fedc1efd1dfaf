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
    val ranked = df.select(col(keyCol), col(valueCol).as("v"))
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
}
